package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Session-scoped registry for the small cached relations the ops derive
  * (token/shingle tables, minhash signatures, LSH-banded corpora, IVF
  * inverted lists).
  *
  * Why a registry instead of bare `.cache()` calls: Spark's CacheManager
  * dedups by canonicalized plan, so repeated invocations never duplicate
  * storage — but nothing ever RELEASES those entries either, and a
  * long-lived session accumulates one cached relation per distinct
  * (table dir × variant) forever. Tracking them here keeps repeat
  * invocations at zero net storage growth (same key → same cached
  * DataFrame instance) and gives the session an explicit release hook:
  * [[clear]] unpersists everything tracked.
  */
private[graft] object OpCaches {

  private val entries = TrieMap.empty[String, DataFrame]

  /** Build-and-cache once per key; later calls return the SAME cached
    * DataFrame. `make` must be deterministic for the key.
    */
  def cached(key: String)(make: => DataFrame): DataFrame =
    entries.getOrElseUpdate(key, make.cache())

  def size: Int = entries.size

  private[graft] def tracked: Iterable[DataFrame] = entries.values

  /** Unpersist and forget every tracked relation. Safe to call between
    * jobs; the next invocation re-derives and re-caches.
    */
  def clear(): Unit = {
    entries.values.foreach(_.unpersist())
    entries.clear()
  }
}
