package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Build-and-cache once per (session, key); later calls from the same
    * session return the SAME cached DataFrame. `make` must be
    * deterministic for the key. An entry from a different (or stopped)
    * SparkSession is dropped and rebuilt — a cached plan bound to a dead
    * session would throw on first use.
    */
  def cached(spark: SparkSession, key: String)(make: => DataFrame): DataFrame =
    entries.get(key) match {
      case Some(df) if df.sparkSession eq spark => df
      case stale =>
        stale.foreach(df =>
          if (!df.sparkSession.sparkContext.isStopped) df.unpersist())
        val fresh = make.cache()
        entries.put(key, fresh)
        fresh
    }

  def size: Int = entries.size

  private[graft] def tracked: Iterable[DataFrame] = entries.values

  /** Unpersist and forget every tracked relation. Safe to call between
    * jobs; the next invocation re-derives and re-caches.
    */
  def clear(): Unit = {
    entries.values.foreach(df =>
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist())
    entries.clear()
  }
}
