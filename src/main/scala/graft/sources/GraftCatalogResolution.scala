package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Session-catalog name resolution for the graft surface: maps a table
  * NAME (1-, 2-, or spark_catalog-qualified 3-part identifier) onto its
  * LOCATION path when the catalog entry's provider is `graft-delta`.
  * This is what lets a SQL-warehouse user run the maintenance verbs and
  * time travel against the names they created (`graft_optimize('t')`,
  * `SELECT … FROM t VERSION AS OF 3`) instead of remembering paths —
  * the reference's view/SQL surface composes by name the same way
  * (duckdb.py:340-371,584-623).
  */
object GraftCatalogResolution {

  /** The graft-delta catalog table's location for `parts`, or None when
    * the identifier doesn't resolve (unknown name, other provider,
    * views, unsupported arity) — callers fall back to treating the
    * original string as a path.
    */
  def locationFor(spark: SparkSession, parts: Seq[String]): Option[String] = {
    val ti = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db), Some(cat))
      case _ => return None
    }
    try {
      val catalog = spark.sessionState.catalog
      if (!catalog.tableExists(ti)) None
      else {
        val meta = catalog.getTableMetadata(ti)
        if (meta.provider.exists(_.equalsIgnoreCase("graft-delta")))
          Some(meta.location.toString)
        else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Resolve a verb's table reference: a catalog NAME whose provider is
    * graft-delta resolves to its location; anything else — including
    * every string containing a path separator, which can never be a
    * catalog name — is returned verbatim as a path.
    *
    * Precedence (round-12 advice): an EXISTING Delta table at the
    * string taken as a filesystem path wins over a same-named catalog
    * entry — a caller running `graft_optimize('store')` from the
    * table's parent directory meant the local directory, and silently
    * redirecting it to an unrelated catalog table's location would
    * maintain the wrong table. A name that is not also a local Delta
    * directory resolves through the catalog as before.
    */
  def resolveTableRef(spark: SparkSession, ref: String): String = {
    if (ref.contains("/") || ref.contains("\\")) return ref
    val isLocalDelta =
      try graft.DeltaLake.tableExists(spark, ref)
      catch { case scala.util.control.NonFatal(_) => false }
    if (isLocalDelta) return ref
    val parts =
      try spark.sessionState.sqlParser.parseMultipartIdentifier(ref)
      catch { case scala.util.control.NonFatal(_) => return ref }
    locationFor(spark, parts).getOrElse(ref)
  }
}
