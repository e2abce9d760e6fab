package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.delta.ScanSettings
import graft.functions.{LshSignature, NearestCentroid, SimHash64, VectorCosine}

/** Spark-native integration point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) injects
  * the engine's codegen kernels into the session's FunctionRegistry at
  * build time, so plain `spark.sql` — including sessions created by
  * tooling that never touches graft's Scala API — can call
  * `simhash64`, `vector_cosine`, `nearest_centroid` and
  * `lsh_signature` directly. The per-call `register(spark)` helpers on
  * each kernel remain for ad-hoc use; this is the cluster-wide,
  * configuration-driven form.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name), builder)

  // builders come from each kernel's companion (the same ones
  // register() uses) so the two registration paths can never drift,
  // and arity errors carry the function name instead of a raw
  // IndexOutOfBoundsException
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("simhash64", classOf[SimHash64],
      SimHash64.builder))
    ext.injectFunction(fn("vector_cosine", classOf[VectorCosine],
      VectorCosine.builder))
    ext.injectFunction(fn("nearest_centroid", classOf[NearestCentroid],
      NearestCentroid.builder))
    ext.injectFunction(fn("lsh_signature", classOf[LshSignature],
      LshSignature.builder))
    // table-valued function: SELECT * FROM graft_delta('/path'[, version])
    // — the pure-SQL entry point to the optimized Delta scan (same
    // DeltaFileIndex single-scan plan as scanDelta: partition pruning,
    // stats skipping, DV subtraction, column-mapping rename all intact,
    // because the resolved plan is spliced in whole)
    ext.injectTableFunction((new FunctionIdentifier("graft_delta"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_delta"),
      GraftExtensions.deltaTableFunction))
    // SELECT * FROM graft_delta_cdf('/path', sinceVersion) — the change
    // feed as a table: window inserts with _change_type='insert',
    // DV retractions with 'delete' (scanDeltaChanges /
    // scanDeltaDeletedRows compose to the net state delta)
    ext.injectTableFunction((new FunctionIdentifier("graft_delta_cdf"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_delta_cdf"),
      GraftExtensions.cdfTableFunction))
    // SELECT * FROM graft_delta_history('/path') — DESCRIBE HISTORY
    ext.injectTableFunction((new FunctionIdentifier("graft_delta_history"),
      new ExpressionInfo(classOf[GraftExtensions].getName,
        "graft_delta_history"),
      GraftExtensions.historyTableFunction))
  }
}

object GraftExtensions {

  /** Builder for the `graft_delta` table function: literal path +
    * optional literal version → the analyzed scan plan.
    */
  private[graft] val deltaTableFunction
      : Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    args => {
      require(args.nonEmpty && args.size <= 2,
        "graft_delta(path[, version]) takes 1 or 2 arguments")
      require(args.forall(_.foldable),
        "graft_delta arguments must be literals")
      val path = args.head.eval() match {
        case null => throw new IllegalArgumentException(
          "graft_delta path must not be null")
        case s => s.toString
      }
      val version = args.lift(1).map(_.eval() match {
        case null => throw new IllegalArgumentException(
          "graft_delta version must not be null")
        case n: Number => n.longValue()
        case other => other.toString.toLong
      })
      val spark = org.apache.spark.sql.SparkSession.active
      DeltaLake.scanDelta(spark, path,
        ScanSettings(version = version)).queryExecution.analyzed
    }

  /** Shared literal-argument extraction for the TVF builders. */
  private def literalString(args: Seq[Expression], i: Int,
      fn: String, what: String): String = {
    require(args(i).foldable, s"$fn arguments must be literals")
    args(i).eval() match {
      case null =>
        throw new IllegalArgumentException(s"$fn $what must not be null")
      case s => s.toString
    }
  }

  private def literalLong(args: Seq[Expression], i: Int,
      fn: String, what: String): Long = {
    require(args(i).foldable, s"$fn arguments must be literals")
    args(i).eval() match {
      case null =>
        throw new IllegalArgumentException(s"$fn $what must not be null")
      case n: Number => n.longValue()
      case other => other.toString.toLong
    }
  }

  /** `graft_delta_cdf(path, sinceVersion)`: the batch change feed —
    * rows added strictly after `sinceVersion` (`_change_type='insert'`,
    * incl. DV-shrink restores) unioned with rows DV-deleted in the
    * window (`'delete'`). Applying inserts then deletes reproduces the
    * net state delta; the streaming twin is
    * [[graft.streaming.DeltaStream.runAvailableNowCdf]].
    */
  private[graft] val cdfTableFunction
      : Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    args => {
      require(args.size == 2,
        "graft_delta_cdf(path, sinceVersion) takes 2 arguments")
      val path = literalString(args, 0, "graft_delta_cdf", "path")
      val since = literalLong(args, 1, "graft_delta_cdf", "sinceVersion")
      val spark = org.apache.spark.sql.SparkSession.active
      DeltaLake.scanDeltaCdf(spark, path, since).queryExecution.analyzed
    }

  /** `graft_delta_history(path)`: DESCRIBE HISTORY as a table —
    * version/timestamp/operation/file-action counts/operation_metrics.
    */
  private[graft] val historyTableFunction
      : Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    args => {
      require(args.size == 1, "graft_delta_history(path) takes 1 argument")
      val path = literalString(args, 0, "graft_delta_history", "path")
      val spark = org.apache.spark.sql.SparkSession.active
      DeltaLake.history(spark, path).queryExecution.analyzed
    }
}
