package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
  }
}
