package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("simhash64", classOf[SimHash64],
      exprs => SimHash64(exprs.head,
        if (exprs.size > 1) exprs(1) else Literal(false))))
    ext.injectFunction(fn("vector_cosine", classOf[VectorCosine],
      exprs => VectorCosine(exprs(0), exprs(1))))
    ext.injectFunction(fn("nearest_centroid", classOf[NearestCentroid],
      exprs => NearestCentroid(exprs(0), exprs(1))))
    ext.injectFunction(fn("lsh_signature", classOf[LshSignature],
      exprs => LshSignature(exprs(0), exprs(1), exprs(2), exprs(3))))
  }
}
