package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual tool (not a test): interleaved A/B cold probe for the t16
  * restructure (r17 wave 1) — alternates the r16 construction (cached
  * token stream + five corpus-scale aggregations) with the r17 one
  * (cached tf + derived dl/df/stats) in ONE JVM, deepClean before
  * every shot, so box-state drift between runs cannot masquerade as a
  * code effect (the r16 verdict's item-6 method).
  *
  *   sbt "Test/runMain graft.T16ABProbe <sfDir> <rounds>"
  */
object T16ABProbe {

  /** The r16 t16 body, verbatim (minus the shared scoring tail, which
    * both variants call identically through the registry's helpers).
    */
  private def oldT16(s: SparkSession, dir: String) = {
    import graft.ops.{OpCaches, Registry}
    val toks = OpCaches.cached(s, s"probe:toks:$dir",
        OpCaches.tableVersion(s, dir, "documents")) {
      Registry.table(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
    }
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = broadcast(dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl")))
    val qdocs = Registry.table(s, dir, "documents")
      .select(col("doc_id").as("query_id"),
        md5(to_binary(concat(col("doc_id").cast("string"),
          lit(":bm25q")), lit("utf-8"))).as("__h"))
      .orderBy("__h", "query_id").limit(3).drop("__h")
    val qterms = toks
      .join(broadcast(qdocs), col("doc_id") === col("query_id"))
      .select("query_id", "tok").distinct()
    val dfq = tf.join(broadcast(qterms.select("tok").distinct()), "tok")
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val idf = broadcast(dfq.crossJoin(stats)
      .select(col("tok"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf")))
    val cand = tf
      .join(broadcast(qterms), "tok")
      .where(col("doc_id") =!= col("query_id"))
      .join(idf, "tok")
      .join(dl, "doc_id")
      .crossJoin(stats)
    val scored = cand
      .select(col("query_id"), col("doc_id"),
        (col("idf") * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / col("avgdl")))).as("summand"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("summand"), 6).as("score_q"))
    import org.apache.spark.sql.expressions.Window
    val w1 = Window
      .partitionBy(col("query_id"),
        pmod(xxhash64(col("doc_id")), lit(32L)))
      .orderBy(col("score_q").desc, col("doc_id"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("score_q").desc, col("doc_id"))
    scored
      .withColumn("__r", row_number().over(w1)).where(col("__r") <= 10)
      .withColumn("rank", row_number().over(w2)).where(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_q"))
      .orderBy("query_id", "rank")
  }

  /** r17 variant V3: tf cached, dl derived per consumer (no dl IMR). */
  private def v3T16(s: SparkSession, dir: String) = {
    import graft.ops.{OpCaches, Registry}
    val tf = OpCaches.cached(s, s"probe:tf3:$dir",
        OpCaches.tableVersion(s, dir, "documents")) {
      Registry.table(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    }
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    tailFrom(s, dir, tf, dl)
  }

  /** r17 variant V4: toks cached (r16 shape), but dl/stats derived
    * from tf instead of re-aggregating the token stream.
    */
  private def v4T16(s: SparkSession, dir: String) = {
    import graft.ops.{OpCaches, Registry}
    val toks = OpCaches.cached(s, s"probe:toks4:$dir",
        OpCaches.tableVersion(s, dir, "documents")) {
      Registry.table(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
    }
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    tailFrom(s, dir, tf, dl)
  }

  private def tailFrom(s: SparkSession, dir: String,
      tf: org.apache.spark.sql.DataFrame,
      dl: org.apache.spark.sql.DataFrame) = {
    import graft.ops.Registry
    val stats = broadcast(dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl")))
    val qdocs = Registry.table(s, dir, "documents")
      .select(col("doc_id").as("query_id"),
        md5(to_binary(concat(col("doc_id").cast("string"),
          lit(":bm25q")), lit("utf-8"))).as("__h"))
      .orderBy("__h", "query_id").limit(3).drop("__h")
    val qterms = tf
      .join(broadcast(qdocs), col("doc_id") === col("query_id"))
      .select("query_id", "tok")
    val dfq = tf.join(broadcast(qterms.select("tok").distinct()), "tok")
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val idf = broadcast(dfq.crossJoin(stats)
      .select(col("tok"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf")))
    val cand = tf
      .join(broadcast(qterms), "tok")
      .where(col("doc_id") =!= col("query_id"))
      .join(idf, "tok")
      .join(dl, "doc_id")
      .crossJoin(stats)
    val scored = cand
      .select(col("query_id"), col("doc_id"),
        (col("idf") * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / col("avgdl")))).as("summand"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("summand"), 6).as("score_q"))
    import org.apache.spark.sql.expressions.Window
    val w1 = Window
      .partitionBy(col("query_id"),
        pmod(xxhash64(col("doc_id")), lit(32L)))
      .orderBy(col("score_q").desc, col("doc_id"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("score_q").desc, col("doc_id"))
    scored
      .withColumn("__r", row_number().over(w1)).where(col("__r") <= 10)
      .withColumn("rank", row_number().over(w2)).where(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_q"))
      .orderBy("query_id", "rank")
  }

  /** r17 variant V5: the r16 shape (toks cached, tf per consumer) but
    * with dl as a TINY cached doc-sized relation, so Catalyst's column
    * pruning can no longer split stats into three separate doc-scale
    * re-aggregations of the token stream (n_docs, avgdl, score join).
    */
  private def v5T16(s: SparkSession, dir: String) = {
    import graft.ops.{OpCaches, Registry}
    val ver = OpCaches.tableVersion(s, dir, "documents")
    val toks = OpCaches.cached(s, s"probe:toks5:$dir", ver) {
      Registry.table(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
    }
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dl = OpCaches.cached(s, s"probe:dl5:$dir", ver) {
      toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    }
    val stats = broadcast(dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl")))
    val qdocs = Registry.table(s, dir, "documents")
      .select(col("doc_id").as("query_id"),
        md5(to_binary(concat(col("doc_id").cast("string"),
          lit(":bm25q")), lit("utf-8"))).as("__h"))
      .orderBy("__h", "query_id").limit(3).drop("__h")
    val qterms = toks
      .join(broadcast(qdocs), col("doc_id") === col("query_id"))
      .select("query_id", "tok").distinct()
    val dfq = tf.join(broadcast(qterms.select("tok").distinct()), "tok")
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val idf = broadcast(dfq.crossJoin(stats)
      .select(col("tok"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf")))
    val cand = tf
      .join(broadcast(qterms), "tok")
      .where(col("doc_id") =!= col("query_id"))
      .join(idf, "tok")
      .join(dl, "doc_id")
      .crossJoin(stats)
    val scored = cand
      .select(col("query_id"), col("doc_id"),
        (col("idf") * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / col("avgdl")))).as("summand"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("summand"), 6).as("score_q"))
    import org.apache.spark.sql.expressions.Window
    val w1 = Window
      .partitionBy(col("query_id"),
        pmod(xxhash64(col("doc_id")), lit(32L)))
      .orderBy(col("score_q").desc, col("doc_id"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("score_q").desc, col("doc_id"))
    scored
      .withColumn("__r", row_number().over(w1)).where(col("__r") <= 10)
      .withColumn("rank", row_number().over(w2)).where(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_q"))
      .orderBy("query_id", "rank")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val newFn = graft.ops.Registry.all("t16_bm25_topk").fn
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "old" -> (() => oldT16(spark, sfDir)),
      "new" -> (() => newFn(spark, sfDir)),
      "v3" -> (() => v3T16(spark, sfDir)),
      "v4" -> (() => v4T16(spark, sfDir)),
      "v5" -> (() => v5T16(spark, sfDir)))
    // untimed prime of ALL variants (JIT warmup, symmetric)
    variants.foreach(v => v._2().count())
    val times = variants.map(v => v._1 ->
      scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    (1 to rounds).foreach { i =>
      variants.foreach { case (name, fn) =>
        graft.ops.OpCaches.deepClean(spark)
        times(name) += time(fn().count())
      }
      println("round " + i + ": " + variants.map { case (n, _) =>
        f"$n=${times(n).last}%.3f" }.mkString(" "))
    }
    println("T16AB " + variants.map { case (n, _) =>
      val xs = times(n)
      f"$n min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
    }.mkString(" | "))
    spark.stop()
  }
}
