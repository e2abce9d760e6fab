package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Registry.table

/** Composite curation pipeline — the operators composed the way a real
  * training-data run chains them, under ONE end-to-end oracle. Each
  * stage is hash-verified on its own elsewhere (t2, d1, t11); this
  * entry proves the COMPOSITION: filters stay pushed down, the dedup
  * shuffle and the mixture window don't interfere, and the final
  * result is engine-exact.
  *
  * Scale shape per stage: the quality gate is a narrow per-row pass
  * (evaluated at the scan, nothing survives that shouldn't ship);
  * exact dedup is one hash-groupBy with map-side combine; mixture
  * sampling is one shuffle on source. Three shuffles total for the
  * whole curation — at 100 TB the quality gate typically drops the
  * bulk of the corpus before anything moves.
  */
object PipelineOps {

  /** p5's scale path: per-stratum top-`cap` by (md5 key, doc_id) via
    * THRESHOLD REFINEMENT — identical output to the single-window
    * definition, but no stratum ever sorts through one task.
    *
    * Phase 1 counts each stratum (combiner-bound). Phase 2 derives a
    * per-stratum key threshold from hash uniformity — md5 keys are
    * uniform in the 60-bit prefix domain, so the cap-th smallest of n
    * sits near `cap/n · 2^60`; a `margin`× inflation makes undershoot
    * astronomically unlikely (Chernoff: P[Binom(n, 4c/n) < c] ≈ e^-c).
    * Phase 3 keeps only rows below their stratum's threshold
    * (broadcast join — the per-stratum relation is metadata-sized) and
    * VERIFIES each stratum kept ≥ min(cap, n) survivors; any stratum
    * the bound failed for (approx-theory violated, e.g. adversarial
    * keys) is re-admitted WHOLE, restoring exactness unconditionally.
    * Phase 4 runs the exact rank window on survivors only — each
    * partition now holds ≤ ~margin·cap rows, so the window is uniform
    * regardless of stratum skew.
    *
    * Cost shape at 100 TB: three passes over a 2-column projection
    * (count, survivor verify, window input). The per-stratum relation
    * is collected ONCE (stratum cardinality is assumed driver-sized,
    * like IVF's centroid list — languages, sources, domains) and
    * re-broadcast as a literal frame, so the count aggregation never
    * recomputes; the violation re-admit list is empty in every
    * non-adversarial run. NULL is a stratum like any other (the
    * definition's window and the DuckDB oracle both keep a NULL
    * partition), so every join here is null-safe.
    */
  private[ops] def stratifiedSampleRefined(
      docs: org.apache.spark.sql.DataFrame, cap: Int,
      margin: Int = 4): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    val key = md5(to_binary(
      concat(col("doc_id").cast("string"), lit(":p5")), lit("utf-8")))
    // 15 hex chars = 60 bits: a numeric, order-preserving prefix of the
    // full key (prefix(a) < prefix(b) ⇒ a < b lexicographically), so a
    // prefix threshold admitting ≥ cap rows provably contains the
    // true top-cap
    val keyed = docs.select(col("doc_id"), col("lang"))
      .withColumn("k", key)
      .withColumn("kp", conv(substring(col("k"), 1, 15), 16, 10)
        .cast("long"))
    // pass 1: per-stratum counts → thresholds, collected once (NULL
    // stratum included — groupBy keeps null keys) and rebuilt as a
    // literal frame so later references don't re-run the aggregation
    val thrRows = keyed.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("t",
        when(col("n") <= lit(margin.toLong * cap), lit(Long.MaxValue))
          .otherwise(((lit(margin.toDouble * cap) / col("n")) *
            lit(math.pow(2, 60))).cast("long") + 1L))
      .collect().toSeq
    val thr = spark.createDataFrame(
      spark.sparkContext.parallelize(thrRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // null-safe join: an equi-join on "lang" would silently drop the
    // NULL stratum
    val joined = keyed.join(broadcast(thr.withColumnRenamed("lang", "__l")),
      col("lang") <=> col("__l")).drop("__l")
    val survivors = joined.where(col("kp") <= col("t"))
    // pass 2 — verify from the COUNTS side: a stratum with zero
    // survivors is absent from the survivor groupBy and must still be
    // flagged
    val bad: Seq[Option[String]] = thr.select("lang", "n")
      .join(survivors.groupBy("lang").agg(count(lit(1)).as("m"))
        .withColumnRenamed("lang", "__l"),
        col("lang") <=> col("__l"), "left")
      .where(coalesce(col("m"), lit(0L)) < least(lit(cap.toLong), col("n")))
      .select("lang").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0))).toSeq
    val admitted =
      if (bad.isEmpty) survivors
      else {
        val readmit = bad.map {
          case None => col("lang").isNull
          case Some(v) => col("lang") === v
        }.reduce(_ || _)
        joined.where(col("kp") <= col("t") || readmit)
      }
    // pass 3: the exact rank window over ≤ ~margin·cap rows per stratum
    admitted
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("k"), col("doc_id"))))
      .where(col("rk") <= cap)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** The ONE shard-assignment definition p2 (manifest), p8 (the
    * materialized export) and the export writer share: content-hash
    * shard (md5 prefix mod `shards`) + hash-ordered sequence inside
    * each shard.
    *
    * The dense per-shard `seq` is NOT a rank window:
    * `row_number().over(partitionBy(shard))` funnels each shard's
    * whole corpus slice through ONE task — shards is a small constant,
    * so at 100 TB that task holds terabytes. Instead: one distributed
    * range-partitioned sort on (shard, h, doc_id), zipWithIndex over
    * its ordered output partitions (a sort's output partitions are
    * ordered ranges, so the zip index IS the global rank — the
    * two-level seed-ranking argument), and a broadcast per-shard
    * min-offset subtraction. Row-identical to the window definition;
    * work scales with input splits, not with the shard count.
    */
  private def shardAssignment(s: org.apache.spark.sql.SparkSession,
      dir: String, shards: Int = 8): org.apache.spark.sql.DataFrame = {
    val h = md5(to_binary(
      concat(col("doc_id").cast("string"), lit(":shard")), lit("utf-8")))
    val toks = TextOps.tokens(col("text"))
    val sorted = table(s, dir, "documents")
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        h.as("h"))
      .withColumn("shard",
        conv(substring(col("h"), 1, 8), 16, 10).cast("long") % shards)
      .orderBy("shard", "h", "doc_id")
    val schema = sorted.schema
      .add(org.apache.spark.sql.types.StructField("__gidx",
        org.apache.spark.sql.types.LongType, nullable = false))
    val withIdx = s.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      schema)
    val offsets = withIdx.groupBy("shard").agg(min(col("__gidx")).as("__off"))
    withIdx.join(broadcast(offsets), "shard")
      .withColumn("seq", col("__gidx") - col("__off") + 1L)
      .select("doc_id", "n_tokens", "h", "shard", "seq")
  }

  /** p6's running token sum, computed distributed. A segmented prefix
    * sum over rows ordered by (shard, doc_id): pass 1 range-sorts on
    * that key and collects per-(sort-partition, shard) token subtotals
    * — at most partitions·S rows, metadata-sized; the driver folds
    * them into per-(partition, shard) cumulative offsets (a range
    * sort's output partitions are ordered, so every row of the same
    * shard in an earlier partition precedes every row of it here);
    * pass 2 carries a per-shard running sum across each already-sorted
    * partition, seeded from the broadcast offset. Both passes reuse
    * the ONE sort shuffle. Returns (doc_id, shard, n_tokens, start)
    * where start = total tokens of same-shard docs with smaller
    * doc_id — exactly the `sum(...).over(partitionBy(shard)
    * .orderBy(doc_id).rowsBetween(unboundedPreceding, -1))` window,
    * without any task ever holding a whole shard.
    */
  private[ops] def packedPrefixSums(
      docs: org.apache.spark.sql.DataFrame,
      shards: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val s = docs.sparkSession
    val sorted = docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(shards)).as("shard"),
        // coalesce: a null text must count 0 tokens, not null — the
        // carry pass reads n_tokens with getLong, and a null here would
        // NPE the whole job (the replaced Window twin silently emitted
        // a null start instead; 0 is the defined contract now)
        coalesce(size(TextOps.tokens(col("text"))), lit(0))
          .cast("long").as("n_tokens"))
      .orderBy("shard", "doc_id")
    // .rdd materializes the sorted lineage once; both jobs below share
    // its range partitioner and shuffle files (same argument as
    // shardAssignment's zipWithIndex)
    val rdd = sorted.rdd
    val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
      val sums = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
      it.foreach { r =>
        val sh = r.getLong(1)
        sums.update(sh, sums.getOrElse(sh, 0L) + r.getLong(2))
      }
      sums.iterator.map { case (sh, t) => (pid, sh, t) }
    }.collect()
    val offsets: Map[(Int, Long), Long] = partials.groupBy(_._2).flatMap {
      case (sh, arr) =>
        var acc = 0L
        arr.sortBy(_._1).map { case (pid, _, t) =>
          val entry = (pid, sh) -> acc
          acc += t
          entry
        }
    }
    val bOff = s.sparkContext.broadcast(offsets)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("shard", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("start", LongType, nullable = false)))
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = scala.collection.mutable.HashMap.empty[Long, Long]
      it.map { r =>
        val sh = r.getLong(1)
        val nt = r.getLong(2)
        val st = bOff.value.getOrElse((pid, sh), 0L) + run.getOrElse(sh, 0L)
        run.update(sh, run.getOrElse(sh, 0L) + nt)
        Row(r.getLong(0), sh, nt, st)
      }
    }
    s.createDataFrame(rows, schema)
  }

  /** p2 MATERIALIZED (r9 verdict item 6): write the sharded corpus as
    * a graft Delta table partitioned by shard — through the
    * optimized-write path (one AQE rebalance on the partition column,
    * so each shard directory gets coherent files instead of one
    * sliver per input task) with `maxRecordsPerFile` bounding file
    * row counts — plus a per-shard MANIFEST table (doc counts, token
    * totals, order fingerprint) computed FROM the exported rows, so
    * the p8 oracle catches a lost or duplicated row, not just bad
    * math. Returns the export path; the manifest is at
    * `<path>_manifest`.
    */
  def exportShards(s: org.apache.spark.sql.SparkSession, dir: String,
      outPath: String, shards: Int = 8,
      maxRecordsPerFile: Long = 1L << 20): String = {
    val assigned = shardAssignment(s, dir, shards)
      .select("shard", "seq", "doc_id", "n_tokens")
    val key = "spark.sql.files.maxRecordsPerFile"
    val old = s.conf.getOption(key)
    s.conf.set(key, maxRecordsPerFile.toString)
    try graft.delta.DeltaWriter.write(assigned, outPath,
      partitionBy = Seq("shard"),
      properties = Map("delta.autoOptimize.optimizeWrite" -> "true"))
    finally old match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
    val manifest = graft.DeltaLake.scanDelta(s, outPath)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        sum(col("seq") * col("doc_id")).as("order_fingerprint"))
    graft.delta.DeltaWriter.write(manifest, outPath + "_manifest")
    outPath
  }

  /** The manifest's DuckDB twin — shared verbatim by p2 (computed
    * manifest) and p8 (stored manifest of the materialized export).
    */
  private val shardManifestSql: String =
    """WITH hashed AS (
      |  SELECT doc_id,
      |    len(regexp_split_to_array(lower(text), '\s+'))::BIGINT AS n_tokens,
      |    md5(doc_id::VARCHAR || ':shard') AS h
      |  FROM documents),
      |sharded AS (
      |  SELECT *, ('0x' || substring(h, 1, 8))::BIGINT % 8 AS shard
      |  FROM hashed),
      |seqd AS (
      |  SELECT shard, doc_id, n_tokens,
      |    row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)::BIGINT
      |      AS seq
      |  FROM sharded)
      |SELECT shard, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(sum(seq * doc_id) AS BIGINT) AS order_fingerprint
      |FROM seqd GROUP BY shard ORDER BY shard""".stripMargin

  def defs: Map[String, QueryDef] = Map(

    // quality gate → exact dedup (min doc_id per content hash) →
    // sqrt-quota mixture sample → stable output
    "p1_curation" -> QueryDef(
      (s, dir) => {
        // the SAME building blocks the standalone ops use — TextOps'
        // tokenizer and sqrt-mixture core — so "composition of the
        // verified operators" stays literally true
        val toks = TextOps.tokens(col("text"))
        val quality = table(s, dir, "documents")
          .where(size(array_distinct(toks)).cast("double") / size(toks) >= 0.5
            && size(toks).between(20, 2000))
        val deduped = quality
          .withColumn("content_h", md5(to_binary(col("text"), lit("utf-8"))))
          .withColumn("rk_dup",
            row_number().over(
              Window.partitionBy("content_h").orderBy("doc_id")))
          .where(col("rk_dup") === 1)
        TextOps.sqrtMixture(
          deduped.select(col("doc_id"), col("source"), col("lang")), ":cur",
          cache = Some((s"p1:$dir",
            OpCaches.tableVersion(s, dir, "documents"))))
          .select("doc_id", "source", "lang")
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT *, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents),
        |quality AS (
        |  SELECT * FROM toks
        |  WHERE len(list_distinct(tk))::DOUBLE / len(tk) >= 0.5
        |    AND len(tk) BETWEEN 20 AND 2000),
        |deduped AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY md5(text) ORDER BY doc_id) AS rk_dup
        |    FROM quality) WHERE rk_dup = 1),
        |hashed AS (
        |  SELECT doc_id, source, lang,
        |    md5(doc_id::VARCHAR || ':cur') AS h
        |  FROM deduped),
        |ranked AS (
        |  SELECT doc_id, source, lang,
        |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n_src
        |  FROM hashed)
        |SELECT doc_id, source, lang FROM ranked
        |WHERE rk <= ceil(sqrt(n_src)) ORDER BY doc_id""".stripMargin)),

    // Deterministic training-export sharding: the step after curation —
    // every doc lands in a content-hash shard (md5 prefix mod 8, so
    // shard membership is stable under corpus growth and reproducible
    // by any engine) and gets a hash-ordered sequence INSIDE its shard
    // (the global training order, decorrelated from ingest order). The
    // oracle pins all of it: per-shard doc counts, token totals, and an
    // order fingerprint (sum of seq*doc_id) that any cross-engine
    // disagreement in shard assignment OR within-shard order breaks.
    // Scale shape: one narrow projection, one shuffle on shard for the
    // sequence window, combiner-bound aggregation — at 100 TB the real
    // export writes each shard's files from exactly this partitioning.
    "p2_shard_export" -> QueryDef(
      (s, dir) =>
        shardAssignment(s, dir)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            sum(col("seq") * col("doc_id")).as("order_fingerprint"))
          .orderBy("shard"),
      Some(shardManifestSql)),

    // p2 MATERIALIZED: the staged export writes shard-partitioned
    // Delta files (optimized write + maxRecordsPerFile) and a manifest
    // table computed FROM the exported rows; the query serves the
    // STORED manifest under p2's oracle — so a row lost or duplicated
    // anywhere between assignment and storage hash-mismatches, not
    // just a computation bug. File-layout facts (per-shard dirs,
    // per-file record bound, rebalanced file counts) are spec'd in
    // ShardExportSpec.
    "p8_shard_export_files" -> QueryDef(
      (s, dir) => {
        val path = DeltaQueries.stagedOnce(
          s, dir, "shard_export", "documents") { p =>
          exportShards(s, dir, p, maxRecordsPerFile = 256)
          ()
        }
        graft.DeltaLake.scanDelta(s, path + "_manifest").orderBy("shard")
      },
      Some(shardManifestSql)),

    // Leakage-controlled train/val split — the eval-hygiene step every
    // training pipeline needs: docs split by content-stable hash
    // (~12.5% val), then any val doc whose NEAR-DUP CLUSTER contains a
    // train doc is dropped (keeping it would leak train content into
    // eval through paraphrases exact-dedup can't see). Reuses the
    // corpus-version-cached d6 cluster map — the production shape: one
    // clustering serves dedup, corpus materialization AND the split.
    // Scale: one shuffle on cluster_rep for the anti-join; everything
    // upstream is the cached labeling.
    // Deterministic stratified sampling — the per-language (or
    // per-source) budget rebalance every multilingual data recipe
    // runs before training: each stratum keeps AT MOST `cap` docs,
    // selected by HASH-RANK (row_number over md5(doc_id), not rand())
    // so the sample is exact-size, reproducible across runs/engines,
    // and independent of input order — rand()-based sampling can never
    // sit under a cross-engine hash oracle, and per-stratum
    // percent-threshold hashing gives only EXPECTED size. r15: routed
    // through the capped-window helper (TextOps.bottomQByHash, fixed
    // quota 60) like t6/t11/p1, so the naive constant-cardinality rank
    // window is extinct in the registry — no stratum's whole corpus
    // ever sits in one rank task. p5_stratified_refined below is the
    // SAME semantics through an INDEPENDENT implementation
    // ([[stratifiedSampleRefined]], the original threshold-refinement
    // shape bottomQByHash generalized); both are pinned to the one
    // window-definition oracle SQL, so the pair is a standing
    // differential of two distinct scale paths.
    "p5_stratified_sample" -> QueryDef(
      (s, dir) => {
        val key = md5(to_binary(
          concat(col("doc_id").cast("string"), lit(":p5")), lit("utf-8")))
        TextOps.bottomQByHash(
          table(s, dir, "documents")
            .select(col("doc_id"), col("lang"), key.as("h")),
          "lang", _ => lit(60L),
          cache = Some((s"p5:$dir",
            OpCaches.tableVersion(s, dir, "documents"))))
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(doc_id::VARCHAR || ':p5'), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 60 ORDER BY doc_id""".stripMargin)),

    // The SAME stratified sample computed by the 100 TB path: per-
    // stratum THRESHOLD REFINEMENT instead of one row_number window
    // whose biggest stratum serializes through a single task. Same
    // oracle SQL as p5 — the hash-rank semantics pin BOTH paths; any
    // divergence between the scale path and the definition fails the
    // correctness gate, not a benchmark.
    "p5_stratified_refined" -> QueryDef(
      (s, dir) => stratifiedSampleRefined(
        table(s, dir, "documents"), cap = 60),
      Some("""SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(doc_id::VARCHAR || ':p5'), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 60 ORDER BY doc_id""".stripMargin)),

    // GPT-style concat-and-chunk sequence packing: the corpus is
    // sharded (doc_id mod S), each shard's documents are concatenated
    // in doc_id order and cut at fixed token-budget boundaries
    // (B=256); each document maps to the sequence span
    // [floor(start/B), floor((start+tokens-1)/B)] its tokens land in —
    // the exact bookkeeping a pretraining tokenizer-packer emits
    // (which sequences a doc occupies, how many it straddles).
    //
    // The running token sum is NOT a `Window.partitionBy(shard)` —
    // shard cardinality is a small constant (S=4 here), so that window
    // funnels corpus/S rows through ONE task at 100 TB. Instead the
    // prefix sum is DISTRIBUTED, the same two-pass shape
    // [[shardAssignment]] uses for its dense rank: one range-
    // partitioned sort on (shard, doc_id), per-partition (partition,
    // shard) token subtotals collected once (≤ partitions·S rows —
    // driver-sized metadata), broadcast cumulative offsets, then a
    // per-partition carry over the already-sorted scan. Row-identical
    // to the window definition (the oracle SQL below IS that window);
    // work scales with input splits, never with S. ONE shuffle (the
    // range sort), no window, no stateful recursion.
    "p6_concat_chunks" -> QueryDef(
      (s, dir) => {
        val B = 256L
        packedPrefixSums(table(s, dir, "documents"), shards = 4L)
          .select(col("doc_id"), col("shard"),
            floor(col("start") / B).cast("long").as("seq_first"),
            floor((col("start") + col("n_tokens") - 1) / B).cast("long")
              .as("seq_last"))
          .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1L)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, shard, seq_first, seq_last,
        |  seq_last - seq_first + 1 AS n_seqs
        |FROM (
        |  SELECT doc_id, shard,
        |    start // 256 AS seq_first,
        |    (start + n_tokens - 1) // 256 AS seq_last
        |  FROM (
        |    SELECT doc_id, doc_id % 4 AS shard,
        |      CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |        AS n_tokens,
        |      COALESCE(CAST(sum(len(regexp_split_to_array(lower(text), '\s+')))
        |        OVER (PARTITION BY doc_id % 4 ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |        AS BIGINT), 0) AS start
        |    FROM documents))
        |ORDER BY doc_id""".stripMargin)),

    "p3_leakage_split" -> QueryDef(
      (s, dir) => {
        val labels = DedupOps.dedupClusters(s, dir, fastHash = false)
        val tagged = labels.withColumn("split",
          when(substring(md5(to_binary(
            concat(col("doc_id").cast("string"), lit(":split")),
            lit("utf-8"))), 1, 1).isin("0", "1"), "val")
            .otherwise("train"))
        val trainClusters = tagged.where(col("split") === "train")
          .select("cluster_rep").distinct()
        val valClean = tagged.where(col("split") === "val")
          .join(trainClusters, Seq("cluster_rep"), "left_anti")
        tagged.where(col("split") === "train").unionByName(valClean)
          .select(col("doc_id"), col("split"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${DedupOps.pairsSql},
        |est AS (
        |  SELECT doc_a, doc_b FROM pairs
        |  WHERE CAST(list_sum([CASE WHEN mh_a[i+1] = mh_b[i+1] THEN 1 ELSE 0 END
        |    for i in range(${DedupOps.NumHashes})]) AS DOUBLE) / ${DedupOps.NumHashes} >= 0.2),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM est
        |  UNION ALL SELECT doc_b, doc_a FROM est),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.node),
        |labels AS (
        |  SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_rep
        |  FROM reach GROUP BY node),
        |tagged AS (
        |  SELECT doc_id, cluster_rep,
        |    CASE WHEN substring(md5(doc_id::VARCHAR || ':split'), 1, 1)
        |      IN ('0', '1') THEN 'val' ELSE 'train' END AS split
        |  FROM labels),
        |trainc AS (
        |  SELECT DISTINCT cluster_rep FROM tagged WHERE split = 'train')
        |SELECT doc_id, split FROM tagged
        |WHERE split = 'train'
        |   OR cluster_rep NOT IN (SELECT cluster_rep FROM trainc)
        |ORDER BY doc_id""".stripMargin)),

    // Temperature-scaled source mixture weights — the data-recipe step
    // multilingual/multi-source training runs use (XLM-R/mT5-style
    // α-sampling): per-source token mass, then sampling weight
    // w_s ∝ n_tokens^α with α=0.5, which upsamples small sources
    // relative to proportional sampling without letting them dominate.
    // Scale shape: ONE combiner-bound per-source aggregation over a
    // single corpus scan (token counting is map-side), then the
    // normalization as an unbounded window over the already-tiny
    // per-source relation — a broadcast 1-row cross join would force
    // the aggregate subplan (and the 100 TB scan under it) to run
    // twice, since ReuseExchange can't unify the two aggregates.
    // Domain-level curation (C4/RefinedWeb-style): score each SOURCE by
    // the mean lexical-diversity of its documents and keep only docs
    // from sources at or above the corpus-wide mean — the filter every
    // web-scale recipe applies one level ABOVE the per-doc gate (a spam
    // domain's individually-plausible pages all go together). The
    // threshold compare is exact integer math (cross-multiplied sums of
    // per-doc diversity in milli-units, carried in DECIMAL(38,0) /
    // HUGEINT — the products reach ~1000·n_docs², past BIGINT at a few
    // billion docs), so the keep/drop decision can never diverge across
    // engines on a float tie OR overflow at corpus scale. Scale shape:
    // one combiner-bound per-source aggregation over a (source, dr)
    // projection — the ONLY pass that pays the tokenization — then a
    // second (doc_id, source)-only projection filtered by a BROADCAST
    // semi-join against the tiny kept-source list; neither pass
    // shuffles corpus volume (the agg exchange carries ~n_sources rows
    // per partition). The final orderBy is driver-compare
    // presentation, not part of the operator.
    "p7_domain_filter" -> QueryDef(
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val all = Window.partitionBy()
        val dec = "decimal(38,0)"
        val scored = table(s, dir, "documents")
          .select(col("source"),
            size(array_distinct(toks)).cast("long").as("d"),
            size(toks).cast("long").as("t"))
          .select(col("source"), expr("(1000 * d) div t").as("dr"))
        val good = scored.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("dr").as("s_dr"))
          .select(col("source"), col("n_docs"), col("s_dr"),
            sum(col("n_docs")).over(all).as("nn"),
            sum(col("s_dr")).over(all).as("ss"))
          .where(col("s_dr").cast(dec) * col("nn").cast(dec) >=
            col("ss").cast(dec) * col("n_docs").cast(dec))
          .select("source")
        table(s, dir, "documents").select(col("doc_id"), col("source"))
          .join(broadcast(good), Seq("source"), "left_semi")
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
        |  SELECT source,
        |    (1000 * len(list_distinct(regexp_split_to_array(lower(text), '\s+'))))
        |      // len(regexp_split_to_array(lower(text), '\s+')) AS dr
        |  FROM documents),
        |per_source AS (
        |  SELECT source, count(*) AS n_docs, CAST(sum(dr) AS BIGINT) AS s_dr
        |  FROM base GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
        |    CAST(sum(s_dr) AS BIGINT) AS ss
        |  FROM per_source),
        |good AS (
        |  SELECT source FROM per_source, tot
        |  WHERE s_dr::HUGEINT * nn::HUGEINT >= ss::HUGEINT * n_docs::HUGEINT)
        |SELECT doc_id, source FROM documents
        |WHERE source IN (SELECT source FROM good)
        |ORDER BY doc_id""".stripMargin)),

    "p4_mixture_weights" -> QueryDef(
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val all = Window.partitionBy()
        table(s, dir, "documents")
          .select(col("source"), size(toks).cast("long").as("n_tok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            round(sqrt(col("n_tokens").cast("double")) /
              sum(sqrt(col("n_tokens").cast("double"))).over(all), 6)
              .as("weight"))
          .orderBy("source")
      },
      Some("""WITH per_source AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(regexp_split_to_array(lower(text), '\s+')))
        |      AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |  round(sqrt(n_tokens) /
        |    (SELECT sum(sqrt(n_tokens)) FROM per_source), 6) AS weight
        |FROM per_source ORDER BY source""".stripMargin)))
}
