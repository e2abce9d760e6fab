package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import Registry.table

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table. All are single-pass, shuffle-free per-row
  * transforms built from codegen'd built-ins (no UDFs) — at 100 TB they
  * scale linearly with input splits.
  */
object TextOps {

  private[ops] def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** Exact per-stratum bottom-q by (h, doc_id) with the rank window's
    * input CAPPED at ~margin·q rows per stratum — the p5 pattern
    * (`PipelineOps.stratifiedSampleRefined`) generalized to a
    * per-stratum, data-dependent quota. A raw
    * `row_number().over(partitionBy(stratum))` moves every stratum's
    * ENTIRE row set through one task (at 100 TB with a handful of
    * sources/langs, that single task holds a corpus share); here only
    * rows under a 60-bit hash-prefix threshold reach the window. The
    * numeric prefix is order-preserving (prefix(a) < prefix(b) ⇒
    * a < b lexicographically), so a threshold admitting ≥ q rows
    * provably contains the true bottom-q; strata the hash tail
    * under-fills are re-admitted WHOLE (fail-open, never wrong).
    * Stratum cardinality is assumed driver-sized — languages, sources —
    * the same assumption p5 documents. NULL is a stratum like any
    * other (null-safe joins throughout).
    *
    * `df` must carry `doc_id` and a lexicographic md5 hex column `h`;
    * `quotaOf` maps a stratum's FULL row count to its quota. Returns
    * df's columns + `n_src` (the full stratum count) + `rk`, filtered
    * to rk ≤ quota — row-identical to ranking the whole stratum.
    *
    * `cache` = (key, version): memoize the collected quota frame and
    * re-admit list per corpus version (both are deterministic for a
    * given input), so repeated calls — the warm path — pay only the
    * final window job, not the two driver collects. The constant those
    * collects add to a COLD call (~2 extra jobs, ≈1 s at sf0.1) is the
    * price of the cap; the cap is what survives 100 TB.
    */
  private[ops] def bottomQByHash(df: org.apache.spark.sql.DataFrame,
      stratum: String, quotaOf: Column => Column,
      margin: Int = 4,
      cache: Option[(String, String)] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val keyed = df.withColumn("__kp",
      conv(substring(col("h"), 1, 15), 16, 10).cast("long"))
    def thrOf(rows: Seq[org.apache.spark.sql.Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(df.schema(stratum).copy(name = "__s"),
        StructField("n_src", LongType, nullable = false),
        StructField("__q", LongType, nullable = false),
        StructField("__t", LongType, nullable = false))))
    def compute(): (Seq[org.apache.spark.sql.Row], Seq[Option[Any]]) = {
      // pass 1: per-stratum counts → quotas and prefix thresholds,
      // collected once and rebuilt as a literal frame so later
      // references don't re-run the aggregation.
      // DRIVER COLLECT BOUND: one row PER STRATUM — strata are
      // languages/sources (the documented driver-sized assumption of
      // this helper; sf0.1 measures 4-5 rows), never documents.
      val thrRows = keyed.groupBy(stratum)
        .agg(count(lit(1)).as("n_src"))
        .withColumn("__q", quotaOf(col("n_src")).cast("long"))
        .withColumn("__t",
          when(col("n_src") <= lit(margin.toLong) * col("__q"),
            lit(Long.MaxValue))
            .otherwise(((lit(margin.toDouble) * col("__q") / col("n_src")) *
              lit(math.pow(2, 60))).cast("long") + 1L))
        .collect().toSeq
      val thr0 = thrOf(thrRows)
      val surv0 = keyed.join(broadcast(thr0), col(stratum) <=> col("__s"))
        .drop("__s").where(col("__kp") <= col("__t"))
      // pass 2 — verify from the COUNTS side: a stratum with zero
      // survivors is absent from the survivor groupBy and must still
      // be flagged.
      // DRIVER COLLECT BOUND: <= one row per under-filled stratum —
      // a subset of the stratum set above (usually empty).
      val bad: Seq[Option[Any]] = thr0.select(col("__s"), col("n_src"),
          col("__q"))
        .join(surv0.groupBy(stratum).agg(count(lit(1)).as("__m"))
          .withColumnRenamed(stratum, "__s2"),
          col("__s") <=> col("__s2"), "left")
        .where(coalesce(col("__m"), lit(0L)) <
          least(col("__q"), col("n_src")))
        .select("__s").collect()
        .map(r => Option(r.get(0))).toSeq
      (thrRows, bad)
    }
    val (thrRows, bad) = cache match {
      case Some((key, version)) =>
        OpCaches.cachedObj(spark, s"bottomq:$key", version)(compute())
      case None => compute()
    }
    val thr = thrOf(thrRows)
    val joined = keyed.join(broadcast(thr), col(stratum) <=> col("__s"))
      .drop("__s")
    val survivors = joined.where(col("__kp") <= col("__t"))
    val admitted =
      if (bad.isEmpty) survivors
      else {
        val readmit = bad.map {
          case None => col(stratum).isNull
          case Some(v) => col(stratum) === lit(v)
        }.reduce(_ || _)
        joined.where(col("__kp") <= col("__t") || readmit)
      }
    // pass 3: the exact rank window over ≤ ~margin·q rows per stratum
    val w = Window.partitionBy(stratum).orderBy("h", "doc_id")
    admitted
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("__q"))
      .drop("__kp", "__q", "__t")
  }

  /** Shared sqrt-quota mixture core (t11 and p1_curation): rank each
    * source's rows by a salted md5 of doc_id and keep the bottom
    * ceil(sqrt(n)) — the quota is data-dependent. Routed through
    * [[bottomQByHash]], so the rank window never holds a source's
    * whole corpus. sqrt is IEEE-correctly-rounded on both engines, so
    * the quota threshold is engine-exact. Adds `h`/`rk`/`n_src`.
    */
  private[ops] def sqrtMixture(
      df: org.apache.spark.sql.DataFrame, salt: String,
      cache: Option[(String, String)] = None)
      : org.apache.spark.sql.DataFrame = {
    val h = md5(to_binary(
      concat(col("doc_id").cast("string"), lit(salt)), lit("utf-8")))
    bottomQByHash(df.withColumn("h", h), "source",
      n => ceil(sqrt(n.cast("double"))), cache = cache)
  }

  /** The session-cached distinct-5-gram relation t8/t8b share.
    *
    * Built THROUGH a transient token-array cache: the gram projection
    * reads `tk` from an InMemoryRelation leaf — a CollapseProject
    * barrier the optimizer cannot cross, which keeps tokens(text) from
    * being inlined into the gram lambda (re-split per element — the
    * 90s-vs-3s trap). Earlier rounds used repartition() as that
    * barrier, shuffling the FULL corpus once per corpus version just to
    * break projection fusion. The token cache is SCOPED to this build:
    * the gram relation is materialized eagerly (that work lands in the
    * staging pass, like every one-time side effect here) and the token
    * relation unpersisted — keeping a second corpus-sized relation
    * resident for the whole session would roughly double the cache
    * footprint for nothing. The gram relation itself is session-cached:
    * t8 references it three times (probe grams, anti side, sizes) and
    * t8b re-reads the same entry. Trade-off accepted r8: a cache-cold
    * run pays one extra pass (building the gram cache through the token
    * cache, ~+0.3 s at sf0.1 in BENCH cold) in exchange for dropping
    * the corpus-wide shuffle — the term that grows with corpus size at
    * 100 TB; warm is unchanged.
    */
  private def grams5Relation(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    // r16: fused codegen n-gram kernel (value-identical; WordNgramsSpec)
    // instead of the interpreted transform/slice/concat_ws chain
    val grams5 = when(size(col("tk")) >= 5,
      graft.functions.WordNgrams.wordNgrams(s, col("tk"), 5))
      .otherwise(array(concat_ws(" ", col("tk"))))
    val ver = OpCaches.tableVersion(s, dir, "documents")
    OpCaches.cached(s, s"text:grams5:$dir", ver) {
      val tk = table(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("tk")).cache()
      try {
        val g = tk.select(col("doc_id"), array_distinct(grams5).as("g"))
          .cache()
        g.count() // materialize through the barrier before dropping it
        g
      } finally tk.unpersist()
    }
  }

  /** t8/t8b's deterministic 3-doc "benchmark" probe set (bottom-3 by
    * md5(doc_id)).
    */
  private def contaminationProbe(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    table(s, dir, "documents")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .orderBy("h", "doc_id").limit(3)
      .select("doc_id")

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "des", "et", "est"))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  def defs: Map[String, QueryDef] = Map(

    // Token counting: whitespace tokens + a BPE-ish subword estimate
    // (~chars/4 per word, a public rule-of-thumb proxy).
    "t1_token_count" -> QueryDef(
      (s, dir) =>
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            size(tokens(col("text"))).as("n_tokens"),
            length(col("text")).as("len_chars"),
            aggregate(
              transform(tokens(col("text")),
                t => floor((length(t) + lit(3)) / lit(4)).cast("long")),
              lit(0L), (acc, x) => acc + x).as("n_subwords_est"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  len(regexp_split_to_array(lower(text), '\s+')) AS n_tokens,
        |  length(text) AS len_chars,
        |  CAST(list_sum(list_transform(regexp_split_to_array(lower(text), '\s+'),
        |    t -> (length(t) + 3) // 4)) AS BIGINT) AS n_subwords_est
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Quality scoring: length / punctuation / vocabulary-diversity ratios.
    "t2_quality_score" -> QueryDef(
      (s, dir) => {
        val toks = tokens(col("text"))
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text")).as("len_chars"),
            size(toks).as("n_tokens"),
            size(array_distinct(toks)).as("n_uniq_tokens"),
            length(regexp_replace(col("text"), "[^.!?,;:]", "")).as("n_punct"),
            (size(array_distinct(toks)).cast("double") / size(toks))
              .as("uniq_ratio"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        |  length(text) AS len_chars,
        |  len(regexp_split_to_array(lower(text), '\s+')) AS n_tokens,
        |  len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS n_uniq_tokens,
        |  length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
        |  len(list_distinct(regexp_split_to_array(lower(text), '\s+')))::DOUBLE
        |    / len(regexp_split_to_array(lower(text), '\s+')) AS uniq_ratio
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Language ID: stopword-marker voting (n-gram-free heuristic; the
    // classic fast path before a real classifier).
    "t3_lang_id" -> QueryDef(
      (s, dir) => {
        val toks = tokens(col("text"))
        val counts = langMarkers.map { case (l, ms) =>
          l -> markerCount(toks, ms)
        }
        val Seq(en, de, es, fr) = counts.map(_._2)
        val predicted =
          when(en >= de && en >= es && en >= fr && en > 0, "en")
            .when(de >= es && de >= fr && de > 0, "de")
            .when(es >= fr && es > 0, "es")
            .when(fr > 0, "fr")
            .otherwise("unk")
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang").as("labeled_lang"),
            predicted.as("predicted_lang"))
          .orderBy("doc_id")
      },
      Some("""WITH scored AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      t -> list_contains(['the','a','of','and','is'], t))) AS c_en,
        |    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      t -> list_contains(['der','die','das','und','ist'], t))) AS c_de,
        |    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      t -> list_contains(['el','la','los','y','es'], t))) AS c_es,
        |    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      t -> list_contains(['le','les','des','et','est'], t))) AS c_fr
        |  FROM documents)
        |SELECT doc_id, labeled_lang,
        |  CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en > 0 THEN 'en'
        |       WHEN c_de >= c_es AND c_de >= c_fr AND c_de > 0 THEN 'de'
        |       WHEN c_es >= c_fr AND c_es > 0 THEN 'es'
        |       WHEN c_fr > 0 THEN 'fr'
        |       ELSE 'unk' END AS predicted_lang
        |FROM scored ORDER BY doc_id""".stripMargin)),

    // Lateral fan-out: token stream with positions (posexplode) — the
    // row-explosion primitive every tokenize-then-process pipeline needs;
    // generated rows stay in the same partition (narrow, no shuffle).
    "t5_explode_tokens" -> QueryDef(
      (s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(tokens(col("text"))).as(Seq("pos", "token")))
          .where(length(col("token")) >= 8)
          .orderBy("doc_id", "pos"),
      Some("""WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id, u.pos, u.token FROM (
        |  SELECT doc_id,
        |    unnest([{'pos': i, 'token': toks[i+1]} for i in range(len(toks))]) AS u
        |  FROM tk)
        |WHERE length(u.token) >= 8 ORDER BY doc_id, u.pos""".stripMargin)),

    // Stratified sampling: deterministic bottom-K-by-hash per stratum —
    // the curation primitive for balanced training mixes. Hash-ranked,
    // so every engine (and every rerun) picks the IDENTICAL sample;
    // routed through the capped-window helper so no stratum's whole
    // corpus ever sits in one rank task.
    "t6_sample_stratified" -> QueryDef(
      (s, dir) => {
        val h = md5(to_binary(
          concat(col("doc_id").cast("string"), lit(":sample")), lit("utf-8")))
        bottomQByHash(
          table(s, dir, "documents")
            .select(col("doc_id"), col("lang"), h.as("h")),
          "lang", _ => lit(5L),
          cache = Some((s"t6:$dir",
            OpCaches.tableVersion(s, dir, "documents"))))
          .select("lang", "rk", "doc_id")
          .orderBy("lang", "rk")
      },
      Some("""WITH hashed AS (
        |  SELECT doc_id, lang, md5(doc_id::VARCHAR || ':sample') AS h
        |  FROM documents),
        |ranked AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
        |  FROM hashed)
        |SELECT lang, rk, doc_id FROM ranked
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin)),

    // Document fingerprinting: order-insensitive content hash (sorted
    // distinct tokens → md5). Detects token-shuffled duplicates exactly.
    "t4_fingerprint" -> QueryDef(
      (s, dir) =>
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(to_binary(
              array_join(array_sort(array_distinct(tokens(col("text")))), " "),
              lit("utf-8"))).as("bag_fp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    regexp_split_to_array(lower(text), '\s+'))), ' ')) AS bag_fp
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Sliding-window chunking — the standard pre-tokenization step for
    // context-window training data: overlapping 32-token windows at
    // stride 16. One generate per row, no shuffle until the final
    // order; chunk offsets are integer-exact on both engines. The LAST
    // chunk is the first whose window reaches the end of the doc
    // (n_chunks = max(0, ceil((n-32)/16)) + 1 = (n-17) div 16 + 1,
    // clamped) — iterating to (n-1) div 16 would emit a final chunk
    // strictly contained in the previous one, shipping a duplicate
    // suffix sample into the training data.
    "t7_chunk_windows" -> QueryDef(
      (s, dir) => {
        val window = 32
        val stride = 16
        // r17: fused strided-window kernel. The composed
        // transform(sequence(...), i => slice(tk, ...)) form held the
        // FULL tokenize subtree inside the lambda (tk is a captured
        // expression, and there is no materialization barrier here), so
        // interpreted evaluation re-split the document once PER CHUNK —
        // O(chunks x tokens) per row. The kernel windows one token
        // array in one codegen pass; the per-chunk token count is
        // recovered arithmetically (min(window, n - chunk_id*stride) =
        // size of the slice, trailing partial chunk included), which
        // StridedNgramsSpec pins against the composed form.
        table(s, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("tk"))
          .select(col("doc_id"), size(col("tk")).as("__n"),
            posexplode(graft.functions.StridedNgrams.stridedNgrams(
              s, col("tk"), window, stride))
            .as(Seq("chunk_id", "chunk_text")))
          .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
            least(lit(window), col("__n") - col("chunk_id") * stride)
              .cast("long").as("n_tokens"),
            col("chunk_text"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id,
        |    unnest(range(greatest(0, (len(tk) - 17) // 16) + 1)) AS chunk_id,
        |    tk
        |  FROM toks)
        |SELECT doc_id, chunk_id,
        |  CAST(len(tk[chunk_id*16+1 : chunk_id*16+32]) AS BIGINT) AS n_tokens,
        |  array_to_string(tk[chunk_id*16+1 : chunk_id*16+32], ' ') AS chunk_text
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin)),

    // PII scrubbing — redaction pass every training pipeline runs:
    // emails and long digit runs (phone/account numbers) replaced with
    // typed placeholders, with per-doc match counts for audit. Pure
    // per-row regex work (codegen'd, shuffle-free); patterns kept to
    // the regex subset Java and DuckDB RE2 interpret identically.
    "t9_pii_scrub" -> QueryDef(
      (s, dir) => {
        val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
        val digits = "[0-9]{9,}"
        // the digit pass counts on the EMAIL-REDACTED text, matching
        // the replacement chain — counting on the original would tally
        // digit runs the email pass already consumed (inside
        // "123456789@spam.com"), so audit counts would disagree with
        // the placeholders actually inserted
        val deEmailed = regexp_replace(col("text"), email, "<EMAIL>")
        table(s, dir, "documents")
          .select(col("doc_id"),
            regexp_replace(deEmailed, digits, "<NUM>").as("clean_text"),
            regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
            regexp_count(deEmailed, lit(digits)).cast("long").as("n_numbers"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        |  regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+', '<EMAIL>', 'g'),
        |    '[0-9]{9,}', '<NUM>', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+', '<EMAIL>', 'g'),
        |    '[0-9]{9,}')) AS BIGINT) AS n_numbers
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Repetition-quality signals — the classic filter rules for
    // machine-generated / boilerplate text: duplicate-2-gram ratio
    // (what fraction of adjacent word pairs are repeats) and
    // top-token coverage (how much of the doc its single most frequent
    // word accounts for). The gram ratio is a per-row array pass (no
    // shuffle); the token mode needs real aggregation, done as
    // explode → two-level groupBy so partial (map-side) aggregation
    // keeps the shuffle proportional to the VOCABULARY, not the token
    // stream — at 100 TB the (doc_id, token) combine collapses each
    // doc's tokens inside its input split before anything moves.
    "t10_repetition" -> QueryDef(
      (s, dir) => {
        val tk = tokens(col("text"))
        // 2-grams via zip_with over the array and its shifted self: the
        // lambda touches only its own variables. An index-slicing lambda
        // (slice(tk, j+1, 2)) would capture tk by name, and once
        // CollapseProject inlines the split() it re-tokenizes the
        // document PER ELEMENT — O(tokens²), the re-split trap t8
        // documents. This shape stays O(tokens) per row, fully codegen,
        // no cache or shuffle barrier needed.
        val g2 = zip_with(
          slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
          (a, b) => concat_ws(" ", a, b))
        // r16: the top-token multiplicity is PER DOCUMENT, so it never
        // needed cross-row aggregation — the previous explode →
        // groupBy(doc, token) → groupBy(doc) max(c) chain shuffled the
        // token stream twice (map-side combine kept the exchanges
        // vocabulary-proportional, but the explode and both exchanges
        // still scaled with the corpus). The fused kernel
        // (graft.functions.TopTokenCount, doc-local hash map — state
        // bounded by one doc's distinct tokens) computes the identical
        // number in the same single projection pass as the gram ratio:
        // t10 is now shuffle-free up to the presentation sort
        // (plans/r16/t10_repetition_{before,after}.txt: 2 Exchange +
        // Generate → 0 Exchange). TopTokenCountSpec pins value
        // identity against the aggregation twin; the where-guard
        // replicates explode's drop of null/empty token arrays.
        val base = table(s, dir, "documents")
          .select(col("doc_id"),
            size(tk).as("n_tokens"),
            when(size(tk) >= 2,
              lit(1.0) - size(array_distinct(g2)).cast("double")
                / (size(tk) - 1))
              .otherwise(lit(0.0)).as("dup_2gram_ratio"),
            tk.as("tk"))
        base.where(col("tk").isNotNull && size(col("tk")) > 0)
          .select(col("doc_id"), col("n_tokens"), col("dup_2gram_ratio"),
            (graft.functions.TopTokenCount.topTokenCount(s, col("tk"))
              .cast("double") / col("n_tokens")).as("top_token_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, len(tk) AS n_tokens,
        |    CASE WHEN len(tk) >= 2
        |      THEN 1.0 - len(list_distinct([array_to_string(tk[j+1:j+2], ' ')
        |        for j in range(len(tk) - 1)]))::DOUBLE / (len(tk) - 1)
        |      ELSE 0.0 END AS dup_2gram_ratio,
        |    unnest(tk) AS token
        |  FROM toks),
        |cnt AS (
        |  SELECT doc_id, n_tokens, dup_2gram_ratio, token, count(*) AS c
        |  FROM base GROUP BY doc_id, n_tokens, dup_2gram_ratio, token),
        |top AS (
        |  SELECT doc_id, n_tokens, dup_2gram_ratio, max(c) AS top_cnt
        |  FROM cnt GROUP BY doc_id, n_tokens, dup_2gram_ratio)
        |SELECT doc_id, n_tokens, dup_2gram_ratio,
        |  CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_ratio
        |FROM top ORDER BY doc_id""".stripMargin)),

    // Mixture sampling — temperature-scaled per-source quotas, the
    // multilingual/multi-source rebalancing step: each source keeps its
    // md5-bottom-ceil(sqrt(n)) docs, so big sources are downsampled
    // hard and small ones kept nearly whole (sqrt ≈ T=0.5 sampling).
    // Unlike t6 the quota is DATA-DEPENDENT (computed from the same
    // window pass, no second scan). One shuffle on source; ranking and
    // counting share the partitioning. sqrt is IEEE-correctly-rounded
    // on both engines, so the quota threshold is engine-exact.
    "t11_mixture_sample" -> QueryDef(
      (s, dir) =>
        sqrtMixture(
          table(s, dir, "documents").select(col("doc_id"), col("source")),
          ":mix",
          cache = Some((s"t11:$dir",
            OpCaches.tableVersion(s, dir, "documents"))))
          .select(col("source"), col("n_src"), col("rk"), col("doc_id"))
          .orderBy("source", "rk"),
      Some("""WITH hashed AS (
        |  SELECT doc_id, source, md5(doc_id::VARCHAR || ':mix') AS h
        |  FROM documents),
        |ranked AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n_src
        |  FROM hashed)
        |SELECT source, n_src, rk, doc_id FROM ranked
        |WHERE rk <= ceil(sqrt(n_src)) ORDER BY source, rk""".stripMargin)),

    // Vocabulary construction — the tokenizer-seeding primitive: global
    // top-K tokens by frequency with a deterministic tie-break. The
    // groupBy shuffles the VOCABULARY (map-side combine collapses each
    // split's token stream first), and the top-K runs as
    // TakeOrderedAndProject — per-partition heaps, K rows to the
    // driver, never a full sort shuffle. At 100 TB this is the textbook
    // word-count-then-top-K; nothing grows with the corpus except the
    // combine input.
    "t12_vocabulary" -> QueryDef(
      (s, dir) =>
        table(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token").asc)
          .limit(100),
      Some("""SELECT token, count(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin)),

    // Zipf-exponent fit over the top-100 vocabulary — the corpus-health
    // statistic (natural text ⇒ alpha ≈ 1; templated/synthetic corpora
    // drift): alpha = −slope of ln(freq) on ln(rank), via the built-in
    // regression aggregate over the SAME deterministic top-K both
    // engines compute for t12. One vocabulary shuffle (map-side
    // combined) + a 100-row regression — corpus-size-independent after
    // the count.
    "t14_zipf_alpha" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy(col("n").desc, col("token").asc)
        table(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token").asc)
          .limit(100)
          .withColumn("rank", row_number().over(w))
          .agg(count(lit(1)).as("n_points"),
            round(-expr("regr_slope(ln(n), ln(rank))"), 6).as("alpha"))
      },
      Some("""WITH vocab AS (
        |  SELECT token, count(*) AS n FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token
        |    FROM documents)
        |  GROUP BY token ORDER BY n DESC, token LIMIT 100),
        |ranked AS (
        |  SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank
        |  FROM vocab)
        |SELECT count(*) AS n_points,
        |  round(-regr_slope(ln(n), ln(rank)), 6) AS alpha
        |FROM ranked""".stripMargin)),

    // Contamination check — benchmark-overlap decontamination: a
    // deterministic 3-doc "benchmark" probe set (bottom-3 by
    // md5(doc_id)), distinct 5-gram overlap counted per remaining
    // document. The probe gram set is tiny → broadcast joins; the
    // corpus side stays a linear scan. At 100 TB the probe set is the
    // real benchmark suite and the same shape holds (t8b below is the
    // broadcast-Bloom variant for when even the gram SET is too big to
    // broadcast).
    "t8_contamination" -> QueryDef(
      (s, dir) => {
        val docs5 = grams5Relation(s, dir)
        val probe = contaminationProbe(s, dir)
        val probeGrams = docs5
          .join(broadcast(probe), "doc_id")
          .select(explode(col("g")).as("gram")).distinct()
        val hits = docs5
          .join(broadcast(probe), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), size(col("g")).as("n_grams"),
            explode(col("g")).as("gram"))
          .join(broadcast(probeGrams), "gram")
          .groupBy("doc_id", "n_grams")
          .agg(count(lit(1)).as("n_overlap"))
        hits.select(col("doc_id"), col("n_overlap"),
          (col("n_overlap").cast("double") / col("n_grams"))
            .as("overlap_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 5
        |    THEN [array_to_string(tk[j+1:j+5], ' ') for j in range(len(tk) - 4)]
        |    ELSE [array_to_string(tk, ' ')] END) AS g
        |  FROM toks),
        |probe AS (
        |  SELECT doc_id FROM documents
        |  ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 3),
        |pg AS (
        |  SELECT DISTINCT unnest(g.g) AS gram
        |  FROM g JOIN probe USING (doc_id)),
        |cand AS (
        |  SELECT doc_id, len(g) AS n_grams, unnest(g) AS gram FROM g
        |  WHERE doc_id NOT IN (SELECT doc_id FROM probe)),
        |hits AS (
        |  SELECT doc_id, n_grams, count(*) AS n_overlap
        |  FROM cand JOIN pg USING (gram) GROUP BY doc_id, n_grams)
        |SELECT doc_id, CAST(n_overlap AS BIGINT) AS n_overlap,
        |  CAST(n_overlap AS DOUBLE) / n_grams AS overlap_ratio
        |FROM hits ORDER BY doc_id""".stripMargin)),

    // Broadcast-Bloom contamination (t8's 100 TB scale path): at a real
    // benchmark-suite size the probe GRAM SET itself is too big to
    // broadcast-join (it is the suite's text volume), but its Bloom
    // filter is a few hundred MB at 10^8 grams / 1% fpp — ONE
    // driver-built sketch riding the task binary, corpus side still a
    // linear scan, membership test codegen'd (BloomMightContain, no
    // UDF). Bloom never misses, so the flagged overlap per doc is
    // >= the exact count; the differential below pins BOTH directions:
    // no doc under-counts vs the exact t8 definition, and the total
    // false-positive excess stays inside a generous fpp budget
    // (10x expected + slack — deterministic, since the filter build is
    // a bitwise-OR merge and order-independent). Same twin shape as
    // q22_approx_vs_exact / s9.
    "t8b_contamination_bloom" -> QueryDef(
      (s, dir) => {
        val docs5 = grams5Relation(s, dir)
        val probe = contaminationProbe(s, dir)
        // cached for its two consumers (the sizing count and the filter
        // build) — without it each runs the join+explode+distinct again
        val probeGrams = docs5
          .join(broadcast(probe), "doc_id")
          .select(explode(col("g")).as("gram")).distinct()
          .cache()
        val (ser, fpp) =
          try {
            val nProbeGrams = probeGrams.count()
            val fpp = 0.01
            val bloom = probeGrams.stat.bloomFilter("gram",
              math.max(nProbeGrams, 1L), fpp)
            val out = new java.io.ByteArrayOutputStream()
            bloom.writeTo(out)
            (out.toByteArray, fpp)
          } finally { probeGrams.unpersist(); () }
        val flaggedCol = graft.functions.BloomMightContain
          .bloomMightContain(s, col("gram"), ser)
        val nonProbe = docs5
          .join(broadcast(probe), Seq("doc_id"), "left_anti")
        val flagged = nonProbe
          .select(col("doc_id"), explode(col("g")).as("gram"))
          .where(flaggedCol)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_flagged"))
        val exact = defs("t8_contamination").fn(s, dir)
          .select(col("doc_id"), col("n_overlap"))
        // tested-gram volume as one aggregate over the cached gram
        // relation — no second corpus-wide explode just to count rows
        val totalTested = nonProbe
          .agg(coalesce(sum(size(col("g"))), lit(0L))).collect()(0).getLong(0)
        val excessBudget = math.ceil(totalTested * fpp * 10).toLong + 10
        // FULL outer: a doc only on the exact side (a Bloom miss —
        // impossible by construction, so its appearance is the bug
        // being guarded) drives the min below zero; a doc only on the
        // flagged side is a pure-false-positive doc and charges the
        // excess budget.
        val joined = flagged.join(exact, Seq("doc_id"), "full_outer")
          .select(coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
            coalesce(col("n_overlap"), lit(0L)).as("n_exact"))
        joined.agg(
          // coalesce: a vacuously clean corpus (no overlap, no false
          // positives) joins zero rows and min/sum return NULL — that
          // is a PASS, not a mismatch against the oracle's `true`
          coalesce(
            min(col("n_flagged") - col("n_exact")) >= 0L &&
              sum(col("n_flagged") - col("n_exact")) <= excessBudget,
            lit(true)).as("bloom_ok"))
      },
      Some("SELECT true AS bloom_ok")),

    // Unigram language-model quality proxy (the CCNet/KenLM-style
    // filtering signal): per-doc mean -ln p(token) under the corpus's
    // OWN unigram distribution — high = rare-token soup (boilerplate,
    // gibberish, wrong language), low = common fluent text. Scale
    // shape: one explode, one token-count shuffle (map-side combined,
    // shuffle ∝ vocabulary), one tokens⋈counts shuffle join, one doc
    // aggregation. The score rounds to 6 decimals on BOTH engines:
    // double addition order differs between Spark's distributed avg
    // and DuckDB's sequential one at ~1e-13 relative — far inside the
    // rounding, while real score differences are ~1e-1.
    "t13_unigram_logprob" -> QueryDef(
      (s, dir) => {
        // the exploded token relation is referenced twice (tf build +
        // scoring join): cached per corpus version so the documents
        // scan and the explode run once, not three times
        val toks = OpCaches.cached(s, s"text:toks:$dir",
            OpCaches.tableVersion(s, dir, "documents")) {
          table(s, dir, "documents")
            .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        }
        val tf = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        // the corpus total stays IN the plan (broadcast 1-row cross
        // join, mirroring the oracle's scalar subquery): no eager
        // driver action, tf's shuffle reused, empty corpus yields
        // zero rows instead of an NPE
        val tot = broadcast(tf.agg(sum("c").cast("double").as("n")))
        toks.join(tf, "tok").crossJoin(tot)
          .select(col("doc_id"), log(col("n") / col("c")).as("nlp"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(avg("nlp"), 6).as("avg_neg_logp"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |  FROM documents),
        |tf AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT sum(c)::DOUBLE AS n FROM tf),
        |scored AS (
        |  SELECT t.doc_id, ln((SELECT n FROM tot) / tf.c) AS nlp
        |  FROM toks t JOIN tf USING (tok))
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(nlp), 6) AS avg_neg_logp
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Model-based quality filter (the GPT-3/LLaMA-recipe classifier
    // stage): a fastText-shaped linear model over hashed unigram +
    // bigram features scores each document, docs below the decision
    // boundary are dropped. The "trained" weight vector is a hash
    // projection — w(feature) = md5-derived integer in [-1000, 1000]
    // milli-units — which keeps the op deterministic and cross-engine
    // while exercising the EXACT production shape: per-row feature
    // extraction + dot-product against a weight table that never
    // materializes (hashing IS the lookup, the classic hashing-trick
    // deployment of fastText-style filters). Scoring is a pure per-row
    // map over codegen built-ins — zero shuffles, zero UDFs; at 100 TB
    // it scales with input splits and nothing else. The decision
    // (w_sum >= 0) and the score sum are EXACT integer math — no
    // engine's float summation order can flip a borderline doc — and
    // the reported mean is one deterministic IEEE division at the end.
    "t15_classifier_filter" -> QueryDef(
      (s, dir) => {
        // weight lookup: first 6 md5 hex digits → [0, 2000] → centered
        // milli-units. conv() and DuckDB's 0x-cast read the same hex.
        def w(f: Column): Column =
          conv(substring(md5(f), 1, 6), 16, 10).cast("long") % 2001L - 1000L
        // toks materialized first: lambdas re-evaluate captured
        // expressions per element (no CSE in higher-order functions)
        table(s, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("tk"))
          .select(col("doc_id"), concat(col("tk"),
            // r16: fused bigram kernel (WordNgrams) — same values, one
            // codegen pass instead of the interpreted HOF chain
            when(size(col("tk")) >= 2,
              graft.functions.WordNgrams.wordNgrams(s, col("tk"), 2))
              .otherwise(array().cast("array<string>"))).as("feats"))
          .select(col("doc_id"), size(col("feats")).as("n_feats"),
            aggregate(col("feats"), lit(0L), (acc, f) => acc + w(f))
              .as("w_sum_milli"))
          .select(col("doc_id"), col("n_feats"), col("w_sum_milli"),
            (col("w_sum_milli") >= 0L).as("kept"),
            round(col("w_sum_milli").cast("double") /
              (col("n_feats") * 1000.0), 6).as("mean_w"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, tk || CASE WHEN len(tk) >= 2
        |    THEN [array_to_string(tk[j+1:j+2], ' ') for j in range(len(tk) - 1)]
        |    ELSE []::VARCHAR[] END AS feats
        |  FROM toks),
        |scored AS (
        |  SELECT doc_id, len(feats) AS n_feats,
        |    list_sum(list_transform(feats, f ->
        |      ('0x' || substr(md5(f), 1, 6))::BIGINT % 2001 - 1000))::BIGINT
        |      AS w_sum_milli
        |  FROM feats)
        |SELECT doc_id, CAST(n_feats AS INTEGER) AS n_feats, w_sum_milli,
        |  w_sum_milli >= 0 AS kept,
        |  round(w_sum_milli::DOUBLE / (n_feats * 1000.0), 6) AS mean_w
        |FROM scored ORDER BY doc_id""".stripMargin)),

    // BM25 ranked retrieval (r15) — the lexical-search primitive a
    // curation pipeline uses for targeted decontamination and
    // quality-targeted selection: score every document against a query
    // set with Okapi BM25 (k1=1.2, b=0.75, the non-negative
    // ln(1 + (N-df+0.5)/(df+0.5)) idf) and keep the top-10 per query.
    // The query set is corpus-derived and deterministic — the 3 docs
    // with the smallest md5(doc_id||':bm25q') (the t8 probe pattern),
    // each contributing its distinct tokens; the query doc itself is
    // excluded from its own candidates. Scores round to 6 decimals
    // BEFORE ranking on both engines (the t13 argument: distributed
    // vs sequential double addition differs at ~1e-13 relative, real
    // score gaps are ~1e-1), ties broken by doc_id.
    //
    // Scale shape: tf = one (doc, tok) shuffle (map-side combined);
    // dl = one combiner-bound per-doc count; query terms and their
    // df/idf are METADATA-sized and BROADCAST, so only docs sharing a
    // query term survive the tf join — the dl attach joins doc-count-
    // sized relations (one row per doc, not per token). The top-10 is
    // a SALTED two-pass rank: rank within (query, salt=hash(doc)%32),
    // keep ≤10, then the exact rank over ≤320 survivors per query —
    // the global top-10 is a subset of its salted groups' top-10s, so
    // this is exact, and no task ever ranks a whole query's candidate
    // set (3 queries over a 100 TB corpus would otherwise funnel
    // corpus/3 through one window task — the p6/t11 pathology).
    "t16_bm25_topk" -> QueryDef(
      (s, dir) => {
        // r17 NEGATIVE RESULT, kept deliberately in the r16 shape: the
        // single-corpus-exchange build (cache tf per corpus version,
        // derive dl = sum(tf), n_docs/avgdl/df from it — verdict item
        // 1) was implemented, plan-verified (one (doc,tok) exchange
        // inside one InMemoryRelation — the dump is committed as
        // plans/r17/t16_bm25_topk_tfcache_rejected.txt), oracle-green —
        // and measured SLOWER cold
        // at sf0.1: interleaved A/B (graft.T16ABProbe, deepClean before
        // every shot, 5 rounds x 4 variants) reads this shape at
        // med 2.26/min 1.84 s vs 3.95/2.89 for the tf-cache build,
        // 3.53/3.12 without the dl cache, 3.15/2.96 deriving dl from
        // an uncached tf, 2.71/2.35 for a doc-sized dl cache alone.
        // Materializing the (doc,tok) aggregate into an
        // InMemoryRelation costs more than the doc-scale
        // re-aggregations of the already-cached token stream it
        // deduplicates (guide §1.1's "the ideal plan is usually slower
        // at first" — here the gotcha is IMR build cost, and it holds
        // at every cache granularity tried). The five corpus passes
        // the r16 plan shows are all over the toks IMR with map-side
        // combine — shuffle bytes are vocabulary/doc-count sized, so
        // the 100 TB scaling term is unchanged by the revert. The r16
        // driver's t16 cold_min3 drift (+30%) did not reproduce:
        // same-code baseline this round reads 1.35 s (driver r16 read
        // 2.15 on identical code) — box-state, as OPTIMIZATION_r16.md
        // diagnosed; the 5-shot cold_min3 instrumentation added this
        // round makes that class of swing attributable per shot.
        val toks = OpCaches.cached(s, s"text:toks:$dir",
            OpCaches.tableVersion(s, dir, "documents")) {
          table(s, dir, "documents")
            .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        }
        val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = broadcast(dl.agg(
          count(lit(1)).cast("double").as("n_docs"),
          avg(col("dl")).as("avgdl")))
        val qdocs = table(s, dir, "documents")
          .select(col("doc_id").as("query_id"),
            md5(to_binary(concat(col("doc_id").cast("string"),
              lit(":bm25q")), lit("utf-8"))).as("__h"))
          .orderBy("__h", "query_id").limit(3).drop("__h")
        val qterms = toks
          .join(broadcast(qdocs), col("doc_id") === col("query_id"))
          .select("query_id", "tok").distinct()
        // df only for query terms: vocabulary-sized df never ships —
        // the per-term idf frame is (query terms × stats), broadcast
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
          .select(col("query_id"), col("rank"), col("doc_id"),
            col("score_q"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (
        |  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        |qdocs AS (
        |  SELECT doc_id AS query_id FROM documents
        |  ORDER BY md5(doc_id::VARCHAR || ':bm25q'), doc_id LIMIT 3),
        |qterms AS (
        |  SELECT DISTINCT q.query_id, t.tok
        |  FROM qdocs q JOIN toks t ON t.doc_id = q.query_id),
        |dfq AS (
        |  SELECT f.tok, count(*) AS df FROM tf f
        |  WHERE f.tok IN (SELECT DISTINCT tok FROM qterms)
        |  GROUP BY f.tok),
        |scored AS (
        |  SELECT qt.query_id, f.doc_id,
        |    round(sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
        |      * f.tf * 2.2
        |      / (f.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))), 6)
        |      AS score_q
        |  FROM qterms qt
        |  JOIN tf f USING (tok)
        |  JOIN dfq d USING (tok)
        |  JOIN dl l ON l.doc_id = f.doc_id
        |  CROSS JOIN stats s
        |  WHERE f.doc_id <> qt.query_id
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id, score_q,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_q DESC, doc_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, doc_id, score_q FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)))
}
