package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Registry.table

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table. All are single-pass, shuffle-free per-row
  * transforms built from codegen'd built-ins (no UDFs) — at 100 TB they
  * scale linearly with input splits.
  */
object TextOps {

  private def tokens(c: Column): Column = split(lower(c), "\\s+")

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
    // one shuffle on the stratum key.
    "t6_sample_stratified" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val h = md5(to_binary(
          concat(col("doc_id").cast("string"), lit(":sample")), lit("utf-8")))
        val w = Window.partitionBy("lang").orderBy("h", "doc_id")
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), h.as("h"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 5)
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
        |FROM documents ORDER BY doc_id""".stripMargin)))
}
