package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import Registry.table

/** Multimodal-column plumbing: media (image/audio/video) modeled as
  * opaque `binary` columns plus typed metadata, with decode /
  * feature-extraction as partition-wise batch transforms.
  *
  * The container has no media codecs, so the decode step is a clearly
  * marked DETERMINISTIC STUB (`fakeDecode`) — but everything Spark-side
  * is real and tested: the binary column handling, the explicit output
  * schema, the `mapPartitions` batch shape (one iterator pass, no
  * per-row session setup — where a real decoder would amortize model /
  * codec init), and the partitioning story (decode is narrow: no
  * shuffle, scales with input splits). The stub derives everything from
  * md5 of the payload, so even the STUBBED pipeline is under the DuckDB
  * oracle end to end (m2/m3) — the harness checks the plumbing, not
  * just row counts.
  */
object MultimodalOps {

  /** STUB for a real media decoder. Deterministic: pseudo "image"
    * metadata and an 8-dim feature vector derived from a 60-bit integer
    * h = first 15 hex chars of md5(bytes) — chosen because any engine
    * can recompute it (the m2/m3 DuckDB oracles do). A real build
    * replaces the body with e.g. a JNI codec call, keeping the
    * signature: bytes in → (width, height, channels, features) out.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).take(8).map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16) // 60 bits, positive
    val width = 64 + (h % 512).toInt
    val height = 64 + ((h >>> 16) % 512).toInt
    val channels = 1 + ((h >>> 32) % 4).toInt
    val features = Array.tabulate(8)(j => ((h >>> (j * 8)) % 1000) / 1000.0)
    (width, height, channels, features)
  }

  /** STUB for a real frame decoder: the "brightness" of frame `idx` of
    * a "video" payload, derived from md5(bytes ++ "#idx") so the m4
    * DuckDB oracle can recompute it. A real build seeks the container
    * to the frame and decodes; the signature (bytes, index) → scalar
    * feature stays.
    */
  def fakeFrameBrightness(bytes: Array[Byte], idx: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(bytes)
    md.update(s"#$idx".getBytes("UTF-8"))
    val hex = md.digest().take(8).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex.take(15), 16) % 1000) / 1000.0
  }

  /** The oracle twin of [[fakeDecode]]'s `h` over an arbitrary VARCHAR
    * expression, as a DuckDB expression.
    */
  private def hSqlOf(e: String): String =
    s"""list_reduce([strpos('0123456789abcdef',
      |    substring(md5($e), i + 1, 1)) - 1 for i in range(15)],
      |  (a, b) -> a * 16 + b)""".stripMargin

  private val hSql = hSqlOf("text")

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType), nullable = false)))

  /** Binary payload column stand-in: the document text's UTF-8 bytes.
    * In production this is the real media blob column.
    */
  private def withBlob(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("blob"),
        col("text").as("doc_text"))

  private def decoded(s: SparkSession, dir: String): DataFrame = {
    val blobs = withBlob(s, dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    blobs.mapPartitions { it =>
      // one pass per partition: a real decoder would init its codec
      // here, once, then stream the batch through it
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, c, f) = fakeDecode(bytes)
        Row(id, bytes.length, w, h, c, f.toSeq)
      }
    }(enc)
  }

  def defs: Map[String, QueryDef] = Map(

    // Typed metadata over the opaque binary column — pure built-ins.
    "m1_binary_meta" -> QueryDef(
      (s, dir) =>
        withBlob(s, dir)
          .select(col("doc_id"),
            length(col("blob")).as("n_bytes"),
            lower(hex(to_binary(substring(col("doc_text"), 1, 4), lit("utf-8"))))
              .as("magic"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  lower(hex(encode(substring(text, 1, 4)))) AS magic
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Partition-wise decode + feature extraction (stubbed codec). The
    // feature vector is emitted as scalar columns f0..f7 — the shape a
    // downstream feature store wants, and sortable by the rows-check.
    "m2_decode_features" -> QueryDef(
      (s, dir) =>
        decoded(s, dir)
          .select(Seq(col("doc_id"), col("n_bytes"), col("width"),
            col("height"), col("channels")) ++
            (0 until 8).map(j => col("features")(j).as(s"f$j")): _*)
          .orderBy("doc_id"),
      Some(s"""WITH h AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |    $hSql AS h
        |  FROM documents)
        |SELECT doc_id, n_bytes,
        |  CAST(64 + h % 512 AS INT) AS width,
        |  CAST(64 + (h >> 16) % 512 AS INT) AS height,
        |  CAST(1 + (h >> 32) % 4 AS INT) AS channels,
        |  ((h >> 0) % 1000) / 1000.0 AS f0,
        |  ((h >> 8) % 1000) / 1000.0 AS f1,
        |  ((h >> 16) % 1000) / 1000.0 AS f2,
        |  ((h >> 24) % 1000) / 1000.0 AS f3,
        |  ((h >> 32) % 1000) / 1000.0 AS f4,
        |  ((h >> 40) % 1000) / 1000.0 AS f5,
        |  ((h >> 48) % 1000) / 1000.0 AS f6,
        |  ((h >> 56) % 1000) / 1000.0 AS f7
        |FROM h ORDER BY doc_id""".stripMargin)),

    // Feature post-processing back in the declarative world: bucket by
    // pseudo-resolution, aggregate feature norms.
    "m3_feature_stats" -> QueryDef(
      (s, dir) =>
        decoded(s, dir)
          .withColumn("mp_bucket",
            floor((col("width") * col("height")) / 65536).cast("int"))
          .groupBy("mp_bucket")
          .agg(count(lit(1)).as("n"),
            avg(aggregate(col("features"), lit(0.0),
              (acc, x) => acc + x * x)).as("avg_sq_norm"))
          .orderBy("mp_bucket"),
      Some(s"""WITH h AS (
        |  SELECT doc_id, $hSql AS h FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    64 + h % 512 AS width, 64 + (h >> 16) % 512 AS height,
        |    [((h >> (j * 8)) % 1000) / 1000.0 for j in range(8)] AS feats
        |  FROM h)
        |SELECT CAST(floor((width * height) / 65536.0) AS INT) AS mp_bucket,
        |  count(*) AS n,
        |  avg(list_reduce(list_transform(feats, x -> x * x),
        |    (a, b) -> a + b)) AS avg_sq_norm
        |FROM d GROUP BY 1 ORDER BY mp_bucket""".stripMargin)),

    // Frame sampling over a "video" payload: probe the container for
    // its frame count (stub: 8 + h % 56), then decode 4 evenly spaced
    // frames per clip — the standard video-pretraining subsample. The
    // per-row fan-out happens INSIDE mapPartitions (a real decoder
    // seeks once per clip and emits the sampled frames from one open
    // container — exploding first would re-open it per frame); narrow,
    // no shuffle until the final sort. Frame features derive from
    // md5(bytes ++ "#idx") so the stubbed pipeline stays oracle-checked.
    "m4_frame_sample" -> QueryDef(
      (s, dir) => {
        val frameSchema = StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("frame_idx", LongType, nullable = false),
          StructField("n_frames", IntegerType, nullable = false),
          StructField("brightness", DoubleType, nullable = false)))
        val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
          .encoderFor(frameSchema)
        withBlob(s, dir).mapPartitions { it =>
          it.flatMap { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val h = {
              val md = java.security.MessageDigest.getInstance("MD5")
              val hex = md.digest(bytes).take(8).map(b => f"$b%02x").mkString
              java.lang.Long.parseLong(hex.take(15), 16)
            }
            val nFrames = (8 + h % 56).toInt
            (0 until 4).iterator.map { i =>
              val idx = i.toLong * nFrames / 4
              Row(id, idx, nFrames, fakeFrameBrightness(bytes, idx))
            }
          }
        }(enc).orderBy("doc_id", "frame_idx")
      },
      Some(s"""WITH h AS (
        |  SELECT doc_id, text, ${hSqlOf("text")} AS h FROM documents),
        |v AS (
        |  SELECT doc_id, text, CAST(8 + h % 56 AS INT) AS n_frames FROM h),
        |f AS (
        |  SELECT doc_id, text, n_frames,
        |    CAST((t.i * n_frames) // 4 AS BIGINT) AS frame_idx
        |  FROM v CROSS JOIN range(4) t(i))
        |SELECT doc_id, frame_idx, n_frames,
        |  (${hSqlOf("text || '#' || frame_idx::VARCHAR")} % 1000) / 1000.0
        |    AS brightness
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin)))
}
