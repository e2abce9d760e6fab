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
  * shuffle, scales with input splits).
  */
object MultimodalOps {

  /** STUB for a real media decoder. Deterministic: derives pseudo
    * "image" metadata and an 8-dim feature vector from the bytes alone.
    * A real build replaces the body with e.g. a JNI codec call, keeping
    * the signature: bytes in → (width, height, channels, features) out.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    var h = 1125899906842597L // deterministic FNV-ish rolling hash
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val width = 64 + math.floorMod(h, 512).toInt
    val height = 64 + math.floorMod(h >>> 16, 512).toInt
    val channels = 1 + math.floorMod(h >>> 32, 4).toInt
    val features = Array.tabulate(8) { j =>
      math.floorMod(h >>> (j * 8), 1000).toFloat / 1000f
    }
    (width, height, channels, features)
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Binary payload column stand-in: the document text's UTF-8 bytes.
    * In production this is the real media blob column.
    */
  private def withBlob(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("blob"),
        col("text").as("doc_text"))

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
    // feature vector is emitted as scalar columns f0..f7 (not
    // array<float>: the driver's rows-check sorts columns in pandas,
    // which cannot sort ndarray cells) — also the shape a downstream
    // feature store wants.
    "m2_decode_features" -> QueryDef(
      (s, dir) => {
        val blobs = withBlob(s, dir)
        val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
          .encoderFor(decodedSchema)
        val decoded = blobs.mapPartitions { it =>
          // one pass per partition: a real decoder would init its codec
          // here, once, then stream the batch through it
          it.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val (w, h, c, f) = fakeDecode(bytes)
            Row(id, bytes.length, w, h, c, f.toSeq)
          }
        }(enc)
        decoded
          .select(Seq(col("doc_id"), col("n_bytes"), col("width"),
            col("height"), col("channels")) ++
            (0 until 8).map(j => col("features")(j).as(s"f$j")): _*)
          .orderBy("doc_id")
      },
      None),

    // Feature post-processing back in the declarative world: bucket by
    // pseudo-resolution, aggregate feature norms.
    "m3_feature_stats" -> QueryDef(
      (s, dir) => {
        val blobs = withBlob(s, dir)
        val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
          .encoderFor(decodedSchema)
        val decoded = blobs.mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val (w, h, c, f) = fakeDecode(bytes)
            Row(id, bytes.length, w, h, c, f.toSeq)
          }
        }(enc)
        decoded
          .withColumn("mp_bucket",
            ((col("width") * col("height")) / 65536).cast("int"))
          .groupBy("mp_bucket")
          .agg(count(lit(1)).as("n"),
            avg(aggregate(col("features"), lit(0.0),
              (acc, x) => acc + x.cast("double") * x.cast("double")))
              .as("avg_sq_norm"))
          .orderBy("mp_bucket")
      },
      None))
}
