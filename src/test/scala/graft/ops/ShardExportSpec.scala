package graft.ops

import org.apache.spark.sql.functions._

import graft.{DeltaLake, SparkSuite}
import graft.delta.DeltaLog

/** The materialized shard export (p8): shard-partitioned Delta files
  * written through the optimized-write path with bounded per-file
  * record counts, plus a manifest computed from the stored rows. The
  * p8 oracle pins the manifest math; this spec pins the FILE layout
  * the oracle can't see.
  */
class ShardExportSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_shardexp").toString + "/exp"

  test("export lays out shard directories with bounded, coherent files") {
    val path = tmp()
    PipelineOps.exportShards(spark, dir, path, maxRecordsPerFile = 32)
    val snap = DeltaLog.forPath(spark, path)
    assert(snap.partitionColumns == Seq("shard"))
    assert(snap.configuration.get("delta.autoOptimize.optimizeWrite")
      .contains("true"))

    val files = snap.liveFiles
    // every file belongs to exactly one shard directory...
    assert(files.forall(_.path.startsWith("shard=")))
    val shards = files.flatMap(_.partitionValues.get("shard").flatten).toSet
    assert(shards.size == 8, s"expected 8 shard dirs, got $shards")
    // ...and respects the record bound (from the stats the write put
    // in the log)
    val counts = files.flatMap(_.parsedStats.flatMap(_.numRecords))
    assert(counts.length == files.length, "every file carries numRecords")
    assert(counts.forall(_ <= 32L), s"file over the record bound: $counts")
    // optimized write keeps the layout coherent: files per shard is
    // ceil(shard rows / bound)-ish, not one sliver per input task
    val total = counts.sum
    assert(files.length <= shards.size * (total / shards.size / 32 + 2),
      s"${files.length} files for $total rows — small-file explosion")

    // the stored manifest equals a recompute from the stored rows
    val stored = DeltaLake.scanDelta(spark, path + "_manifest")
      .orderBy("shard").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val recomputed = DeltaLake.scanDelta(spark, path)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
        sum(col("seq") * col("doc_id")).as("order_fingerprint"))
      .orderBy("shard").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stored.toSeq == recomputed.toSeq)
    assert(stored.map(_._2).sum ==
      Registry.table(spark, dir, "documents").count())
  }

  test("exported rows scan back with partition pruning on shard") {
    val path = tmp()
    PipelineOps.exportShards(spark, dir, path, maxRecordsPerFile = 64)
    val one = DeltaLake.scanDelta(spark, path,
      graft.delta.ScanSettings(
        conditions = Seq(graft.delta.Cond("shard", "=", 3L))))
    val snap = DeltaLog.forPath(spark, path)
    val shard3Files = snap.liveFiles.count(
      _.partitionValues.get("shard").flatten.contains("3"))
    // pruning reads only shard=3's files
    assert(one.inputFiles.length == shard3Files)
    assert(one.select("shard").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(3L))
  }
}
