package graft.streaming

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.StreamingBridge
import org.apache.spark.sql.types.StructType

import graft.delta.{ActionCodec, AddAction, CdfEngine, DeltaLog, DeltaScan, DeltaSnapshot, ScanSettings}

/** `(version, index)` stream position; ordered lexicographically. */
final case class GraftDeltaSourceOffset(version: Long, index: Long)
    extends Offset {
  override def json: String = s"""{"version":$version,"index":$index}"""
  def <(o: GraftDeltaSourceOffset): Boolean =
    version < o.version || (version == o.version && index < o.index)
}

object GraftDeltaSourceOffset {
  /** Restored offsets arrive as `SerializedOffset` (raw WAL json); parse
    * by content, not class.
    */
  def of(o: Offset): GraftDeltaSourceOffset = o match {
    case g: GraftDeltaSourceOffset => g
    case other =>
      val n = ActionCodec.mapper.readTree(other.json)
      GraftDeltaSourceOffset(n.get("version").asLong, n.get("index").asLong)
  }
}

object GraftDeltaSource {
  private[streaming] def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta requires a table path: readStream.format(\"graft-delta\").load(path)"))
}

/** `spark.readStream.format("graft-delta")` — a first-class Structured
  * Streaming SOURCE over our Delta log reader, the registered-format twin
  * of the library-loop replay in [[DeltaStream]] (same per-commit
  * semantics, but driven by `MicroBatchExecution`: real triggers, WAL
  * offset checkpointing, rate limiting, restart recovery).
  *
  * Offsets are `(version, index)`: `index` files of commit `version`'s
  * deterministic add-list (sorted by path) have been consumed. Commits
  * are immutable and the ordering is deterministic, so any `(start, end]`
  * range replays identically after a restart — the exactly-once
  * contract. The resolved starting position is persisted under the
  * source's `metadataPath` on first start (like FileStreamSource /
  * delta-spark's DeltaSource), so a restart — even one before the first
  * batch commits — resumes the ORIGINAL stream, not a re-resolved head.
  *
  * Options:
  *  - `startingVersion` (default absent): absent = one initial-snapshot
  *    batch of the table's current live files, then per-commit tailing
  *    (delta-spark's default); a number N = no snapshot, replay fresh
  *    adds commit-by-commit from version N; `latest` = only commits
  *    AFTER the stream starts.
  *  - `maxFilesPerTrigger` / `maxBytesPerTrigger`: admission control per
  *    micro-batch (at least one file always admits, so an oversized file
  *    cannot wedge the stream).
  *
  * Semantics (delta-spark source parity): layout-only rewrites
  * (`dataChange=false`, OPTIMIZE) and re-adds of already-live paths (DV
  * deletes restating a file) are never re-emitted; deletes don't retract
  * (append-stream contract); each batch reads its files with the
  * deletion-vector state AS OF that commit. Additive schema evolution
  * mid-stream null-fills older batches to the head schema through the
  * column-mapping-aware remap ([[graft.delta.CdfEngine.remapToHead]]);
  * the stream's declared schema is pinned at start, so a table evolved
  * PAST it fails loudly with a restart hint rather than emitting rows
  * the sink's schema can't hold.
  */
class GraftDeltaSource(
    spark: SparkSession,
    metadataPath: String,
    parameters: Map[String, String]) extends Source {

  import GraftDeltaSourceOffset.of

  private val path = GraftDeltaSource.pathOf(parameters)

  private val maxFiles: Option[Int] =
    parameters.get("maxFilesPerTrigger").map { v =>
      val n = v.toInt
      require(n > 0, s"maxFilesPerTrigger must be positive, got $v")
      n
    }
  private val maxBytes: Option[Long] =
    parameters.get("maxBytesPerTrigger").map { v =>
      val n = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
      require(n > 0, s"maxBytesPerTrigger must be positive, got $v")
      n
    }

  /** Resolved start, stable across restarts: `snapshotVersion` set means
    * version `startVersion`'s "adds" are the initial snapshot's live
    * files; unset means pure per-commit tailing from `startVersion`.
    * Resolved once, persisted at `metadataPath/0`, re-read ever after —
    * the head moving between a crash and the restart must not move the
    * stream's origin.
    */
  private val (startVersion: Long, snapshotStart: Boolean) = {
    val fs = new Path(metadataPath).getFileSystem(
      spark.sessionState.newHadoopConf())
    val marker = new Path(metadataPath, "0")
    def read(): Option[(Long, Boolean)] =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        val n = try ActionCodec.mapper.readTree(in) finally in.close()
        Some((n.get("startVersion").asLong, n.get("snapshotStart").asBoolean))
      }
    read().getOrElse {
      val resolved = parameters.get("startingVersion") match {
        case None =>
          (DeltaLog.forPath(spark, path).version, true)
        case Some("latest") =>
          (DeltaLog.forPath(spark, path).version + 1, false)
        case Some(v) =>
          val n = v.toLong
          require(n >= 0, s"startingVersion must be >= 0 or 'latest', got $v")
          (n, false)
      }
      fs.mkdirs(new Path(metadataPath))
      try {
        val out = fs.create(marker, false)
        try out.write(
          s"""{"startVersion":${resolved._1},"snapshotStart":${resolved._2}}"""
            .getBytes("UTF-8"))
        finally out.close()
        resolved
      } catch {
        // lost a concurrent-create race (driver restart mid-write):
        // the surviving marker wins
        case _: java.io.IOException => read().getOrElse(resolved)
      }
    }
  }

  private val initialPos = GraftDeltaSourceOffset(startVersion, 0L)

  /** Schema the stream declared at start — every batch is emitted in it. */
  override val schema: StructType = {
    val snap = DeltaLog.forPath(spark, path)
    snap.checkProtocolSupported()
    snap.schema
  }
  private val declaredCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
    schema.fields.toSeq.map(f => (f.name, f.dataType))

  /** One snapshot walked forward with the stream — O(1) commit reads per
    * version in steady state; rebuilt (checkpoint-aware) only when a
    * restart asks for an older version.
    */
  private var cursor: DeltaSnapshot = _

  private def snapshotAt(v: Long): DeltaSnapshot = {
    if (cursor == null || cursor.version > v)
      cursor = DeltaLog.forPath(spark, path, Some(v))
    else if (cursor.version < v) cursor.updateIncremental(Some(v))
    cursor
  }

  /** Per-version consumable file lists (metadata only; evicted below the
    * committed offset). MUST be deterministic across JVMs — sorted by
    * path — because offsets index into it.
    */
  private val addsCache = mutable.Map.empty[Long, IndexedSeq[AddAction]]

  private def addsFor(v: Long): IndexedSeq[AddAction] =
    addsCache.getOrElseUpdate(v, {
      if (snapshotStart && v == startVersion)
        snapshotAt(v).liveFiles.sortBy(_.path).toIndexedSeq
      else {
        val liveBefore: Set[String] =
          if (v == 0) Set.empty
          else snapshotAt(v - 1).liveFiles.iterator.map(_.path).toSet
        val lines = DeltaLog.readCommitJson(spark, path, v).getOrElse(
          throw new java.io.FileNotFoundException(
            s"Commit $v of $path is missing (aged out past a checkpoint?); " +
              "the stream cannot replay it. Restart from a fresh checkpoint."))
        lines.iterator
          .flatMap(n => Option(n.get("add")).filterNot(_.isNull)
            .map(ActionCodec.parseAdd))
          .filter(a => a.dataChange && !liveBefore.contains(a.path))
          .toVector.sortBy(_.path)
      }
    })

  /** Newest commit version on disk — one directory listing, no replay. */
  private def headVersion(): Long = {
    val dir = new Path(path.stripSuffix("/") + "/_delta_log")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(dir), s"no Delta log under $path")
    fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.take(20).toLong)
      .foldLeft(-1L)(math.max)
  }

  private var lastOffset: GraftDeltaSourceOffset = _

  override def getOffset: Option[Offset] = {
    val from = Option(lastOffset).getOrElse(initialPos)
    val head = headVersion()
    var v = from.version
    var i = from.index
    var files = 0
    var bytes = 0L
    var full = false
    while (!full && v <= head) {
      val adds = addsFor(v)
      while (!full && i < adds.length) {
        val sz = adds(i.toInt).size
        // at least one file per batch, else limits wedge on a big file
        val admit = files == 0 ||
          (maxFiles.forall(files < _) && maxBytes.forall(bytes + sz <= _))
        if (admit) { files += 1; bytes += sz; i += 1 } else full = true
      }
      if (!full && i == adds.length && v < head) { v = v + 1; i = 0 }
      else if (i == adds.length) full = true
    }
    val pos = GraftDeltaSourceOffset(v, i)
    if (pos == from && Option(lastOffset).isEmpty) None
    else {
      if (lastOffset == null || lastOffset < pos) lastOffset = pos
      Some(lastOffset)
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endO = of(end)
    val startO = start.map(of).getOrElse(initialPos)
    if (lastOffset == null || lastOffset < endO) lastOffset = endO
    val frames = (startO.version to endO.version).flatMap { v =>
      val adds = addsFor(v)
      val lo = if (v == startO.version) startO.index.toInt else 0
      val hi = if (v == endO.version) endO.index.toInt else adds.length
      val slice = adds.slice(lo, hi)
      if (slice.isEmpty) None
      else {
        val snapV = snapshotAt(v)
        // older batches may predate columns added since (null-filled
        // below, by physical identity so renames stay aligned); a
        // column the DECLARED schema doesn't know is a post-start
        // evolution the sink can't hold — remapToHead would silently
        // DROP its data, so detect it on the schemas and fail with the
        // cure instead
        val declPhys = graft.delta.DeltaSchema
          .logicalToPhysical(schema).values.toSet
        val extra = graft.delta.DeltaSchema.logicalToPhysical(snapV.schema)
          .filterNot { case (_, p) => declPhys.contains(p) }
        if (extra.nonEmpty)
          throw new IllegalStateException(
            s"schema of $path changed during streaming: version $v carries " +
              s"column(s) ${extra.keys.mkString(", ")} the stream's declared " +
              "schema does not; restart the query to pick up the new schema")
        val paths = slice.iterator.map(_.path).toSet
        val df = CdfEngine.remapToHead(
          DeltaScan.scanSnapshot(snapV,
            ScanSettings(actionFilter = a => paths.contains(a.path))),
          snapV.schema, schema)
        val have = df.columns.toSet
        Some(df.select(declaredCols.map { case (n, dt) =>
          if (have.contains(n)) col(n) else lit(null).cast(dt).as(n)
        }: _*))
      }
    }
    frames.reduceOption(_ unionByName _)
      .map(StreamingBridge.asStreaming)
      .getOrElse(StreamingBridge.emptyStreaming(spark, schema))
  }

  override def commit(end: Offset): Unit = {
    val e = of(end)
    addsCache.keys.filter(_ < e.version).toSeq.foreach(addsCache.remove)
  }

  override def stop(): Unit = ()
}
