package graft.streaming

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.StreamingBridge
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

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
  private[graft] def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta requires a table path: readStream.format(\"graft-delta\").load(path)"))

  /** The change-feed declared schema — table columns plus the feed
    * metadata columns — and its reserved-name rule, in ONE place: the
    * provider's `sourceSchema` and the source's own `schema` must agree
    * field-for-field or every batch fails the engine's output-arity
    * assertion.
    */
  private[graft] def withCdfColumns(table: StructType): StructType = {
    val reserved = Seq(CdfEngine.ChangeTypeCol, "_commit_version")
    require(!table.fieldNames.exists(reserved.contains),
      s"readChangeFeed reserves column names ${reserved.mkString(", ")}")
    StructType(table.fields :+
      StructField(CdfEngine.ChangeTypeCol, StringType) :+
      StructField("_commit_version", LongType))
  }
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
  *  - `readChangeFeed=true`: emit the change feed (`_change_type`,
  *    `_commit_version`) instead of added rows — see the field doc
  *    below for the per-commit admission contract.
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
    parameters: Map[String, String])
  extends Source with SupportsTriggerAvailableNow {

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

  /** Change-data-feed mode (`readChangeFeed=true`): batches carry the
    * per-commit CHANGES (`_change_type` insert/delete — stored cdc
    * files preferred, DV diffs derived — plus `_commit_version`)
    * instead of the added files, through the same [[CdfEngine]] the
    * batch CDF uses. Admission is per COMMIT (a commit's change set is
    * atomic — splitting it would publish half an UPDATE), so
    * `maxFilesPerTrigger` bounds commits per batch and
    * `maxBytesPerTrigger` weighs each commit by its change-file bytes.
    * Without `startingVersion`, the initial snapshot arrives as one
    * batch of `insert` rows stamped with the snapshot version —
    * delta-spark's CDF-stream default.
    */
  private val readChangeFeed: Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  /** Logical TABLE schema pinned at start (at `declaredAtVersion`);
    * every batch's data columns are emitted in it. */
  private val (tableSchema: StructType, declaredAtVersion: Long) = {
    val snap = DeltaLog.forPath(spark, path)
    snap.checkProtocolSupported()
    if (readChangeFeed) GraftDeltaSource.withCdfColumns(snap.schema)
    (snap.schema, snap.version)
  }

  /** The stream's declared schema: the table schema, plus the feed
    * metadata columns in readChangeFeed mode. */
  override val schema: StructType =
    if (!readChangeFeed) tableSchema
    else GraftDeltaSource.withCdfColumns(tableSchema)

  private val declaredCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
    tableSchema.fields.toSeq.map(f => (f.name, f.dataType))

  /** Advance (or rebuild, checkpoint-aware) a snapshot to EXACTLY `v`.
    * `updateIncremental` stops SILENTLY at a missing commit file (aged
    * out past a checkpoint while the stream lagged); scanning a lower
    * version with version v's actionFilter would then emit an empty
    * batch and commit the offset PAST real data — fail loudly with the
    * cure instead.
    */
  private def advanced(cur: DeltaSnapshot, v: Long): DeltaSnapshot = {
    val snap =
      if (cur == null || cur.version > v) DeltaLog.forPath(spark, path, Some(v))
      else {
        if (cur.version < v) cur.updateIncremental(Some(v))
        cur
      }
    if (snap.version != v)
      throw new java.io.FileNotFoundException(
        s"Commit $v of $path is missing (aged out past a checkpoint?); " +
          s"log replay stopped at version ${snap.version}. The stream " +
          "cannot replay it; restart from a fresh checkpoint.")
    snap
  }

  /** TWO independently-advanced snapshots, each O(1) commit reads per
    * version in steady state: the WALK cursor serves [[addsFor]]'s
    * pre-commit live maps (getOffset runs it ahead to the admission
    * horizon), the SCAN cursor serves [[getBatch]]'s per-version scans.
    * One shared cursor would rebuild from scratch every multi-version
    * batch — getOffset leaves it at the horizon, getBatch asks for the
    * range start, and `cursor.version > v` forces a full replay.
    */
  private var walkCursor: DeltaSnapshot = _
  private var scanCursor: DeltaSnapshot = _

  private def walkAt(v: Long): DeltaSnapshot = {
    walkCursor = advanced(walkCursor, v); walkCursor
  }

  private def scanAt(v: Long): DeltaSnapshot = {
    scanCursor = advanced(scanCursor, v); scanCursor
  }

  /** Per-version consumable file lists (metadata only; evicted below the
    * committed offset). MUST be deterministic across JVMs — sorted by
    * path — because offsets index into it.
    */
  private val addsCache = mutable.Map.empty[Long, IndexedSeq[AddAction]]

  /** CDF mode: one [[CdfEngine.CommitSpec]] per version, computed
    * against the PRE-commit live map (populated together with
    * [[addsCache]], evicted together on commit). */
  private val cdfSpecs = mutable.Map.empty[Long, CdfEngine.CommitSpec]

  /** One synthetic whole-commit admission unit (CDF mode): a commit's
    * change set is consumed atomically, weighted by its change bytes.
    */
  private def commitUnit(v: Long, bytes: Long,
      nonEmpty: Boolean): IndexedSeq[AddAction] =
    if (!nonEmpty) Vector.empty
    else Vector(AddAction(s"__graft_cdf_commit_$v", Map.empty, bytes, 0L, None))

  private def commitLines(v: Long): Seq[com.fasterxml.jackson.databind.JsonNode] =
    DeltaLog.readCommitJson(spark, path, v).getOrElse(
      throw new java.io.FileNotFoundException(
        s"Commit $v of $path is missing (aged out past a checkpoint?); " +
          "the stream cannot replay it. Restart from a fresh checkpoint."))

  private def addsFor(v: Long): IndexedSeq[AddAction] =
    addsCache.getOrElseUpdate(v, {
      if (snapshotStart && v == startVersion) {
        val live = walkAt(v).liveFiles.sortBy(_.path).toIndexedSeq
        if (!readChangeFeed) live
        else commitUnit(v, live.iterator.map(_.size).sum, live.nonEmpty)
      } else if (!readChangeFeed) {
        val liveBefore: Set[String] =
          if (v == 0) Set.empty
          else walkAt(v - 1).liveFiles.iterator.map(_.path).toSet
        commitLines(v).iterator
          .flatMap(n => Option(n.get("add")).filterNot(_.isNull)
            .map(ActionCodec.parseAdd))
          .filter(a => a.dataChange && !liveBefore.contains(a.path))
          .toVector.sortBy(_.path)
      } else {
        val prior: Map[String, AddAction] =
          if (v == 0) Map.empty
          else walkAt(v - 1).liveFiles.iterator.map(a => a.path -> a).toMap
        val lines = commitLines(v)
        val spec = CdfEngine.spec(spark, path.stripSuffix("/"), prior, lines)
        cdfSpecs(v) = spec
        // stored cdc files are the EXCLUSIVE change data when present
        // (CdfEngine protocol rule) — weighing the commit's adds too
        // would double-count and halve admission throughput
        val bytes =
          if (spec.stored.nonEmpty) spec.stored.iterator.map(_.size).sum
          else lines.iterator
            .flatMap(n => Option(n.get("add")).filterNot(_.isNull)
              .map(ActionCodec.parseAdd))
            .filter(_.dataChange).map(_.size).sum
        commitUnit(v, bytes, !spec.isEmpty)
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

  /** Walk forward from `from`, admitting files (or, in CDF mode, whole
    * commits) under the limits, up to `cap` (the AvailableNow horizon)
    * and the current head. At least one unit always admits, else a
    * single oversized file would wedge the stream.
    */
  private def advance(from: GraftDeltaSourceOffset,
      limFiles: Option[Int], limBytes: Option[Long],
      cap: Option[GraftDeltaSourceOffset]): GraftDeltaSourceOffset = {
    val head = cap.map(_.version).map(math.min(_, headVersion()))
      .getOrElse(headVersion())
    var v = from.version
    var i = from.index
    var files = 0
    var bytes = 0L
    var full = false
    while (!full && v <= head) {
      val adds = addsFor(v)
      val len = cap match {
        case Some(c) if c.version == v => math.min(adds.length.toLong, c.index)
        case _ => adds.length.toLong
      }
      while (!full && i < len) {
        val sz = adds(i.toInt).size
        val admit = files == 0 ||
          (limFiles.forall(files < _) && limBytes.forall(bytes + sz <= _))
        if (admit) { files += 1; bytes += sz; i += 1 } else full = true
      }
      if (!full && i >= len && v < head) { v = v + 1; i = 0 }
      else if (i >= len) full = true
    }
    GraftDeltaSourceOffset(v, i)
  }

  /** Legacy V1 entry point. MicroBatchExecution prefers the
    * SupportsAdmissionControl path below (which receives the REAL start
    * offset, surviving restarts); this remains only for callers driving
    * the Source contract directly.
    */
  override def getOffset: Option[Offset] = {
    val from = Option(lastOffset).getOrElse(initialPos)
    val pos = advance(from, maxFiles, maxBytes, None)
    if (pos == from && Option(lastOffset).isEmpty) None
    else {
      if (lastOffset == null || lastOffset < pos) lastOffset = pos
      Some(lastOffset)
    }
  }

  /** Admission-control path (the one `MicroBatchExecution` actually
    * uses): `start` is the engine's restored position — rate-limited
    * admission can never regress below a committed offset after a
    * restart, which the in-memory `getOffset` path could.
    */
  override def getDefaultReadLimit: ReadLimit = {
    val ls = (maxFiles.map(n => ReadLimit.maxFiles(n)).toSeq ++
      maxBytes.map(n => ReadLimit.maxBytes(n))).toArray
    ls.length match {
      case 0 => ReadLimit.allAvailable()
      case 1 => ls.head
      case _ => ReadLimit.compositeLimit(ls)
    }
  }

  private def limitsOf(limit: ReadLimit): (Option[Int], Option[Long]) =
    limit match {
      case c: CompositeReadLimit =>
        val parts = c.getReadLimits.toSeq.map(limitsOf)
        (parts.flatMap(_._1).minOption, parts.flatMap(_._2).minOption)
      case f: ReadMaxFiles => (Some(f.maxFiles()), None)
      case b: ReadMaxBytes => (None, Some(b.maxBytes()))
      case _ => (None, None) // allAvailable / unknown shapes: no cap
    }

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(start)
      .map(o => of(o.asInstanceOf[Offset]))
      .getOrElse(initialPos)
    val (limF, limB) = limitsOf(limit)
    val pos = advance(from, limF, limB, availableNowCap)
    if (lastOffset == null || lastOffset < pos) lastOffset = pos
    if (pos == from && Option(start).isEmpty) null else pos
  }

  /** Trigger.AvailableNow: pin the horizon once; every subsequent
    * rate-limited batch advances toward it and the query terminates
    * there — without this, the AvailableNow wrapper would capture ONE
    * rate-limited step and stop with data left unread.
    */
  private var availableNowCap: Option[GraftDeltaSourceOffset] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val h = headVersion()
    availableNowCap = Some(
      if (h < startVersion) initialPos
      else GraftDeltaSourceOffset(h, addsFor(h).length.toLong))
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
      else if (!readChangeFeed) {
        val snapV = scanAt(v)
        schemaGuard(v, snapV)
        val paths = slice.iterator.map(_.path).toSet
        val df = CdfEngine.remapToHead(
          DeltaScan.scanSnapshot(snapV,
            ScanSettings(actionFilter = a => paths.contains(a.path))),
          snapV.schema, tableSchema)
        Some(alignDeclared(df))
      } else {
        // the spec (when one exists) was computed by addsFor against
        // the PRE-commit live map, BEFORE the walk cursor passes v-1
        val snapV = scanAt(v)
        schemaGuard(v, snapV)
        val raw =
          if (snapshotStart && v == startVersion)
            Some(DeltaScan.scanSnapshot(snapV)
              .withColumn(CdfEngine.ChangeTypeCol, lit("insert")))
          else cdfSpecs.get(v).flatMap(s => CdfEngine.materialize(snapV, s))
        raw.map { df0 =>
          val df = alignDeclared(
            CdfEngine.remapToHead(df0, snapV.schema, tableSchema),
            keep = Seq(CdfEngine.ChangeTypeCol))
          df.withColumn("_commit_version", lit(v))
        }
      }
    }
    frames.reduceOption(_ unionByName _)
      .map(StreamingBridge.asStreaming)
      .getOrElse(StreamingBridge.emptyStreaming(spark, schema))
  }

  /** Older batches may predate columns added since (null-filled by
    * [[alignDeclared]], by physical identity so renames stay aligned);
    * a column the DECLARED schema doesn't know is a post-start
    * evolution the sink can't hold — remapToHead would silently DROP
    * its data, so detect it on the schemas and fail with the cure.
    */
  private def schemaGuard(v: Long, snapV: DeltaSnapshot): Unit = {
    // only versions AFTER the declared schema was pinned can carry a
    // genuine post-start evolution; an extra column in an OLDER version
    // was dropped before the stream started — remapToHead discarding it
    // is correct (the table's current schema no longer has it), and
    // throwing would wedge every startingVersion replay crossing a DROP
    // (restart re-pins the same head schema and throws again)
    if (v <= declaredAtVersion) return
    val declPhys = graft.delta.DeltaSchema
      .logicalToPhysical(tableSchema).values.toSet
    val extra = graft.delta.DeltaSchema.logicalToPhysical(snapV.schema)
      .filterNot { case (_, p) => declPhys.contains(p) }
    if (extra.nonEmpty)
      throw new IllegalStateException(
        s"schema of $path changed during streaming: version $v carries " +
          s"column(s) ${extra.keys.mkString(", ")} the stream's declared " +
          "schema does not; restart the query to pick up the new schema")
  }

  /** Project onto the declared table columns (null-filling what the
    * batch predates), carrying `keep` metadata columns through. */
  private def alignDeclared(df: DataFrame,
      keep: Seq[String] = Nil): DataFrame = {
    val have = df.columns.toSet
    df.select(declaredCols.map { case (n, dt) =>
      if (have.contains(n)) col(n) else lit(null).cast(dt).as(n)
    } ++ keep.map(col): _*)
  }

  override def commit(end: Offset): Unit = {
    val e = of(end)
    addsCache.keys.filter(_ < e.version).toSeq.foreach(addsCache.remove)
    cdfSpecs.keys.filter(_ < e.version).toSeq.foreach(cdfSpecs.remove)
  }

  override def stop(): Unit = ()
}
