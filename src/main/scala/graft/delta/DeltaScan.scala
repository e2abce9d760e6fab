package graft.delta

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Scan options — the union of the reference's `PolarsSettings` +
  * scan keyword args (polars.py:42-69,361-378; duckdb.py:374-394).
  */
final case class ScanSettings(
    conditions: Seq[Cond] = Nil,
    fields: Option[Seq[String]] = None,
    excludeFields: Seq[String] = Nil,
    distinct: Boolean = false,
    limit: Option[Long] = None,
    version: Option[Long] = None,
    /** Timestamp time travel: scan the greatest version committed at or
      * before this instant (ignored when `version` is set).
      */
    timestampAsOf: Option[java.time.Instant] = None,
    actionFilter: AddAction => Boolean = _ => true,
    /** Target type overrides for timestamp columns — the reference's
      * `PolarsSettings.timestamp_type` / `timestamp_ntz_type`
      * (polars.py:42-69): e.g. read all TIMESTAMP columns as
      * TIMESTAMP_NTZ (or as StringType for export). Applied as a final
      * cast over the logical schema.
      */
    timestampType: Option[DataType] = None,
    timestampNtzType: Option[DataType] = None,
    /** Scan-shape dispatch. Any value > 0 (the default) takes the
      * Catalyst-native DeltaFileIndex path — ONE FileSourceScanExec with
      * planner-side partition pruning, O(1) plan regardless of partition
      * count, deletion vectors subtracted via `_metadata.row_index` over
      * the same single scan. 0 forces the legacy shape (escape hatch /
      * its specs): one multi-path scan joined (broadcast) with a
      * file→partition-values map.
      */
    wideUnionThreshold: Int = 64)

/** Compile a Delta snapshot into a Spark `DataFrame` — the engine's core.
  *
  * Per-file work (the reference's per-file SELECT list,
  * duckdb.py:450-522 / polars.py:444-550) collapses in Spark to three
  * moves:
  *
  *  1. read the parquet with an explicit *physical* schema
  *     (`spark.read.schema(phys)`): Spark matches nested fields by name
  *     against the footer and null-fills anything missing — schema
  *     evolution (P4) for free, no per-file footer probe needed;
  *  2. one `Cast` per top-level column back to the *logical* type:
  *     struct/array/map casts rename nested fields positionally, preserve
  *     NULL structs (no struct-of-NULLs regression) and absorb type
  *     widening — P1/P3/P5 in a single codegen'd expression;
  *  3. typed literals for partition columns (P2), constant per file group.
  *
  * The default plan shape is a single `FileSourceScanExec` through
  * [[DeltaFileIndex]] regardless of file or partition count (SURVEY §7
  * risk register: union width) — partition values typed by the index,
  * deletion vectors subtracted by row index over the same scan node.
  * Pruning (partition values + stats zone maps + limit) happens
  * driver-side AND planner-side (the index re-prunes cached frames).
  */
object DeltaScan {

  def scan(spark: SparkSession, path: String,
      settings: ScanSettings = ScanSettings()): DataFrame = {
    val v = settings.version.orElse(settings.timestampAsOf.map(t =>
      DeltaLog.versionAtTimestamp(spark, path, t)))
    val snap = DeltaLog.forPath(spark, path, v)
    scanSnapshot(snap, settings)
  }

  def scanSnapshot(snap: DeltaSnapshot,
      settings: ScanSettings = ScanSettings()): DataFrame = {
    val spark = snap.spark
    snap.checkProtocolSupported()
    val schema = snap.schema
    val partCols = snap.partitionColumns.toSet

    // column pruning pushed into the per-file projection (P6), while
    // partition/stat pruning may still reference any column
    val projected: Seq[StructField] = settings.fields match {
      case Some(fs) =>
        val want = fs.toSet
        schema.fields.toSeq.filter(f => want.contains(f.name))
      case None =>
        schema.fields.toSeq.filterNot(f => settings.excludeFields.contains(f.name))
    }

    // data filters may reference columns outside the projection
    // (pruning "may still reference any column"): read them too, filter,
    // then drop them in the final select
    val condCols = settings.conditions.map(_.column).toSet
    val readFields: Seq[StructField] = projected ++
      schema.fields.toSeq.filter(f =>
        condCols.contains(f.name) && !projected.exists(_.name == f.name))

    val dataFields = readFields.filterNot(f => partCols.contains(f.name))
    val physReadSchema = DeltaSchema.physicalize(StructType(dataFields))

    val actions = snap.addActionsFiltered(
      settings.conditions, settings.limit, settings.actionFilter)

    val base = snap.deltaPath.stripSuffix("/")

    val logToPhys = DeltaSchema.logicalToPhysical(schema)
    def dataProjection(f: StructField): Column = {
      val phys = DeltaSchema.physicalName(f)
      // cast target is nullability-relaxed: the file relation reports
      // everything nullable, and Cast refuses nullable→non-nullable
      col(s"`${phys.replace("`", "``")}`").cast(relax(f.dataType)).as(f.name)
    }

    // resolved partition tuple per file (keyed by physical name),
    // tolerant of legacy `partition.<name>` key shapes — and the
    // grouping key, so files whose values live under different key
    // shapes but agree in value still share one scan branch
    val partFields: Seq[StructField] =
      schema.fields.toSeq.filter(f => partCols.contains(f.name))
    def resolvedPv(a: AddAction): Map[String, Option[String]] =
      partFields.map { f =>
        val phys = logToPhys.getOrElse(f.name, f.name)
        phys -> a.partitionValueFor(phys, f.name).flatten
      }.toMap

    // deletion vectors: the scan additionally carries the physical
    // row index + normalized file key, and deleted (file, index) pairs —
    // expanded from the compact bitmaps on EXECUTORS — are subtracted
    // with one anti-join after the union
    val dvActions = actions.filter(_.hasDeletionVector)
    val fileKey = "__graft_file"
    val riKey = "__graft_row_index"
    // file key from `_metadata.file_path`, NOT input_file_name(): the
    // metadata column is a deterministic attribute, while a
    // nondeterministic expression anywhere in the projection would stop
    // Catalyst pushing partition predicates through it — silently
    // disabling planner-side pruning on every DV table
    def dvCols(scanDf: DataFrame): Seq[Column] =
      if (dvActions.isEmpty) Nil
      else Seq(normalizeFileKey(scanDf.col("_metadata.file_path")).as(fileKey),
        scanDf.col("_metadata.row_index").as(riKey))

    val df =
      if (actions.isEmpty) emptyTyped(spark, StructType(readFields))
      else if (settings.wideUnionThreshold > 0) {
        // Catalyst-native path (the default): a DeltaFileIndex hands the
        // planner the file list, typed partition values, and log-derived
        // size — ONE FileSourceScanExec whatever the partition count,
        // partition pruning re-evaluated by Catalyst per query (cached
        // DataFrames re-prune under new predicates), stats skipping on
        // the pushed data filters inside the index. Deletion-vector
        // tables ride the same path: `_metadata.row_index` is served by
        // the file source, so the scan carries the row-index/file-key
        // pair and the anti-join below subtracts deleted rows — still
        // ONE scan node. The union/broadcast shapes below remain only
        // as the wideUnionThreshold=0 escape hatch (and its specs).
        val index = new DeltaFileIndex(snap, actions)
        val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
          index, partitionSchema = index.partitionSchema,
          dataSchema = physReadSchema, bucketSpec = None,
          fileFormat =
            new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
          options = Map.empty)(spark)
        val scan = spark.baseRelationToDataFrame(relation)
        scan.select(readFields.map { f =>
          if (partCols.contains(f.name)) {
            val phys = logToPhys.getOrElse(f.name, f.name)
            // typed by the index already: alias-only, so partition
            // predicates stay recognizable to PruneFileSourcePartitions
            col(s"`${phys.replace("`", "``")}`").as(f.name)
          } else dataProjection(f)
        } ++ dvCols(scan): _*)
      } else {
        // legacy shape (wideUnionThreshold=0 escape hatch): ONE
        // multi-path scan for every file, and partition values delivered
        // by a broadcast join on the file name — constant-size plan
        // regardless of partition count
        val hconf = spark.sessionState.newHadoopConf()
        val paths = actions.map(a => resolvePath(base, a.path))
        val scan0 = spark.read.schema(physReadSchema).parquet(paths: _*)
        val scan = (if (dvActions.isEmpty) scan0
          else scan0.withColumn(riKey, scan0.col("_metadata.row_index")))
          .withColumn(fileKey, normalizeFileKey(input_file_name()))

        val partFields = readFields.filter(f => partCols.contains(f.name))
        val pvSchema = StructType(
          StructField(fileKey, org.apache.spark.sql.types.StringType,
            nullable = false) +: partFields)
        val rows = actions.map { a =>
          // join key = decoded, scheme/authority-free path — the same
          // normalization normalizeFileKey applies to input_file_name()
          val p = new org.apache.hadoop.fs.Path(resolvePath(base, a.path))
          val uri = p.getFileSystem(hconf).makeQualified(p).toUri.getPath
          val pv = resolvedPv(a)
          Row.fromSeq(uri +: partFields.map { f =>
            val phys = logToPhys.getOrElse(f.name, f.name)
            pv.getOrElse(phys, None)
              .map(v => toJavaSql(PartitionValues.deserialize(v, f.dataType), f))
              .orNull
          })
        }
        val pvDf = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), pvSchema)
        val keep: Seq[Column] =
          if (dvActions.isEmpty) Nil else Seq(col(fileKey), col(riKey))
        scan.join(broadcast(pvDf), Seq(fileKey))
          .select(readFields.map { f =>
            if (partCols.contains(f.name)) col(s"`${f.name.replace("`", "``")}`")
            else dataProjection(f)
          } ++ keep: _*)
      }

    // subtract deleted rows: compact bitmap bytes ship to executors (one
    // row per DV file), expansion to (file, row index) happens there,
    // then one anti-join — broadcast while the total deleted-row count is
    // broadcastable, shuffled beyond that
    val undeleted =
      if (dvActions.isEmpty || actions.isEmpty) df
      else {
        val hconf = spark.sessionState.newHadoopConf()
        val dvRows: Seq[(String, Array[Byte])] = dvActions.map { a =>
          val p = new org.apache.hadoop.fs.Path(resolvePath(base, a.path))
          val uri = p.getFileSystem(hconf).makeQualified(p).toUri.getPath
          uri -> DeletionVectors.read(spark, base, a.deletionVector.get)
        }
        import spark.implicits._
        val deleted = spark.createDataset(dvRows)
          .flatMap { case (f, data) =>
            DeletionVectors.deserializeData(data).iterator.map(i => (f, i)) }
          .toDF(fileKey, riKey)
        val totalDeleted = dvActions.flatMap(_.deletionVector).map(_.cardinality).sum
        val build = if (totalDeleted <= 5000000L) broadcast(deleted) else deleted
        df.join(build, Seq(fileKey, riKey), "left_anti")
          .drop(fileKey, riKey)
      }

    val filtered0 =
      if (settings.conditions.nonEmpty)
        undeleted.where(Cond.compile(settings.conditions, Some(schema)))
      else undeleted
    val narrowed =
      if (readFields.lengthCompare(projected.size) == 0) filtered0
      else filtered0.select(projected.map(f =>
        col(s"`${f.name.replace("`", "``")}`")): _*)

    val retyped =
      if (settings.timestampType.isEmpty && settings.timestampNtzType.isEmpty) narrowed
      else narrowed.select(projected.map { f =>
        val target = f.dataType match {
          case org.apache.spark.sql.types.TimestampType => settings.timestampType
          case org.apache.spark.sql.types.TimestampNTZType => settings.timestampNtzType
          case _ => None
        }
        val c = col(s"`${f.name.replace("`", "``")}`")
        target.fold(c)(t => c.cast(t).as(f.name))
      }: _*)

    val distinct = if (settings.distinct) retyped.distinct() else retyped
    settings.limit.fold(distinct)(n =>
      if (n >= Int.MaxValue) distinct // file-level pruning already applied
      else distinct.limit(n.toInt))
  }

  /** Logical scan of specific files that ALSO exposes `__graft_file`
    * (normalized path) and `__graft_row_index` (physical row position) —
    * DeltaWriter.delete's predicate pass. One multi-path scan branch per
    * partition group, like the main union path; existing deletion
    * vectors are NOT applied (delete must see all physical rows to merge
    * bitmaps).
    */
  private[graft] def scanWithRowIndex(
      snap: DeltaSnapshot, actions: Seq[AddAction],
      /** Physical columns read AS-IS beyond the table schema (absent in
        * a file ⇒ null-filled) — the materialized row-tracking columns.
        */
      extraPhysical: Seq[StructField] = Nil): DataFrame = {
    val spark = snap.spark
    val schema = snap.schema
    val partCols = snap.partitionColumns.toSet
    val logToPhys = DeltaSchema.logicalToPhysical(schema)
    val dataFields = schema.fields.toSeq.filterNot(f => partCols.contains(f.name))
    val physReadSchema = StructType(
      DeltaSchema.physicalize(StructType(dataFields)).fields ++ extraPhysical)
    val base = snap.deltaPath.stripSuffix("/")
    val partFields = schema.fields.toSeq.filter(f => partCols.contains(f.name))
    def pvOf(a: AddAction): Seq[Option[String]] = partFields.map { f =>
      val phys = logToPhys.getOrElse(f.name, f.name)
      a.partitionValueFor(phys, f.name).flatten
    }
    val branches = actions.groupBy(pvOf).toSeq.map { case (pv, as) =>
      val scan = spark.read.schema(physReadSchema)
        .parquet(as.map(a => resolvePath(base, a.path)): _*)
      val proj = schema.fields.toSeq.map { f =>
        if (partCols.contains(f.name))
          PartitionValues.toLiteral(pv(partFields.indexWhere(_.name == f.name)), f)
        else {
          val phys = DeltaSchema.physicalName(f)
          col(s"`${phys.replace("`", "``")}`").cast(relax(f.dataType)).as(f.name)
        }
      }
      scan.select(proj ++
        extraPhysical.map(f => col(s"`${f.name.replace("`", "``")}`")) ++ Seq(
        normalizeFileKey(input_file_name()).as("__graft_file"),
        scan.col("_metadata.row_index").as("__graft_row_index")): _*)
    }
    branches.reduce(_.unionByName(_))
  }

  /** Scan with STABLE ROW IDS (PROTOCOL.md#row-tracking): the logical
    * table columns plus `_row_id` and `_row_commit_version`, each
    * `coalesce(materialized column, baseRowId + physical row index)` /
    * `coalesce(materialized, defaultRowCommitVersion)` — the protocol's
    * resolution order, so ids survive OPTIMIZE rewrites (which
    * materialize them) and DV DML (which never moves surviving rows).
    * Deletion vectors are applied; files without row-tracking fields
    * yield null ids (tracking was suspended when they were written).
    */
  private[graft] def scanWithStableIds(snap: DeltaSnapshot): DataFrame = {
    val spark = snap.spark
    snap.checkProtocolSupported()
    val schema = snap.schema
    val base = snap.deltaPath.stripSuffix("/")
    val actions = snap.liveFiles
    val idT = org.apache.spark.sql.types.LongType
    if (actions.isEmpty)
      return emptyTyped(spark, StructType(schema.fields ++ Seq(
        StructField("_row_id", idT), StructField("_row_commit_version", idT))))
    val matId = snap.configuration.get(DeltaWriter.MatRowIdKey)
    val matVer = snap.configuration.get(DeltaWriter.MatRowVersionKey)
    val extra = (matId.toSeq ++ matVer.toSeq).map(StructField(_, idT))
    def q(n: String) = col(s"`${n.replace("`", "``")}`")
    val scan = scanWithRowIndex(snap, actions, extra)
    import spark.implicits._
    val info = actions.map(a => (fileUri(spark, base, a),
      a.baseRowId, a.defaultRowCommitVersion))
      .toDF("__graft_file", "__graft_base", "__graft_dver")
    val joined = scan.join(broadcast(info), Seq("__graft_file"))
    val dvActions = actions.filter(_.hasDeletionVector)
    val undeleted =
      if (dvActions.isEmpty) joined
      else {
        val dvRows = dvActions.map(a => fileUri(spark, base, a) ->
          DeletionVectors.read(spark, base, a.deletionVector.get))
        val deleted = spark.createDataset(dvRows)
          .flatMap { case (f, data) =>
            DeletionVectors.deserializeData(data).iterator.map(i => (f, i)) }
          .toDF("__graft_file", "__graft_row_index")
        val total = dvActions.flatMap(_.deletionVector).map(_.cardinality).sum
        val build = if (total <= 5000000L) broadcast(deleted) else deleted
        joined.join(build,
          Seq("__graft_file", "__graft_row_index"), "left_anti")
      }
    import org.apache.spark.sql.functions.coalesce
    val rowId = coalesce((matId.map(q).toSeq :+
      (col("__graft_base") + col("__graft_row_index"))): _*).as("_row_id")
    val rowVer = coalesce((matVer.map(q).toSeq :+
      col("__graft_dver")): _*).as("_row_commit_version")
    undeleted.select(
      schema.fields.toSeq.map(f => q(f.name)) ++ Seq(rowId, rowVer): _*)
  }

  /** The normalized file key [[scanWithRowIndex]] and the DV anti-join
    * use for a given action — drive-side twin of normalizeFileKey.
    */
  private[graft] def fileUri(
      spark: SparkSession, base: String, a: AddAction): String = {
    val p = new org.apache.hadoop.fs.Path(resolvePath(base, a.path))
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(p).toUri.getPath
  }

  /** Zero live files ⇒ typed empty relation with the full logical schema
    * (duckdb.py:523-528, polars.py:551-558).
    */
  private def emptyTyped(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Deep nullability relaxation (every field/element/value nullable). */
  private[delta] def relax(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, relax(f.dataType), nullable = true, f.metadata)))
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      org.apache.spark.sql.types.ArrayType(relax(et), containsNull = true)
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      org.apache.spark.sql.types.MapType(relax(k), relax(v), valueContainsNull = true)
    case other => other
  }

  /** input_file_name() yields a percent-encoded URI (`file:///…`);
    * reduce it to the decoded path component to match the driver-built
    * keys (scheme and authority dropped on both sides). `url_decode` is
    * FORM decoding — a literal '+' in the path (legal in file names and
    * partition values) would decode to a space and silently drop every
    * row of that file at the broadcast join; protect it first, exactly
    * as [[decodePath]] does.
    */
  private[delta] def normalizeFileKey(c: Column): Column =
    org.apache.spark.sql.functions.url_decode(
      org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.regexp_replace(
          c, "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", ""),
        "\\+", "%2B"))

  /** `createDataFrame` wants java.sql temporal types and scaled decimals. */
  private def toJavaSql(v: Any, f: StructField): Any = v match {
    case d: java.time.LocalDate => java.sql.Date.valueOf(d)
    case i: java.time.Instant => java.sql.Timestamp.from(i)
    case l: java.time.LocalDateTime =>
      if (f.dataType == org.apache.spark.sql.types.TimestampNTZType) l
      else java.sql.Timestamp.valueOf(l)
    case b: java.math.BigDecimal => f.dataType match {
      case dt: org.apache.spark.sql.types.DecimalType =>
        b.setScale(dt.scale, java.math.RoundingMode.UNNECESSARY)
      case _ => b
    }
    case other => other
  }

  /** add.path is percent-encoded in the log (spaces etc.). Percent-decode
    * ONLY — form decoding (URLDecoder) would corrupt literal '+' to a
    * space.
    */
  private[delta] def decodePath(p: String): String =
    java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")

  /** The protocol allows absolute add.path URIs (shallow clones /
    * external files); only relative paths get the table-root prefix.
    * Absolute URIs are percent-encoded like relative paths (delta-spark
    * convention), so the PATH component is decoded the same way —
    * leaving it raw would break any clone whose source has
    * hive-escaped partition directories (their names contain literal
    * '%XX' sequences that the writer re-encodes as '%25XX').
    *
    * A URI is anything opening with an RFC-3986 scheme and a slash —
    * BOTH authority ("file:///t/x", "s3a://bucket/x") and
    * empty-authority single-slash forms ("file:/t/x", what
    * `org.apache.hadoop.fs.Path.toString` emits for local paths): a
    * '://'-only test mistook the latter for a relative path and mangled
    * it to '<base>/file:/t/x'. A relative add.path can never false-match
    * — hive escaping percent-encodes ':' in directory names.
    */
  private val SchemeSlash =
    java.util.regex.Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*:/")

  private[delta] def resolvePath(base: String, rawPath: String): String =
    if (SchemeSlash.matcher(rawPath).find()) {
      val colon = rawPath.indexOf(':')
      val rest = rawPath.substring(colon + 1)
      if (rest.startsWith("//")) { // authority form: decode after it
        val j = rawPath.indexOf('/', colon + 3)
        if (j < 0) rawPath
        else rawPath.take(j) + decodePath(rawPath.substring(j))
      } else rawPath.take(colon + 1) + decodePath(rest)
    } else {
      val d = decodePath(rawPath)
      if (d.startsWith("/")) d else s"$base/$d"
    }
}
