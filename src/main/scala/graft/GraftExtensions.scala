package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.delta.ScanSettings
import graft.functions.{BloomMightContain, LshSignature, MinHashSig, NearestCentroid, OverlapCount, SigAgreeCount, SimHash64, StridedNgrams, TopTokenCount, VectorCosine, WordNgrams}

/** Spark-native integration point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) injects
  * the engine's codegen kernels into the session's FunctionRegistry at
  * build time, so plain `spark.sql` — including sessions created by
  * tooling that never touches graft's Scala API — can call
  * `simhash64`, `vector_cosine`, `nearest_centroid` and
  * `lsh_signature` directly. The per-call `register(spark)` helpers on
  * each kernel remain for ad-hoc use; this is the cluster-wide,
  * configuration-driven form.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name), builder)

  // builders come from each kernel's companion (the same ones
  // register() uses) so the two registration paths can never drift,
  // and arity errors carry the function name instead of a raw
  // IndexOutOfBoundsException
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("simhash64", classOf[SimHash64],
      SimHash64.builder))
    ext.injectFunction(fn("minhash_sig", classOf[MinHashSig],
      MinHashSig.builder))
    ext.injectFunction(fn("word_ngrams", classOf[WordNgrams],
      WordNgrams.builder))
    ext.injectFunction(fn("strided_ngrams", classOf[StridedNgrams],
      StridedNgrams.builder))
    ext.injectFunction(fn("overlap_count", classOf[OverlapCount],
      OverlapCount.builder))
    ext.injectFunction(fn("top_token_count", classOf[TopTokenCount],
      TopTokenCount.builder))
    ext.injectFunction(fn("sig_agree_count", classOf[SigAgreeCount],
      SigAgreeCount.builder))
    ext.injectFunction(fn("vector_cosine", classOf[VectorCosine],
      VectorCosine.builder))
    ext.injectFunction(fn("nearest_centroid", classOf[NearestCentroid],
      NearestCentroid.builder))
    ext.injectFunction(fn("lsh_signature", classOf[LshSignature],
      LshSignature.builder))
    ext.injectFunction(fn("bloom_might_contain", classOf[BloomMightContain],
      BloomMightContain.builder))
    // table-valued function: SELECT * FROM graft_delta('/path'[, version])
    // — the pure-SQL entry point to the optimized Delta scan (same
    // DeltaFileIndex single-scan plan as scanDelta: partition pruning,
    // stats skipping, DV subtraction, column-mapping rename all intact,
    // because the resolved plan is spliced in whole)
    ext.injectTableFunction((new FunctionIdentifier("graft_delta"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_delta"),
      GraftExtensions.deltaTableFunction))
    // SELECT * FROM graft_delta_cdf('/path', sinceVersion) — the change
    // feed as a table: window inserts with _change_type='insert',
    // DV retractions with 'delete' (scanDeltaChanges /
    // scanDeltaDeletedRows compose to the net state delta)
    ext.injectTableFunction((new FunctionIdentifier("graft_delta_cdf"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_delta_cdf"),
      GraftExtensions.cdfTableFunction))
    // SELECT * FROM graft_delta_row_ids('/path'[, version]) — the
    // stable-row-id scan (table columns + _row_id/_row_commit_version,
    // protocol resolution order) for pure-SQL sessions
    ext.injectTableFunction((new FunctionIdentifier("graft_delta_row_ids"),
      new ExpressionInfo(classOf[GraftExtensions].getName,
        "graft_delta_row_ids"),
      GraftExtensions.rowIdsTableFunction))
    // SELECT * FROM graft_delta_history('/path') — DESCRIBE HISTORY
    ext.injectTableFunction((new FunctionIdentifier("graft_delta_history"),
      new ExpressionInfo(classOf[GraftExtensions].getName,
        "graft_delta_history"),
      GraftExtensions.historyTableFunction))
    // Procedure-style MAINTENANCE/DDL verbs — the extension's stated
    // point is that a pure-SQL session can drive the whole surface, and
    // these were Scala-only. Each resolves to a [[graft.plans
    // .GraftProcedureNode]] whose side effect runs at EXECUTION time
    // (EXPLAIN plans without running; each execution performs exactly
    // one invocation); the result table reports what happened — the
    // same shape Iceberg's CALL procedures and delta-spark's SQL
    // commands report.
    // the physical side of the procedure nodes below
    ext.injectPlannerStrategy(_ => new graft.plans.GraftProcedureStrategy)
    // SQL time travel on catalog names (`FROM t VERSION AS OF 3`):
    // substituted at parse time — Spark's analyzer rejects V1 time
    // travel inside its built-in resolution rules, before any injected
    // resolution rule could fire
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    Seq(
      "graft_optimize" -> GraftExtensions.optimizeTableFunction,
      "graft_vacuum" -> GraftExtensions.vacuumTableFunction,
      "graft_rename_column" -> GraftExtensions.renameColumnTableFunction,
      "graft_drop_column" -> GraftExtensions.dropColumnTableFunction,
      "graft_restore" -> GraftExtensions.restoreTableFunction,
      "graft_add_column" -> GraftExtensions.addColumnTableFunction,
      "graft_reorg" -> GraftExtensions.reorgTableFunction,
      "graft_widen_column" -> GraftExtensions.widenColumnTableFunction,
      "graft_fsck" -> GraftExtensions.fsckTableFunction,
      "graft_set_tblproperties" -> GraftExtensions.setPropsTableFunction,
      "graft_unset_tblproperties" -> GraftExtensions.unsetPropsTableFunction,
      "graft_detail" -> GraftExtensions.detailTableFunction,
      "graft_convert" -> GraftExtensions.convertTableFunction,
      // DML verbs — with these, a pure-SQL session runs the FULL table
      // lifecycle (create via graft-delta writes or graft_convert, read
      // via graft_delta, then update/delete/merge/replaceWhere/clone),
      // closing the gap where SQL could ALTER and OPTIMIZE a table it
      // could not modify
      "graft_update" -> GraftExtensions.updateTableFunction,
      "graft_delete" -> GraftExtensions.deleteTableFunction,
      "graft_merge" -> GraftExtensions.mergeTableFunction,
      "graft_replace_where" -> GraftExtensions.replaceWhereTableFunction,
      "graft_clone" -> GraftExtensions.cloneTableFunction,
      "graft_add_constraint" -> GraftExtensions.addConstraintTableFunction,
      "graft_drop_constraint" -> GraftExtensions.dropConstraintTableFunction,
      "graft_set_default" -> GraftExtensions.setDefaultTableFunction,
      "graft_drop_default" -> GraftExtensions.dropDefaultTableFunction,
      "graft_cluster_by" -> GraftExtensions.clusterByTableFunction
    ).foreach { case (name, builder) =>
      ext.injectTableFunction((new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
  }
}

object GraftExtensions {

  /** Builder for the `graft_delta` table function: literal path +
    * optional time travel — an integral literal is a VERSION, a
    * TIMESTAMP literal (or parseable timestamp string) scans the
    * greatest version committed at or before that instant (ICT-aware).
    */
  private[graft] val deltaTableFunction
      : Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    args => {
      require(args.nonEmpty && args.size <= 2,
        "graft_delta(path[, versionOrTimestamp]) takes 1 or 2 arguments")
      require(args.forall(_.foldable),
        "graft_delta arguments must be literals")
      val path = args.head.eval() match {
        case null => throw new IllegalArgumentException(
          "graft_delta path must not be null")
        case s => graft.sources.GraftCatalogResolution.resolveTableRef(
          org.apache.spark.sql.SparkSession.active, s.toString)
      }
      var version: Option[Long] = None
      var asOf: Option[java.time.Instant] = None
      args.lift(1).foreach { e =>
        external(e.eval(), e.dataType) match {
          case null => throw new IllegalArgumentException(
            "graft_delta versionOrTimestamp must not be null")
          case i: java.time.Instant => asOf = Some(i)
          case l: java.time.LocalDateTime => // NTZ literal: UTC wall clock
            asOf = Some(l.toInstant(java.time.ZoneOffset.UTC))
          case d: java.time.LocalDate =>
            asOf = Some(d.atStartOfDay.toInstant(java.time.ZoneOffset.UTC))
          case n: Number => version = Some(n.longValue())
          case other =>
            val s = other.toString.trim
            if (s.forall(_.isDigit)) version = Some(s.toLong)
            else if (s.length == 10) // 'yyyy-MM-dd' (delta-spark accepts it)
              asOf = Some(java.time.LocalDate.parse(s).atStartOfDay
                .toInstant(java.time.ZoneOffset.UTC))
            else asOf = Some( // string form parsed as a UTC wall clock
              java.time.LocalDateTime.parse(s.replace(' ', 'T'))
                .toInstant(java.time.ZoneOffset.UTC))
        }
      }
      val spark = org.apache.spark.sql.SparkSession.active
      DeltaLake.scanDelta(spark, path,
        ScanSettings(version = version, timestampAsOf = asOf))
        .queryExecution.analyzed
    }

  /** Catalyst-internal literal value → the external JVM value the Cond
    * DSL and ScanSettings expect: dates arrive from eval() as epoch
    * DAYS, timestamps as MICROS, strings as UTF8String, decimals as
    * Decimal — handing them over raw would make the compiled predicate
    * fail analysis (DateType column vs integer literal) or mismatch.
    */
  private def external(v: Any,
      dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types.{DateType, Decimal, TimestampNTZType, TimestampType}
    (v, dt) match {
      case (null, _) => null
      case (s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      case (days: Integer, DateType) =>
        java.time.LocalDate.ofEpochDay(days.longValue)
      case (micros: java.lang.Long, TimestampType) =>
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L)
      case (micros: java.lang.Long, TimestampNTZType) =>
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case (d: Decimal, _) => d.toJavaBigDecimal
      case (x, _) => x
    }
  }

  /** Path-or-name argument for the TVF builders: a session-catalog
    * NAME whose provider is graft-delta resolves to its location, so
    * every verb works on the tables a SQL user created
    * (`graft_optimize('sales')`); anything else is a filesystem path
    * verbatim.
    */
  private def literalPath(args: Seq[Expression], i: Int,
      fn: String): String =
    graft.sources.GraftCatalogResolution.resolveTableRef(
      org.apache.spark.sql.SparkSession.active,
      literalString(args, i, fn, "path"))

  /** Shared literal-argument extraction for the TVF builders. */
  private def literalString(args: Seq[Expression], i: Int,
      fn: String, what: String): String = {
    require(args(i).foldable, s"$fn arguments must be literals")
    args(i).eval() match {
      case null =>
        throw new IllegalArgumentException(s"$fn $what must not be null")
      case s => s.toString
    }
  }

  private def literalLong(args: Seq[Expression], i: Int,
      fn: String, what: String): Long = {
    require(args(i).foldable, s"$fn arguments must be literals")
    args(i).eval() match {
      case null =>
        throw new IllegalArgumentException(s"$fn $what must not be null")
      case n: Number => n.longValue()
      case other => other.toString.toLong
    }
  }

  /** `graft_delta_cdf(path, sinceVersion[, col, op, value])`: the batch
    * change feed — rows added strictly after `sinceVersion`
    * (`_change_type='insert'`, incl. DV-shrink restores) unioned with
    * rows DV-deleted in the window (`'delete'`). Applying inserts then
    * deletes reproduces the net state delta; the streaming twin is
    * [[graft.streaming.DeltaStream.runAvailableNowCdf]]. The optional
    * condition triple reaches the FILE-PRUNING path (partition values +
    * stats drop change files before IO) — a plain SQL WHERE over the
    * TVF result filters rows but cannot prune files, because the plan
    * is spliced in already-resolved.
    */
  private[graft] val cdfTableFunction
      : Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    args => {
      require(Set(2, 3, 5, 6).contains(args.size),
        "graft_delta_cdf(path, sinceVersion[, untilVersion][, col, op, " +
          "value]) takes 2, 3, 5 or 6 arguments")
      val path = literalPath(args, 0, "graft_delta_cdf")
      val since = literalLong(args, 1, "graft_delta_cdf", "sinceVersion")
      // the 3- and 6-arg forms carry an inclusive endingVersion bound
      val hasUntil = args.size == 3 || args.size == 6
      val until =
        if (!hasUntil) None
        else Some(literalLong(args, 2, "graft_delta_cdf", "untilVersion"))
      val condBase = if (hasUntil) 3 else 2
      val conds =
        if (args.size < 5) Nil
        else {
          require(args(condBase + 2).foldable,
            "graft_delta_cdf arguments must be literals")
          val op = literalString(args, condBase + 1, "graft_delta_cdf",
            "operator")
          require(op != "in" && op != "not in",
            "graft_delta_cdf's predicate triple cannot express list " +
              "values; use a scalar operator")
          Seq(graft.delta.Cond(
            literalString(args, condBase, "graft_delta_cdf", "column"),
            op,
            external(args(condBase + 2).eval(),
              args(condBase + 2).dataType)))
        }
      val spark = org.apache.spark.sql.SparkSession.active
      DeltaLake.scanDeltaCdf(spark, path, since, conds, until)
        .queryExecution.analyzed
    }

  /** `graft_delta_row_ids(path[, version])`: the stable-row-id scan as
    * a table — table columns + `_row_id` / `_row_commit_version`
    * resolved per the protocol (materialized columns first, then
    * baseRowId + row index).
    */
  private[graft] val rowIdsTableFunction
      : Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    args => {
      require(args.nonEmpty && args.size <= 2,
        "graft_delta_row_ids(path[, version]) takes 1 or 2 arguments")
      val path = literalPath(args, 0, "graft_delta_row_ids")
      val version = if (args.size < 2) None
        else Some(literalLong(args, 1, "graft_delta_row_ids", "version"))
      val spark = org.apache.spark.sql.SparkSession.active
      DeltaLake.scanDeltaWithRowIds(spark, path, version)
        .queryExecution.analyzed
    }

  /** `graft_delta_history(path)`: DESCRIBE HISTORY as a table —
    * version/timestamp/operation/file-action counts/operation_metrics.
    */
  private[graft] val historyTableFunction
      : Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    args => {
      require(args.size == 1, "graft_delta_history(path) takes 1 argument")
      val path = literalPath(args, 0, "graft_delta_history")
      val spark = org.apache.spark.sql.SparkSession.active
      DeltaLake.history(spark, path).queryExecution.analyzed
    }

  private type Plan = org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  /** `graft_optimize(path[, 'z1,z2'[, col, op, value]])`: bin-pack
    * compaction, optionally re-clustered on the Morton key (OPTIMIZE
    * ZORDER BY; pass '' for none), optionally restricted to partitions
    * matching the predicate triple (OPTIMIZE … WHERE). One row: the
    * number of source files compacted away.
    */
  private[graft] val optimizeTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.nonEmpty && args.size <= 2 || args.size == 5,
        "graft_optimize(path[, zorderColumnsCsv[, col, op, value]]) " +
          "takes 1, 2 or 5 arguments")
      val path = literalPath(args, 0, "graft_optimize")
      val zorder =
        if (args.size < 2) Nil
        else literalString(args, 1, "graft_optimize", "zorderColumnsCsv")
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val conds =
        if (args.size < 5) Nil
        else {
          require(args(4).foldable, "graft_optimize arguments must be literals")
          val op = literalString(args, 3, "graft_optimize", "operator")
          require(op != "in" && op != "not in",
            "graft_optimize's predicate triple cannot express list " +
              "values; use a scalar operator")
          Seq(graft.delta.Cond(
            literalString(args, 2, "graft_optimize", "column"),
            op,
            external(args(4).eval(), args(4).dataType)))
        }
      graft.plans.GraftProcedureNode("graft_optimize",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("num_compacted_files",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          graft.delta.DeltaWriter.compact(spark, path,
            zOrderBy = zorder, conditions = conds).toLong))
      }
    }

  /** `graft_vacuum(path[, graceMs[, dryRun]])`: reclaim unreferenced
    * files (distributed listing). One row per deleted — or, under
    * dryRun, would-be-deleted — relative path.
    */
  private[graft] val vacuumTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.nonEmpty && args.size <= 3,
        "graft_vacuum(path[, graceMs[, dryRun]]) takes 1 to 3 arguments")
      val path = literalPath(args, 0, "graft_vacuum")
      val grace =
        if (args.size < 2) -1L // unset: the table's retention property governs
        else literalLong(args, 1, "graft_vacuum", "graceMs")
      val dry = args.size >= 3 && {
        require(args(2).foldable, "graft_vacuum arguments must be literals")
        args(2).eval() match {
          case b: java.lang.Boolean => b.booleanValue()
          case other => other.toString.toBoolean
        }
      }
      graft.plans.GraftProcedureNode("graft_vacuum",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("path",
            org.apache.spark.sql.types.StringType)))) { spark =>
        graft.delta.DeltaWriter.vacuum(spark, path, grace, dry)
          .map(org.apache.spark.sql.Row(_))
      }
    }

  /** `graft_rename_column(path, old, new)`: metadata-only RENAME COLUMN
    * (auto-enables column mapping). One row: the committed version.
    */
  private[graft] val renameColumnTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 3,
        "graft_rename_column(path, oldName, newName) takes 3 arguments")
      val path = literalPath(args, 0, "graft_rename_column")
      val from = literalString(args, 1, "graft_rename_column", "oldName")
      val to = literalString(args, 2, "graft_rename_column", "newName")
      graft.plans.GraftProcedureNode("graft_rename_column",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.renameColumn(spark, path, from, to)))
      }
    }

  /** `graft_drop_column(path, col)`: metadata-only DROP COLUMN. One
    * row: the committed version.
    */
  private[graft] val dropColumnTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 2,
        "graft_drop_column(path, colName) takes 2 arguments")
      val path = literalPath(args, 0, "graft_drop_column")
      val colName = literalString(args, 1, "graft_drop_column", "colName")
      graft.plans.GraftProcedureNode("graft_drop_column",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.dropColumn(spark, path, colName)))
      }
    }

  /** `graft_restore(path, toVersion)`: RESTORE TABLE ... TO VERSION AS
    * OF. One row of restore statistics.
    */
  private[graft] val restoreTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 2,
        "graft_restore(path, toVersion) takes 2 arguments")
      val path = literalPath(args, 0, "graft_restore")
      val toV = literalLong(args, 1, "graft_restore", "toVersion")
      graft.plans.GraftProcedureNode("graft_restore",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("restored_files",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("removed_files",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dv_reverted",
            org.apache.spark.sql.types.LongType)))) { spark =>
        val st = DeltaLake.restoreTable(spark, path, toV)
        Seq(org.apache.spark.sql.Row(
          st.restoredFiles, st.removedFiles, st.dvReverted))
      }
    }

  /** `graft_fsck(path[, dryRun])`: FSCK REPAIR TABLE — drop live
    * entries whose data file or DV bin is missing from storage. One row
    * per removed (or, under dryRun, would-be-removed) relative path.
    */
  private[graft] val fsckTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.nonEmpty && args.size <= 2,
        "graft_fsck(path[, dryRun]) takes 1 or 2 arguments")
      val path = literalPath(args, 0, "graft_fsck")
      val dry = args.size >= 2 && {
        require(args(1).foldable, "graft_fsck arguments must be literals")
        args(1).eval() match {
          case b: java.lang.Boolean => b.booleanValue()
          case other => other.toString.toBoolean
        }
      }
      graft.plans.GraftProcedureNode("graft_fsck",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("path",
            org.apache.spark.sql.types.StringType)))) { spark =>
        DeltaLake.fsckRepair(spark, path, dry)
          .map(org.apache.spark.sql.Row(_))
      }
    }

  /** `graft_reorg(path[, col, op, value])`: REORG TABLE … APPLY
    * (PURGE) — rewrite only DV-bearing files (optionally scoped by a
    * partition predicate) so soft deletes become physical. One row:
    * files rewritten.
    */
  private[graft] val reorgTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 1 || args.size == 4,
        "graft_reorg(path[, col, op, value]) takes 1 or 4 arguments")
      val path = literalPath(args, 0, "graft_reorg")
      val conds =
        if (args.size < 4) Nil
        else {
          require(args(3).foldable, "graft_reorg arguments must be literals")
          val op = literalString(args, 2, "graft_reorg", "operator")
          require(op != "in" && op != "not in",
            "graft_reorg's predicate triple cannot express list values")
          Seq(graft.delta.Cond(
            literalString(args, 1, "graft_reorg", "column"), op,
            external(args(3).eval(), args(3).dataType)))
        }
      graft.plans.GraftProcedureNode("graft_reorg",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("num_purged_files",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.reorgPurge(spark, path, conds).toLong))
      }
    }

  /** `graft_add_column(path, name, typeDdl)`: metadata-only ADD COLUMN
    * (nullable; mapped tables mint a fresh identity). The type is Spark
    * DDL (`'bigint'`, `'struct<a:int,b:string>'`). One row: the
    * committed version.
    */
  private[graft] val addColumnTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 3,
        "graft_add_column(path, colName, typeDdl) takes 3 arguments")
      val path = literalPath(args, 0, "graft_add_column")
      val colName = literalString(args, 1, "graft_add_column", "colName")
      val ddl = literalString(args, 2, "graft_add_column", "typeDdl")
      val dt = org.apache.spark.sql.types.DataType.fromDDL(ddl)
      graft.plans.GraftProcedureNode("graft_add_column",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.addColumn(spark, path, colName, dt)))
      }
    }

  /** `graft_widen_column(path, col, typeDdl)`: metadata-only lossless
    * type widening (ALTER COLUMN … TYPE). One row: the committed
    * version.
    */
  private[graft] val widenColumnTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 3,
        "graft_widen_column(path, colName, typeDdl) takes 3 arguments")
      val path = literalPath(args, 0, "graft_widen_column")
      val colName = literalString(args, 1, "graft_widen_column", "colName")
      val dt = org.apache.spark.sql.types.DataType.fromDDL(
        literalString(args, 2, "graft_widen_column", "typeDdl"))
      graft.plans.GraftProcedureNode("graft_widen_column",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.widenColumnType(spark, path, colName, dt)))
      }
    }

  /** `graft_set_tblproperties(path, key, value[, key, value ...])`:
    * metadata-only SET TBLPROPERTIES; guarded keys reject with their
    * cure. One row: the committed version.
    */
  private[graft] val setPropsTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size >= 3 && args.size % 2 == 1,
        "graft_set_tblproperties(path, key, value[, key, value ...]) " +
          "takes an odd argument count of 3 or more")
      val path = literalPath(args, 0, "graft_set_tblproperties")
      val props = (1 until args.size by 2).map { i =>
        literalString(args, i, "graft_set_tblproperties", s"key#$i") ->
          literalString(args, i + 1, "graft_set_tblproperties", s"value#${i + 1}")
      }.toMap
      graft.plans.GraftProcedureNode("graft_set_tblproperties",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.setTableProperties(spark, path, props)))
      }
    }

  /** `graft_unset_tblproperties(path, key[, key ...])`: metadata-only,
    * idempotent UNSET TBLPROPERTIES. One row: the resulting version.
    */
  private[graft] val unsetPropsTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size >= 2,
        "graft_unset_tblproperties(path, key[, key ...]) takes 2+ arguments")
      val path = literalPath(args, 0, "graft_unset_tblproperties")
      val keys = (1 until args.size).map(i =>
        literalString(args, i, "graft_unset_tblproperties", s"key#$i"))
      graft.plans.GraftProcedureNode("graft_unset_tblproperties",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.unsetTableProperties(spark, path, keys)))
      }
    }

  /** `graft_add_constraint(path, name, checkExprSql)`: ALTER TABLE ADD
    * CONSTRAINT — validates the CHECK expression over every existing
    * row (one distributed short-circuit scan), then one metadata-only
    * commit. One row: the committed version.
    */
  private[graft] val addConstraintTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 3,
        "graft_add_constraint(path, name, checkExprSql) takes 3 arguments")
      val path = literalPath(args, 0, "graft_add_constraint")
      val name = literalString(args, 1, "graft_add_constraint", "name")
      val sqlExpr =
        literalString(args, 2, "graft_add_constraint", "checkExprSql")
      graft.plans.GraftProcedureNode("graft_add_constraint",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.addCheckConstraint(spark, path, name, sqlExpr)))
      }
    }

  /** `graft_drop_constraint(path, name)`: ALTER TABLE DROP CONSTRAINT,
    * metadata-only. One row: the committed version.
    */
  private[graft] val dropConstraintTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 2,
        "graft_drop_constraint(path, name) takes 2 arguments")
      val path = literalPath(args, 0, "graft_drop_constraint")
      val name = literalString(args, 1, "graft_drop_constraint", "name")
      graft.plans.GraftProcedureNode("graft_drop_constraint",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.dropCheckConstraint(spark, path, name)))
      }
    }

  /** `graft_set_default(path, colName, defaultSql)`: ALTER COLUMN …
    * SET DEFAULT (metadata-only; constant expression). One row: the
    * committed version.
    */
  private[graft] val setDefaultTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 3,
        "graft_set_default(path, colName, defaultSql) takes 3 arguments")
      val path = literalPath(args, 0, "graft_set_default")
      val colName = literalString(args, 1, "graft_set_default", "colName")
      val sqlExpr = literalString(args, 2, "graft_set_default", "defaultSql")
      graft.plans.GraftProcedureNode("graft_set_default",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.setColumnDefault(spark, path, colName, sqlExpr)))
      }
    }

  /** `graft_drop_default(path, colName)`: ALTER COLUMN … DROP DEFAULT,
    * metadata-only, idempotent. One row: the resulting version.
    */
  private[graft] val dropDefaultTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 2,
        "graft_drop_default(path, colName) takes 2 arguments")
      val path = literalPath(args, 0, "graft_drop_default")
      val colName = literalString(args, 1, "graft_drop_default", "colName")
      graft.plans.GraftProcedureNode("graft_drop_default",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.dropColumnDefault(spark, path, colName)))
      }
    }

  /** `graft_cluster_by(path, colsCsv)`: ALTER TABLE … CLUSTER BY
    * (empty string = CLUSTER BY NONE). One row: the committed version.
    */
  private[graft] val clusterByTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 2,
        "graft_cluster_by(path, colsCsv) takes 2 arguments")
      val path = literalPath(args, 0, "graft_cluster_by")
      val cols = literalString(args, 1, "graft_cluster_by", "colsCsv")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      graft.plans.GraftProcedureNode("graft_cluster_by",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.alterClusterBy(spark, path, cols)))
      }
    }

  /** One `(col, op, value)` predicate triple starting at `base` —
    * the TVF-argument encoding of the [[graft.delta.Cond]] DSL shared
    * by every predicate-taking verb.
    */
  private def condTriple(args: Seq[Expression], base: Int,
      fn: String): graft.delta.Cond = {
    require(args(base + 2).foldable, s"$fn arguments must be literals")
    val op = literalString(args, base + 1, fn, "operator")
    require(op != "in" && op != "not in",
      s"$fn's predicate triple cannot express list values; " +
        "use a scalar operator")
    graft.delta.Cond(literalString(args, base, fn, "column"), op,
      external(args(base + 2).eval(), args(base + 2).dataType))
  }

  /** `graft_delete(path, col, op, value)`: DELETE FROM … WHERE — rows
    * matching the predicate are masked via deletion vectors (no data
    * rewrite). One row: rows newly deleted.
    */
  private[graft] val deleteTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 4,
        "graft_delete(path, col, op, value) takes 4 arguments")
      val path = literalPath(args, 0, "graft_delete")
      val conds = Seq(condTriple(args, 1, "graft_delete"))
      graft.plans.GraftProcedureNode("graft_delete",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("deleted_rows",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.deleteWhere(spark, path, conds)))
      }
    }

  /** `graft_update(path, col, op, value, setCol, setExprSql[, setCol,
    * setExprSql ...])`: UPDATE … SET … WHERE — matching rows get DV-
    * masked and their updated images appended, one commit. Each
    * assignment value is a SQL expression over the table's columns
    * (`'price * 1.1'`, `'upper(name)'`). One row: rows updated.
    */
  private[graft] val updateTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size >= 6 && args.size % 2 == 0,
        "graft_update(path, col, op, value, setCol, setExprSql[, " +
          "setCol, setExprSql ...]) takes an even argument count of 6+")
      val path = literalPath(args, 0, "graft_update")
      val conds = Seq(condTriple(args, 1, "graft_update"))
      val assignments = (4 until args.size by 2).map { i =>
        literalString(args, i, "graft_update", s"setCol#$i") ->
          org.apache.spark.sql.functions.expr(
            literalString(args, i + 1, "graft_update", s"setExpr#${i + 1}"))
      }
      // delta-spark rejects duplicate SET targets; silently letting the
      // last one win would discard an assignment with no diagnostic
      val dup = assignments.map(_._1).groupBy(identity)
        .collect { case (k, v) if v.size > 1 => k }
      require(dup.isEmpty,
        s"graft_update: duplicate assignment for column(s) " +
          dup.mkString(", "))
      val set = assignments.toMap
      graft.plans.GraftProcedureNode("graft_update",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("updated_rows",
            org.apache.spark.sql.types.LongType)))) { spark =>
        Seq(org.apache.spark.sql.Row(
          DeltaLake.updateWhere(spark, path, conds, set)))
      }
    }

  /** `graft_merge(path, sourceSql, keysCsv[, deleteWhenSql])`: MERGE
    * INTO with upsert semantics — `WHEN MATCHED THEN UPDATE SET * WHEN
    * NOT MATCHED THEN INSERT *`, plus `WHEN MATCHED AND <deleteWhenSql>
    * THEN DELETE` when the fourth argument is given. The source is ANY
    * SQL query the session can express — including other `graft_delta`
    * TVF reads — evaluated when the statement EXECUTES, not when it
    * plans. One row of merge statistics.
    */
  private[graft] val mergeTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 3 || args.size == 4,
        "graft_merge(path, sourceSql, keysCsv[, deleteWhenSql]) takes " +
          "3 or 4 arguments")
      val path = literalPath(args, 0, "graft_merge")
      val sourceSql = literalString(args, 1, "graft_merge", "sourceSql")
      val keys = literalString(args, 2, "graft_merge", "keysCsv")
        .split(',').map(_.trim).filter(_.nonEmpty).toSeq
      require(keys.nonEmpty, "graft_merge needs at least one key column")
      val deleteWhen = args.lift(3).map(_ =>
        org.apache.spark.sql.functions.expr(
          literalString(args, 3, "graft_merge", "deleteWhenSql")))
      graft.plans.GraftProcedureNode("graft_merge",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("updated_rows",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("source_rows",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("deleted_rows",
            org.apache.spark.sql.types.LongType)))) { spark =>
        val st = graft.delta.DeltaWriter.merge(spark, path,
          spark.sql(sourceSql), keys, deleteWhen = deleteWhen)
        Seq(org.apache.spark.sql.Row(
          st.updatedRows, st.sourceRows, st.deletedRows))
      }
    }

  /** `graft_replace_where(path, sourceSql, col, op, value)`: the
    * predicate-scoped atomic overwrite — delete every row matching the
    * predicate and insert the source query's rows (which must all
    * satisfy it), ONE commit. Partition-provable files are removed
    * whole by metadata; undecidable ones are DV-masked. One row of
    * replace statistics (`deleted_rows` is null when a whole-removed
    * file carried no row-count stats).
    */
  private[graft] val replaceWhereTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 5,
        "graft_replace_where(path, sourceSql, col, op, value) takes " +
          "5 arguments")
      val path = literalPath(args, 0, "graft_replace_where")
      val sourceSql =
        literalString(args, 1, "graft_replace_where", "sourceSql")
      val conds = Seq(condTriple(args, 2, "graft_replace_where"))
      graft.plans.GraftProcedureNode("graft_replace_where",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("removed_files",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("masked_rows",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("written_rows",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("deleted_rows",
            org.apache.spark.sql.types.LongType, nullable = true)))) { spark =>
        val st = DeltaLake.replaceWhere(spark, path, conds,
          spark.sql(sourceSql))
        Seq(org.apache.spark.sql.Row(
          st.removedFiles, st.maskedRows, st.writtenRows,
          st.deletedRows.map(Long.box).orNull))
      }
    }

  /** `graft_clone(srcPath, dstPath[, srcVersion])`: SHALLOW CLONE —
    * a new table whose version 0 references the source's files
    * (optionally at a past version) without copying data. One row:
    * the source version cloned and the files referenced.
    */
  private[graft] val cloneTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 2 || args.size == 3,
        "graft_clone(srcPath, dstPath[, srcVersion]) takes 2 or 3 " +
          "arguments")
      val src = literalPath(args, 0, "graft_clone")
      val dst = literalString(args, 1, "graft_clone", "dstPath")
      val srcVersion = if (args.size < 3) None
        else Some(literalLong(args, 2, "graft_clone", "srcVersion"))
      graft.plans.GraftProcedureNode("graft_clone",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("source_version",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("num_files",
            org.apache.spark.sql.types.LongType)))) { spark =>
        // resolve the version BEFORE cloning and pin the clone to it —
        // re-reading the source head afterwards could name a version a
        // concurrent commit moved past the one actually cloned
        val srcV = srcVersion.getOrElse(
          graft.delta.DeltaLog.forPath(spark, src).version)
        graft.delta.DeltaWriter.cloneTable(spark, src, dst, Some(srcV))
        val cloned = graft.delta.DeltaLog.forPath(spark, dst)
        Seq(org.apache.spark.sql.Row(srcV, cloned.liveFiles.size.toLong))
      }
    }

  /** `graft_detail(path)`: DESCRIBE DETAIL as a one-row table. */
  private[graft] val detailTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 1, "graft_detail(path) takes 1 argument")
      val path = literalPath(args, 0, "graft_detail")
      val spark = org.apache.spark.sql.SparkSession.active
      DeltaLake.detail(spark, path).queryExecution.analyzed
    }

  /** `graft_convert(path)`: CONVERT TO DELTA — register an existing
    * plain-parquet directory as a Delta table in place. One row: the
    * number of files registered at version 0.
    */
  private[graft] val convertTableFunction: Seq[Expression] => Plan =
    args => {
      require(args.size == 1, "graft_convert(path) takes 1 argument")
      val path = literalPath(args, 0, "graft_convert")
      graft.plans.GraftProcedureNode("graft_convert",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("num_files",
            org.apache.spark.sql.types.LongType)))) { spark =>
        DeltaLake.convertParquetToDelta(spark, path)
        Seq(org.apache.spark.sql.Row(
          graft.delta.DeltaLog.forPath(spark, path).liveFiles.size.toLong))
      }
    }
}
