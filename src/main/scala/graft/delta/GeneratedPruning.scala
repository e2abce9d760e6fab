package graft.delta

import java.time.{Instant, LocalDate, LocalDateTime, ZoneId, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.types._

/** Generated-column partition pruning (delta-spark's
  * OptimizeGeneratedColumn analogue; generation expressions per
  * PROTOCOL.md#default-columns--generated-columns): when a partition
  * column is GENERATED from a data column through a monotone
  * NON-DECREASING expression family, a query filter on the BASE column
  * implies a filter on the partition column — so the scan prunes
  * partitions from the log's partitionValues alone, before a single
  * parquet footer or stats blob is consulted.
  *
  * At 100 TB this is the canonical `events` layout: the table is
  * partitioned by `event_date GENERATED ALWAYS AS (CAST(ts AS DATE))`,
  * every query filters on `ts`, and without derivation Catalyst sees no
  * partition predicate at all — the scan stat-skips 100k files one by
  * one instead of dropping 3,647 of 3,650 daily partitions up front.
  * The derived predicate composes with the existing zone-map skipping
  * for the files that survive.
  *
  * Recognized families (all non-decreasing over their base domain):
  *  - `CAST(base AS DATE)` from timestamp
  *  - `DATE_TRUNC('YEAR'|'QUARTER'|'MONTH'|'WEEK'|'DAY'|'HOUR'|'MINUTE'|'SECOND', base)`
  *  - `YEAR(base)`
  *  - `DATE_FORMAT(base, 'yyyy-MM-dd'|'yyyy-MM'|'yyyy')` — zero-padded,
  *    so lexicographic order equals chronological order
  *
  * Soundness: for non-decreasing f,
  *   base = v   ⇒ f(base) = f(v)
  *   base ≥ v   ⇒ f(base) ≥ f(v)   (strict > weakens to ≥ — f is flat
  *   base ≤ v   ⇒ f(base) ≤ f(v)    within a bucket, never strict)
  *   base IN vs ⇒ f(base) IN f(vs)
  * so every derived [[Cond]] is IMPLIED by the original and ANDing it
  * onto the scan can never drop a matching row. `MONTH`/`DAY`/`HOUR`
  * alone are deliberately NOT recognized — they wrap around and are not
  * monotone over time. Unrecognized expressions and unconvertible
  * literals derive nothing (fail-open, the partition is read).
  *
  * Timezone contract (round 12): the recognized families are
  * timezone-sensitive — the writer materialized partition values under
  * ITS session timezone. [[DeltaWriter]] therefore records that zone as
  * the `graft.generated.writerTimeZone` table property when a partition
  * column is generated (at create/overwrite; a later append under a
  * DIFFERENT zone downgrades the property to `mixed`), and the
  * derivation fires only when the property holds a FIXED-OFFSET zone
  * (UTC, +05:30, …) equal to the READING session's — truncations are
  * then computed on the writer's wall clock, so the derived values
  * agree with the materialized partition values by construction.
  * Region zones with DST or historical transitions are refused even
  * when matched: instant → wall clock is non-monotone across a
  * fall-back transition, which breaks the range derivations' order
  * argument. Legacy tables (no recorded zone) and `mixed` tables
  * derive nothing: correct-but-unpruned beats silently dropped
  * partitions. (Before round 12 the gate was "session is UTC", which
  * silently skipped matching partitions when a non-UTC WRITER's
  * values were read by a UTC session.)
  */
object GeneratedPruning {

  /** Table property recording the session timezone the writer
    * materialized generated partition values under (normalized ZoneId;
    * [[MixedZone]] once writes under differing zones touched the
    * table).
    */
  val WriterZoneKey = "graft.generated.writerTimeZone"
  val MixedZone = "mixed"

  /** A recognized generation transform: maps a base-column literal into
    * the partition-column domain (None ⇒ unconvertible, derive nothing).
    * `floorUnit` is the transform's truncation granularity — when a
    * strict `<` literal sits EXACTLY on a bucket floor (`trunc(v) == v`,
    * e.g. `ts < '2024-01-01'` under a yearly bucket), the derived cond
    * can stay strict (`p < f(v)`), dropping the boundary bucket the
    * weakened `≤` would keep.
    */
  private[delta] final case class Gen(base: String, to: Any => Option[Any],
      floorUnit: String, zone: ZoneId) {
    def isFloor(v: Any): Boolean =
      toWall(v, zone).exists(w => truncWall(floorUnit, w).contains(w))
  }

  private val Id = "`?([A-Za-z_][A-Za-z0-9_]*)`?"
  private val CastDate =
    s"(?is)^\\s*CAST\\s*\\(\\s*$Id\\s+AS\\s+DATE\\s*\\)\\s*$$".r
  private val DateTrunc =
    s"(?is)^\\s*DATE_TRUNC\\s*\\(\\s*'(\\w+)'\\s*,\\s*$Id\\s*\\)\\s*$$".r
  private val YearOf = s"(?is)^\\s*YEAR\\s*\\(\\s*$Id\\s*\\)\\s*$$".r
  private val DateFmt =
    s"(?is)^\\s*DATE_FORMAT\\s*\\(\\s*$Id\\s*,\\s*'([^']+)'\\s*\\)\\s*$$".r

  private val MonotoneFormats = Set("yyyy-MM-dd", "yyyy-MM", "yyyy")

  /** The literal as the WRITER's wall clock: absolute values convert
    * through `zone`; local values (LocalDateTime, LocalDate, zoneless
    * strings — the reading session equals the recorded zone when
    * derivation fires, so a local literal means writer wall clock)
    * pass through. A string carrying an explicit offset ('…Z',
    * '…+02:00') is an ABSOLUTE instant and must convert through `zone`
    * like the Instant case — re-anchoring it at UTC under a non-UTC
    * matching zone shifted the derived wall clock by the offset and
    * pruned a partition holding matching rows (round-12 advice,
    * medium).
    */
  private def toWall(v: Any, zone: ZoneId): Option[LocalDateTime] = v match {
    case i: Instant => Some(LocalDateTime.ofInstant(i, zone))
    case t: java.sql.Timestamp =>
      Some(LocalDateTime.ofInstant(t.toInstant, zone))
    case l: LocalDateTime => Some(l)
    case d: LocalDate => Some(d.atStartOfDay)
    case d: java.sql.Date => Some(d.toLocalDate.atStartOfDay)
    case s: String => absoluteInstant(s) match {
      case Some(i) => Some(LocalDateTime.ofInstant(i, zone))
      // zoneless string: parseTs anchors the wall clock at UTC;
      // unanchoring at UTC recovers it verbatim
      case None => FileSkipping.parseTs(s)
        .map(i => LocalDateTime.ofInstant(i, ZoneOffset.UTC))
    }
    case _ => None
  }

  /** Parse `s` as an offset-bearing (absolute) timestamp string; None
    * for zoneless wall-clock strings.
    */
  private[graft] def absoluteInstant(s: String): Option[Instant] = {
    val t = s.replace(" ", "T")
    try Some(Instant.parse(t))
    catch {
      case _: Exception =>
        try Some(java.time.OffsetDateTime.parse(t).toInstant)
        catch { case _: Exception => None }
    }
  }

  private def wallDate(v: Any, zone: ZoneId): Option[LocalDate] =
    toWall(v, zone).map(_.toLocalDate)

  private def truncWall(unit: String,
      ldt: LocalDateTime): Option[LocalDateTime] =
    unit.toUpperCase match {
      case "YEAR" | "YYYY" | "YY" =>
        Some(ldt.toLocalDate.withDayOfYear(1).atStartOfDay)
      case "QUARTER" => Some(LocalDate
        .of(ldt.getYear, ((ldt.getMonthValue - 1) / 3) * 3 + 1, 1)
        .atStartOfDay)
      case "MONTH" | "MON" | "MM" =>
        Some(ldt.toLocalDate.withDayOfMonth(1).atStartOfDay)
      // Spark's WEEK truncation: the Monday of the value's ISO week
      case "WEEK" => Some(ldt.toLocalDate
        .minusDays(ldt.getDayOfWeek.getValue - 1L).atStartOfDay)
      case "DAY" | "DD" => Some(ldt.toLocalDate.atStartOfDay)
      case "HOUR" => Some(ldt.truncatedTo(ChronoUnit.HOURS))
      case "MINUTE" => Some(ldt.truncatedTo(ChronoUnit.MINUTES))
      case "SECOND" => Some(ldt.truncatedTo(ChronoUnit.SECONDS))
      case _ => None
    }

  /** Truncate on the writer's wall clock, re-anchored at UTC — the same
    * anchor PartitionValues.deserialize uses for stored timestamp
    * partition strings, so comparisons happen wall-clock-to-wall-clock.
    */
  private def truncated(unit: String, v: Any, zone: ZoneId): Option[Instant] =
    toWall(v, zone).flatMap(truncWall(unit, _))
      .map(_.toInstant(ZoneOffset.UTC))

  /** Parse one generation-expression SQL string into a recognized
    * transform; None for anything outside the monotone families.
    */
  private[delta] def parse(sql: String, zone: ZoneId): Option[Gen] =
    sql match {
      case CastDate(base) =>
        Some(Gen(base, v => wallDate(v, zone).map(d => d: Any), "DAY", zone))
      case DateTrunc(unit, base) =>
        // refuse unknown units up front so derive() stays fail-open
        if (truncWall(unit, LocalDateTime.of(1970, 1, 1, 0, 0)).isEmpty) None
        else Some(Gen(base, v => truncated(unit, v, zone).map(i => i: Any),
          unit, zone))
      case YearOf(base) =>
        Some(Gen(base, v => wallDate(v, zone).map(d => d.getYear: Any),
          "YEAR", zone))
      case DateFmt(base, fmt) if MonotoneFormats.contains(fmt) =>
        val f = DateTimeFormatter.ofPattern(fmt)
        val unit = fmt match {
          case "yyyy-MM-dd" => "DAY"
          case "yyyy-MM" => "MONTH"
          case _ => "YEAR"
        }
        Some(Gen(base, v => toWall(v, zone).map(_.format(f): Any), unit,
          zone))
      case _ => None
    }

  /** Conds on generated PARTITION columns implied by `conds` on their
    * base columns. Callers AND these onto the original set — they are
    * derived, never a replacement (rows inside a surviving partition
    * still need the base predicate). `config` is the table's
    * configuration; derivation fires only when its recorded writer
    * zone ([[WriterZoneKey]]) matches the reading session (see the
    * timezone contract above).
    */
  def derive(conds: Seq[Cond], schema: StructType,
      partitionColumns: Seq[String],
      config: Map[String, String]): Seq[Cond] = {
    if (conds.isEmpty || partitionColumns.isEmpty) return Nil
    val zone: ZoneId = config.get(WriterZoneKey) match {
      case Some(MixedZone) => return Nil // cross-zone writes: unprovable
      case Some(z) =>
        val wz =
          try ZoneId.of(z).normalized()
          catch { case scala.util.control.NonFatal(_) => return Nil }
        if (!sessionZone.contains(wz)) return Nil
        // DST zones break the soundness argument for the RANGE
        // derivations: instant -> wall clock is non-monotone across a
        // fall-back transition (two instants an hour apart share wall
        // times in reverse order), so `ts >= v` does NOT imply
        // `f(ts) >= f(v)` — a matching row materialized into the
        // repeated hour's partition would be silently pruned. Only
        // fixed-offset zones (UTC, +05:30, …) keep wall-clock order
        // equal to instant order; anything else derives nothing.
        if (!wz.getRules.isFixedOffset) return Nil
        wz
      case None => return Nil // legacy table: writer zone unrecorded
    }
    val gens: Seq[(String, Gen)] = schema.fields.toSeq
      .filter(f => partitionColumns.contains(f.name) &&
        f.metadata.contains(Constraints.GenerationKey))
      .flatMap(f =>
        parse(f.metadata.getString(Constraints.GenerationKey), zone)
          .map(f.name -> _))
    for {
      (p, g) <- gens
      c <- conds if c.column == g.base
      d <- deriveOne(p, g, c)
    } yield d
  }

  private def sessionZone: Option[ZoneId] =
    try Some(ZoneId
      .of(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      .normalized())
    catch { case scala.util.control.NonFatal(_) => None }

  /** True when `schema` generates a PARTITION column through one of the
    * recognized (timezone-sensitive) families — the shape whose
    * materialized values depend on the writing session's zone.
    */
  private[delta] def hasZoneSensitiveGeneration(schema: StructType,
      partitionColumns: Seq[String]): Boolean =
    schema.fields.exists(f => partitionColumns.contains(f.name) &&
      f.metadata.contains(Constraints.GenerationKey) &&
      parse(f.metadata.getString(Constraints.GenerationKey),
        ZoneOffset.UTC).isDefined)

  /** DML guard: update/merge recompute generated columns under THEIR
    * session zone but emit no metadata commit that could downgrade the
    * recorded writer zone — silently mixing zones would poison the
    * derivation for every later reader. Refuse loudly instead; appends
    * via [[DeltaWriter.write]] record the downgrade (`mixed`) and stay
    * allowed.
    */
  private[delta] def requireZoneConsistent(config: Map[String, String],
      schema: StructType, partitionColumns: Seq[String], op: String): Unit =
    config.get(WriterZoneKey).filter(_ != MixedZone).foreach { z =>
      if (hasZoneSensitiveGeneration(schema, partitionColumns) &&
          !sessionZone.exists(sz =>
            try sz == ZoneId.of(z).normalized()
            catch { case scala.util.control.NonFatal(_) => false }))
        throw new IllegalStateException(
          s"$op recomputes generated partition values under session " +
            s"timezone '${org.apache.spark.sql.internal.SQLConf.get
              .sessionLocalTimeZone}' but the table records writer " +
            s"timezone '$z' ($WriterZoneKey) — run under the recorded " +
            "zone, or append through DeltaWriter.write (which records " +
            "the downgrade to 'mixed' and disables generated-column " +
            "pruning)")
    }

  private def deriveOne(p: String, g: Gen, c: Cond): Option[Cond] =
    (c.op, c.value) match {
      // the recognized families are null-preserving AND null-rejecting
      // (non-null base ⇒ non-null generated), so IsNull/IsNotNull carry
      case ("=", null) => Some(Cond(p, "=", null))
      case ("<>", null) => Some(Cond(p, "<>", null))
      case ("=", v) => g.to(v).map(Cond(p, "=", _))
      case (">" | ">=", v) => g.to(v).map(Cond(p, ">=", _))
      // strict < on an exact bucket floor stays strict: no base value
      // below the floor can land in the floor's bucket
      case ("<", v) if g.isFloor(v) => g.to(v).map(Cond(p, "<", _))
      case ("<" | "<=", v) => g.to(v).map(Cond(p, "<=", _))
      case ("in", vs: Seq[_]) =>
        val mapped = vs.map(v =>
          if (v == null) Some(null: Any) else g.to(v))
        if (mapped.nonEmpty && mapped.forall(_.isDefined))
          Some(Cond(p, "in", mapped.map(_.get)))
        else None
      // "<>" with a value and "not in" don't transfer — f is not
      // injective (two base values share a bucket)
      case _ => None
    }
}
