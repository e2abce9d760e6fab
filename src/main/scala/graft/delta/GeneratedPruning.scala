package graft.delta

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
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
  * Timestamp bases are interpreted in UTC, and the derivation FIRES
  * ONLY when the current session timezone normalizes to UTC (the
  * engine's harness default): the writer materialized partition values
  * under its own session timezone, so UTC-reader-over-UTC-writer is
  * the provable case — a consistent-UTC pipeline is the documented
  * assumption. Under any other session timezone the scan stays
  * correct-but-unpruned rather than risking silently dropped
  * partitions.
  */
object GeneratedPruning {

  /** A recognized generation transform: maps a base-column literal into
    * the partition-column domain (None ⇒ unconvertible, derive nothing).
    * `floorUnit` is the transform's truncation granularity — when a
    * strict `<` literal sits EXACTLY on a bucket floor (`trunc(v) == v`,
    * e.g. `ts < '2024-01-01'` under a yearly bucket), the derived cond
    * can stay strict (`p < f(v)`), dropping the boundary bucket the
    * weakened `≤` would keep.
    */
  private[delta] final case class Gen(base: String, to: Any => Option[Any],
      floorUnit: String) {
    def isFloor(v: Any): Boolean =
      (toInstant(v), truncated(floorUnit, v)) match {
        case (Some(i), Some(t)) => i == t
        case _ => false
      }
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

  private def toInstant(v: Any): Option[Instant] = v match {
    case i: Instant => Some(i)
    case t: java.sql.Timestamp => Some(t.toInstant)
    case l: LocalDateTime => Some(l.toInstant(ZoneOffset.UTC))
    case d: LocalDate => Some(d.atStartOfDay.toInstant(ZoneOffset.UTC))
    case d: java.sql.Date =>
      Some(d.toLocalDate.atStartOfDay.toInstant(ZoneOffset.UTC))
    case s: String => FileSkipping.parseTs(s)
    case _ => None
  }

  private def utcDate(v: Any): Option[LocalDate] =
    toInstant(v).map(i => LocalDateTime.ofInstant(i, ZoneOffset.UTC).toLocalDate)

  private def truncated(unit: String, v: Any): Option[Instant] =
    toInstant(v).flatMap { i =>
      val ldt = LocalDateTime.ofInstant(i, ZoneOffset.UTC)
      val t: Option[LocalDateTime] = unit.toUpperCase match {
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
      t.map(_.toInstant(ZoneOffset.UTC))
    }

  /** Parse one generation-expression SQL string into a recognized
    * transform; None for anything outside the monotone families.
    */
  private[delta] def parse(sql: String): Option[Gen] = sql match {
    case CastDate(base) => Some(Gen(base, utcDate, "DAY"))
    case DateTrunc(unit, base) =>
      // refuse unknown units up front so derive() stays fail-open
      if (truncated(unit, Instant.EPOCH).isEmpty) None
      else Some(Gen(base, v => truncated(unit, v), unit))
    case YearOf(base) =>
      Some(Gen(base, v => utcDate(v).map(d => d.getYear: Any), "YEAR"))
    case DateFmt(base, fmt) if MonotoneFormats.contains(fmt) =>
      val f = DateTimeFormatter.ofPattern(fmt)
      val unit = fmt match {
        case "yyyy-MM-dd" => "DAY"
        case "yyyy-MM" => "MONTH"
        case _ => "YEAR"
      }
      Some(Gen(base, v =>
        toInstant(v).map(i =>
          LocalDateTime.ofInstant(i, ZoneOffset.UTC).format(f): Any), unit))
    case _ => None
  }

  /** Conds on generated PARTITION columns implied by `conds` on their
    * base columns. Callers AND these onto the original set — they are
    * derived, never a replacement (rows inside a surviving partition
    * still need the base predicate).
    */
  def derive(conds: Seq[Cond], schema: StructType,
      partitionColumns: Seq[String]): Seq[Cond] = {
    if (conds.isEmpty || partitionColumns.isEmpty) return Nil
    // the recognized families are timezone-sensitive: the writer
    // materialized partition values under ITS session timezone, and
    // this derivation converts literals in UTC — they only provably
    // agree when the reading session is pinned to UTC too (the
    // engine's harness default; a consistent-UTC pipeline is the
    // documented assumption). Any other session timezone derives
    // nothing: correct-but-unpruned beats silently dropped partitions.
    if (!sessionIsUtc) return Nil
    val gens: Seq[(String, Gen)] = schema.fields.toSeq
      .filter(f => partitionColumns.contains(f.name) &&
        f.metadata.contains(Constraints.GenerationKey))
      .flatMap(f =>
        parse(f.metadata.getString(Constraints.GenerationKey))
          .map(f.name -> _))
    for {
      (p, g) <- gens
      c <- conds if c.column == g.base
      d <- deriveOne(p, g, c)
    } yield d
  }

  private def sessionIsUtc: Boolean =
    try java.time.ZoneId
      .of(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      .normalized() == ZoneOffset.UTC
    catch { case scala.util.control.NonFatal(_) => false }

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
