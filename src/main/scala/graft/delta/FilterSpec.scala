package graft.delta

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Condition DSL: `(column, operator, value)` with
  * `operator ∈ {<,=,>,>=,<=,<>,in,not in}`, AND-combined — the
  * reference's `FilterType` (filter_by_meta.py:78,97-104). Values are
  * plain JVM values (String, Int, Long, Double, Boolean, LocalDate,
  * Instant, BigDecimal, null; Seq[_] for `in`/`not in`).
  */
final case class Cond(column: String, op: String, value: Any) {
  require(Cond.Ops.contains(op), s"Unknown operator: $op")

  /** Per-datatype sorted comparison keys of an `in` list, memoized
    * across the metadata-skipping loop: one sort per condition, then
    * each file's zone map probes in O(log n) instead of O(n) — the
    * difference between pruning a 100k-file table with a micro-batch-
    * sized in-list being free or costing 10^9 driver comparisons.
    * None = a list value failed to key (fail-open: no fast skip).
    */
  @transient private[delta] lazy val inKeyCache =
    scala.collection.concurrent.TrieMap
      .empty[DataType, Option[IndexedSeq[Any]]]

  /** Longest string in an `in` list (0 when none) — gates the fast
    * path against prefix-truncated string stats.
    */
  @transient private[delta] lazy val inMaxStrLen: Int = value match {
    case vs: Seq[_] =>
      vs.iterator.collect { case s: String => s.length }
        .foldLeft(0)(math.max)
    case _ => 0
  }
}

object Cond {
  val Ops: Set[String] = Set("<", "=", ">", ">=", "<=", "<>", "in", "not in")

  /** Legacy map form ⇒ `=` conjunctions (filter_by_meta.py:101-104). */
  def fromMap(m: Map[String, Any]): Seq[Cond] =
    m.map { case (k, v) => Cond(k, "=", v) }.toSeq

  private def toLit(v: Any): Column = v match {
    case d: LocalDate => lit(java.sql.Date.valueOf(d))
    case i: Instant => lit(java.sql.Timestamp.from(i))
    case l: LocalDateTime => lit(java.sql.Timestamp.valueOf(l))
    case other => lit(other)
  }

  /** Compile to a Catalyst predicate over the *logical* columns.
    * `=`/`<>` with NULL become IS [NOT] NULL (sql_utils.py:46-85).
    * Catalyst pushes the result through the per-file union into each
    * parquet scan (PushedFilters), so data-level filtering stays
    * distributed and codegen'd.
    *
    * When `schema` is given, numeric literals against DECIMAL columns
    * are converted to exact decimal literals (when lossless): a
    * double-vs-decimal comparison forces `cast(col as double)` which
    * blocks parquet predicate pushdown; the typed literal keeps the
    * filter on the scan.
    */
  def compile(conditions: Seq[Cond], schema: Option[StructType] = None): Column =
    conditions.foldLeft(lit(true)) { (acc, c) =>
      val base = col(s"`${c.column.replace("`", "``")}`")
      def decimalize(v: Any): Any = {
        val dtOpt = schema.flatMap(_.fields.find(_.name == c.column))
          .map(_.dataType)
        (dtOpt, v) match {
          case (Some(d: DecimalType), n @ (_: Double | _: Float | _: Int |
              _: Long | _: BigDecimal | _: java.math.BigDecimal)) =>
            try { // exact or bust — rounding would change semantics
              val bd = n match {
                case x: Double => BigDecimal(x)
                case x: Float => BigDecimal(x.toDouble)
                case x: Int => BigDecimal(x)
                case x: Long => BigDecimal(x)
                case x: BigDecimal => x
                case x: java.math.BigDecimal => BigDecimal(x)
              }
              bd.setScale(d.scale).underlying // throws if rounding needed
            } catch { case _: ArithmeticException => v }
          case _ => v
        }
      }
      val cv = c.value match {
        case vs: Seq[_] => vs.map(decimalize)
        case v => decimalize(v)
      }
      val p = (c.op, cv) match {
        case ("=", null) => base.isNull
        case ("<>", null) => base.isNotNull
        case ("=", v) => base === toLit(v)
        case ("<>", v) => base =!= toLit(v)
        case ("<", v) => base < toLit(v)
        case ("<=", v) => base <= toLit(v)
        case (">", v) => base > toLit(v)
        case (">=", v) => base >= toLit(v)
        case ("in", vs: Seq[_]) => base.isin(vs.map {
          case d: LocalDate => java.sql.Date.valueOf(d)
          case i: Instant => java.sql.Timestamp.from(i)
          case x => x
        }: _*)
        case ("not in", vs: Seq[_]) => !base.isin(vs.map {
          case d: LocalDate => java.sql.Date.valueOf(d)
          case i: Instant => java.sql.Timestamp.from(i)
          case x => x
        }: _*)
        case (op, v) => throw new IllegalArgumentException(s"Bad condition: $op $v")
      }
      acc && p
    }
}

/** Driver-side metadata pruning: decide from `add.partitionValues` and the
  * per-file `stats` zone maps whether a file can be skipped without
  * changing results. Fail-open: any doubt keeps the file
  * (filter_by_meta.py:196-198). Spec: `_can_filter`
  * (filter_by_meta.py:107-198) incl. the string-prefix truncation rule
  * for string min/max (Delta writers truncate string stats).
  */
object FileSkipping {

  /** True ⇒ the file provably contains no matching rows. */
  def canSkip(
      action: AddAction,
      conditions: Seq[Cond],
      physToField: Map[String, StructField],
      logToPhys: Map[String, String]): Boolean =
    try {
      conditions.exists { c =>
        val phys = logToPhys.getOrElse(c.column, c.column)
        val dt = physToField.get(phys).map(_.dataType).getOrElse(StringType)
        partitionSkip(action, c, phys, dt) || statsSkip(action, c, phys, dt)
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  /** True ⇒ EVERY row of the file provably matches EVERY condition.
    * Only a partition value can prove that (one concrete value per file,
    * unlike a min/max range), so any condition on a non-partition
    * column — or any parse/representation doubt — answers false.
    * Fail-closed mirror of [[canSkip]] (which is fail-open):
    * `DeltaWriter.replaceWhere` removes files WHOLE on this answer, and
    * a false positive would drop rows outside the predicate.
    */
  def provablyAllMatch(
      action: AddAction,
      conditions: Seq[Cond],
      physToField: Map[String, StructField],
      logToPhys: Map[String, String]): Boolean =
    try {
      conditions.forall { c =>
        val phys = logToPhys.getOrElse(c.column, c.column)
        val dt = physToField.get(phys).map(_.dataType).getOrElse(StringType)
        action.partitionValueFor(phys, c.column) match {
          case None => false // not a partition column here — unprovable
          case Some(pvOpt) =>
            val pv = pvOpt.orNull
            def key(v: Any): Option[Any] =
              try ordKey(dt, v)
              catch { case scala.util.control.NonFatal(_) => None }
            lazy val pvKey: Option[Any] =
              if (pv == null) None
              else
                try ordKey(dt, PartitionValues.deserialize(pv, dt))
                catch { case scala.util.control.NonFatal(_) => None }
            // provable three-valued comparisons; None/parse failure ⇒ false
            def provablySame(v: Any): Boolean =
              if (v == null || pv == null) v == null && pv == null
              else (for { pk <- pvKey; vk <- key(v) }
                yield compareKeys(pk, vk) == 0).getOrElse(false)
            def provablyDifferent(v: Any): Boolean =
              if (v == null || pv == null) false // NULL <> x is never TRUE
              else (for { pk <- pvKey; vk <- key(v) }
                yield compareKeys(pk, vk) != 0).getOrElse(false)
            (c.op, c.value) match {
              // Cond.compile turns = / <> with NULL into IS [NOT] NULL
              case ("=", null) => pv == null
              case ("=", v) => provablySame(v)
              case ("<>", null) => pv != null
              case ("<>", v) => provablyDifferent(v)
              // the compiled isin evaluates NULL IN (...) to NULL (not
              // TRUE) — a null partition value or a null list element
              // never proves a match
              case ("in", vs: Seq[_]) =>
                pv != null && vs.exists(v => v != null && provablySame(v))
              case ("not in", vs: Seq[_]) =>
                // x NOT IN (..., NULL) is never TRUE; empty list stays
                // fail-closed rather than relying on engine edge cases
                pv != null && vs.nonEmpty &&
                  vs.forall(v => v != null && provablyDifferent(v))
              case (op, v) if rangeOps(op) =>
                if (pv == null || v == null) false
                else (for { pk <- pvKey; vk <- key(v) } yield {
                  val x = compareKeys(pk, vk)
                  op match {
                    case ">" => x > 0
                    case ">=" => x >= 0
                    case "<" => x < 0
                    case "<=" => x <= 0
                  }
                }).getOrElse(false)
              case _ => false
            }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  // ---- partition pruning (filter_by_meta.py:117-154) ----

  private def partitionSkip(a: AddAction, c: Cond, phys: String, dt: DataType): Boolean =
    a.partitionValues.get(phys) match {
      case None => false
      case Some(pvOpt) =>
        val pv = pvOpt.orNull
        def ser(v: Any): String = PartitionValues.serialize(v, dt)
        // Equality in the TYPED domain when both sides parse: serialized
        // strings vary across writers ('1.50' vs '1.5' for decimal,
        // fraction-trimming for timestamps) and a string mismatch would
        // skip a file whose rows DO match — fail-closed. String compare is
        // only the fallback for non-orderable types.
        lazy val pvKey: Option[Any] =
          try ordKey(dt, PartitionValues.deserialize(pv, dt))
          catch { case scala.util.control.NonFatal(_) => None }
        def sameValue(v: Any): Boolean =
          if (pv == null || v == null) pv == null && v == null
          else (for { pk <- pvKey; vk <- ordKey(dt, v) }
            yield compareKeys(pk, vk) == 0).getOrElse(pv == ser(v))
        (c.op, c.value) match {
          case ("in", vs: Seq[_]) => !vs.exists(sameValue)
          case ("not in", vs: Seq[_]) => vs.exists(sameValue)
          case ("=", v) => !sameValue(v)
          case ("<>", v) => sameValue(v)
          case (op, _) if rangeOps(op) && pv == null => true
          case (op, v) if rangeOps(op) =>
            // compare in the column's domain, not as strings
            val cmp = for {
              pk <- ordKey(dt, PartitionValues.deserialize(pv, dt))
              vk <- ordKey(dt, v)
            } yield compareKeys(pk, vk)
            cmp.exists { x =>
              op match {
                case ">" => x <= 0
                case ">=" => x < 0
                case "<" => x >= 0
                case "<=" => x > 0
              }
            }
          case _ => false
        }
    }

  private val rangeOps = Set("<", "<=", ">", ">=")

  // ---- stats skipping (filter_by_meta.py:81-94,156-193) ----

  private def statsSkip(a: AddAction, c: Cond, phys: String, dt: DataType): Boolean = {
    val stats = a.parsedStats.getOrElse(return false)
    if (stats.numRecords.contains(0L)) return true
    val numRecords = stats.numRecords
    val minK = stats.minValues.get(phys).flatMap(jsonKey(dt, _))
    val maxK = stats.maxValues.get(phys).flatMap(jsonKey(dt, _))
    val nullCount = stats.nullCount.get(phys)
    val minStr = stats.minValues.get(phys).collect {
      case n if n.isTextual => n.asText
    }

    def valueSkips(v: Any): Boolean = {
      if (v != null && numRecords.isDefined && numRecords == nullCount) return true
      if (nullCount.contains(0L) && v == null) return true
      if (v == null) return false
      // string stats may be prefix-truncated: compare on the prefix
      val vAdj: Any = (v, minStr) match {
        case (s: String, Some(m)) => s.take(m.length)
        case _ => v
      }
      (minK, maxK, ordKey(dt, vAdj)) match {
        case (Some(mn), Some(mx), Some(vk)) =>
          compareKeys(vk, mn) < 0 || compareKeys(vk, mx) > 0
        case _ => false
      }
    }

    /** Large-in-list fast path: binary-search the condition's cached
      * sorted keys against the file's [min, max] instead of walking
      * every value per file. Semantics identical to
      * `vs.forall(valueSkips)`: a null list value blocks the skip
      * unless the file has no nulls; an all-null file skips every
      * non-null value; string stats only qualify when provably
      * untruncated (min at least as long as every listed value —
      * otherwise the per-value prefix adjustment must run).
      */
    def fastInSkip(vs: Seq[_]): Boolean = {
      if (vs.exists(_ == null) && !nullCount.contains(0L)) return false
      if (numRecords.isDefined && numRecords == nullCount) return true
      val untruncated = dt match {
        case StringType => minStr.exists(_.length >= c.inMaxStrLen)
        case _ => true
      }
      if (!untruncated) return vs.forall(valueSkips)
      val keys = c.inKeyCache.getOrElseUpdate(dt, {
        val nn = vs.filter(_ != null)
        val ks = nn.flatMap(v => ordKey(dt, v))
        if (ks.size != nn.size) None // unkeyable value: abstain, fail open
        else Some(ks.sortWith(compareKeys(_, _) < 0).toIndexedSeq)
      })
      (keys, minK, maxK) match {
        case (Some(ks), Some(mn), Some(mx)) =>
          // skip iff no listed key falls inside [mn, mx]
          var lo = 0; var hi = ks.length
          while (lo < hi) { // first key >= mn
            val mid = (lo + hi) >>> 1
            if (compareKeys(ks(mid), mn) < 0) lo = mid + 1 else hi = mid
          }
          lo == ks.length || compareKeys(ks(lo), mx) > 0
        case _ => false
      }
    }

    (c.op, c.value) match {
      case ("in", vs: Seq[_]) if vs.size >= 16 => fastInSkip(vs)
      case ("in", vs: Seq[_]) => vs.nonEmpty && vs.forall(valueSkips)
      case ("=", v) => valueSkips(v)
      case ("<", v) =>
        minK.zip(ordKey(dt, v)).exists { case (mn, vk) => compareKeys(vk, mn) <= 0 }
      case ("<=", v) =>
        minK.zip(ordKey(dt, v)).exists { case (mn, vk) => compareKeys(vk, mn) < 0 }
      case (">", v) =>
        maxK.zip(ordKey(dt, v)).exists { case (mx, vk) => compareKeys(vk, mx) >= 0 }
      case (">=", v) =>
        maxK.zip(ordKey(dt, v)).exists { case (mx, vk) => compareKeys(vk, mx) > 0 }
      // `not in` can only be skipped when EVERY row provably equals a
      // listed value (min==max==v): zone maps rarely prove that, and the
      // reference's any-value-out-of-range rule is inverted (it would
      // drop files whose rows all MATCH the predicate) — fail open.
      case ("not in", vs: Seq[_]) =>
        (minK, maxK) match {
          case (Some(mn), Some(mx)) if compareKeys(mn, mx) == 0 &&
              !nullCount.exists(_ > 0L) =>
            vs.exists(v => ordKey(dt, v).exists(vk => compareKeys(vk, mn) == 0))
          case _ => false
        }
      case _ => false
    }
  }

  // ---- comparison domain ----
  // Everything orderable collapses to BigDecimal (numeric/temporal/bool)
  // or String; cross-family comparisons abstain (fail-open).

  private def ordKey(dt: DataType, v: Any): Option[Any] = v match {
    case null => None
    case _ => dt match {
      case _: NumericType => Some(toBig(v))
      case BooleanType => Some(BigDecimal(if (v.asInstanceOf[Boolean]) 1 else 0))
      case DateType => v match {
        case d: LocalDate => Some(BigDecimal(d.toEpochDay))
        case d: java.sql.Date => Some(BigDecimal(d.toLocalDate.toEpochDay))
        case s: String => Some(BigDecimal(LocalDate.parse(s).toEpochDay))
        case _ => None
      }
      case TimestampType | TimestampNTZType =>
        // microsecond precision — Spark's timestamp resolution; millis
        // would collapse sub-ms differences and skip files wrongly
        def micros(i: Instant): BigDecimal =
          BigDecimal(i.getEpochSecond) * 1000000L + i.getNano / 1000L
        v match {
          case i: Instant => Some(micros(i))
          case t: java.sql.Timestamp => Some(micros(t.toInstant))
          case l: LocalDateTime => Some(micros(l.toInstant(ZoneOffset.UTC)))
          case s: String => parseTs(s).map(micros)
          case _ => None
        }
      case StringType => Some(v.toString)
      case _ => None
    }
  }

  private def toBig(v: Any): BigDecimal = v match {
    case b: BigDecimal => b
    case b: java.math.BigDecimal => BigDecimal(b)
    case n: Byte => BigDecimal(n.toInt)
    case n: Short => BigDecimal(n.toInt)
    case n: Int => BigDecimal(n)
    case n: Long => BigDecimal(n)
    case n: Float => BigDecimal(n.toDouble)
    case n: Double => BigDecimal(n)
    case s: String => BigDecimal(s)
    case other => BigDecimal(other.toString)
  }

  private[graft] def parseTs(s: String): Option[Instant] =
    try Some(Instant.parse(s))
    catch {
      case _: Exception =>
        try Some(LocalDateTime.parse(s.replace(" ", "T")).toInstant(ZoneOffset.UTC))
        catch {
          case _: Exception =>
            // date-only strings: the stats of a DATE column widened to
            // timestamp (typeWidening) — midnight is exact for both the
            // min and max bound, because every old value IS a midnight
            try Some(LocalDate.parse(s).atStartOfDay.toInstant(ZoneOffset.UTC))
            catch { case _: Exception => None }
        }
    }

  private def jsonKey(dt: DataType, n: JsonNode): Option[Any] =
    if (n == null || n.isNull) None
    else if (n.isNumber) dt match {
      case StringType => Some(n.asText)
      case _ => Some(BigDecimal(n.decimalValue))
    }
    else if (n.isBoolean) Some(BigDecimal(if (n.asBoolean) 1 else 0))
    else if (n.isTextual) ordKey(dt, n.asText) match {
      case some @ Some(_) if dt != StringType => some
      case _ => Some(n.asText)
    }
    else None

  private def compareKeys(a: Any, b: Any): Int = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x.compare(y)
    case (x: String, y: String) => x.compareTo(y)
    case (x, y) => x.toString.compareTo(y.toString)
  }
}
