package graft.storage

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Filtered-scan row estimation from ANALYZE output — the role the
  * reference's ANALYZE plays for PostgreSQL's planner, whose
  * `clauselist_selectivity` consumes the collected stats to cost a scan
  * (`cstore_fdw.c:1628-1638`, stats collected at `cstore_fdw.c:2061-2082`).
  *
  * The estimator mirrors the classic System-R / PostgreSQL rules over the
  * graft `_graft_stats.json` (min/max/ndv/null counts, min/max stored as
  * strings in Spark `cast(string)` form):
  *
  *  - equality: a value in the MCV list → its measured frequency; any
  *              other value → the non-MCV mass over the non-MCV ndv
  *              (PostgreSQL's eqsel over STATISTIC_KIND_MCV; without
  *              MCVs this degrades to the uniform `(1 - nullFrac) / ndv`)
  *  - IN list:  sum of the per-value equality estimates (capped at 1)
  *  - range:    piecewise over the ANALYZE equi-depth histogram bounds
  *              when collected (PG's ineq_histogram_selectivity — right
  *              on skewed domains where uniform interpolation is off by
  *              the skew factor); else linear interpolation inside
  *              [min, max], for every type with a numeric image
  *              (numerics, dates, timestamps, decimals); unparsable
  *              domains fall back to 1/3 — the `DEFAULT_INEQ_SEL`
  *              convention
  *  - IS NULL / IS NOT NULL: the measured null fraction
  *  - AND = product, OR = inclusion-exclusion, NOT = complement
  *  - anything else: 1.0 (never under-estimates what it can't see)
  */
object Selectivity {

  private val DefaultIneq = 1.0 / 3.0
  private val DefaultEq = 0.005

  /** Estimated fraction of rows satisfying `f`, in [0, 1]. */
  def estimate(f: Filter, stats: GraftTable.TableStats, schema: StructType): Double = {
    val n = math.max(1L, stats.rowCount).toDouble

    def col(c: String): Option[(DataType, GraftTable.ColumnStats)] =
      if (schema.fieldNames.contains(c)) stats.columns.get(c).map((schema(c).dataType, _))
      else None

    def nullFrac(c: String): Option[Double] =
      col(c).map { case (_, s) => math.min(1.0, s.nullCount.toDouble / n) }

    def notNull(c: String): Double = 1.0 - nullFrac(c).getOrElse(0.0)

    // Filter value rendered the way ANALYZE stores MCV keys (Spark
    // cast(string)) — ONLY for types whose rendering provably matches:
    // strings, integral types, booleans, dates. Timestamps (toString
    // appends '.0' / 'T..Z' variants), floats and decimals (trailing
    // zeros) render ambiguously; for those the MCV path must not run at
    // all — a spurious miss would hand a HOT value the near-zero
    // residual estimate, inverting the broadcast decision MCVs exist to
    // fix. None ⇒ uniform 1/ndv, the pre-MCV behavior.
    def mcvKey(v: Any): Option[String] = v match {
      case null => None
      case s: String => Some(s)
      case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
           _: java.lang.Long | _: java.lang.Boolean => Some(v.toString)
      case d: java.sql.Date => Some(d.toLocalDate.toString)
      case d: java.time.LocalDate => Some(d.toString)
      case _ => None
    }

    /** Equality selectivity, PG-style: a value found in the MCV list
      * gets its MEASURED frequency; a reliable-rendered miss gets the
      * non-MCV mass spread over the non-MCV distinct values — so a
      * filter on a hot key estimates large (broadcast refused) and one
      * on a rare key estimates small, from the same stats. */
    def eqSel(c: String, v: Any): Double = col(c) match {
      case Some((_, s)) if s.ndv > 0 =>
        mcvKey(v) match {
          case Some(key) if s.mcvs.nonEmpty =>
            s.mcvs.find(_._1 == key) match {
              case Some((_, cnt)) => math.min(1.0, cnt.toDouble / n)
              case None =>
                val mcvFrac = math.min(notNull(c), s.mcvs.map(_._2).sum / n)
                val restNdv = math.max(1.0, (s.ndv - s.mcvs.size).toDouble)
                math.max(0.0, notNull(c) - mcvFrac) / restNdv
            }
          case _ => notNull(c) / s.ndv.toDouble
        }
      case _ => DefaultEq
    }

    // Numeric image of a stored stat string / a pushed filter value, so
    // ranges interpolate uniformly (Date → epoch day, Timestamp → epoch
    // millis, Decimal/numerics → double).
    def statNum(dt: DataType, s: String): Option[Double] =
      if (s == null) None
      else try dt match {
        case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
             _: DecimalType => Some(s.toDouble)
        case DateType => Some(java.time.LocalDate.parse(s).toEpochDay.toDouble)
        case TimestampType | TimestampNTZType =>
          // ANALYZE renders the bound in the SESSION timezone — parse it
          // back in the same zone, not the JVM default, or every bound
          // shifts by the tz offset against the absolute filter value
          val zone = java.time.ZoneId.of(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
          val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
          Some(ldt.atZone(zone).toInstant.toEpochMilli.toDouble)
        case _ => None
      } catch { case _: RuntimeException => None }

    def valNum(v: Any): Option[Double] = v match {
      case null => None
      case x: java.lang.Number => Some(x.doubleValue())
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toDouble)
      case d: java.time.LocalDate => Some(d.toEpochDay.toDouble)
      case t: java.sql.Timestamp => Some(t.getTime.toDouble)
      case i: java.time.Instant => Some(i.toEpochMilli.toDouble)
      case d: BigDecimal => Some(d.toDouble)
      case _ => None
    }

    // Fraction of rows at or below `x` per the equi-depth histogram
    // bounds (PG's ineq_histogram_selectivity): each bucket holds 1/B of
    // the rows; position inside the containing bucket interpolates.
    // Repeated bounds (a heavy value spanning buckets) collapse to full
    // buckets below x via lastIndexWhere.
    def histFrac(s: GraftTable.ColumnStats, x: Double): Option[Double] = {
      val bs = s.hist.flatMap(b => b.toDoubleOption)
      if (bs.length < 2 || bs.last <= bs.head) None
      else if (x <= bs.head) Some(0.0)
      else if (x >= bs.last) Some(1.0)
      else {
        val i = bs.lastIndexWhere(_ <= x)
        val lo = bs(i); val hi = bs(i + 1)
        val within = if (hi > lo) (x - lo) / (hi - lo) else 0.0
        Some((i + within) / (bs.length - 1))
      }
    }

    // PG's convert_string_to_scalar: a string's first bytes as a double
    // in [0, 1), so string ranges interpolate in a proxy domain. Bounds
    // and probe strip their COMMON PREFIX first — it carries no ordering
    // information and would crush the resolution (every 'cold_…' value
    // would collapse onto one proxy point).
    def strScalar(str: String): Double = {
      val b = str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var x = 0.0; var sc = 1.0 / 256.0; var i = 0
      while (i < b.length && i < 8) { x += (b(i) & 0xff) * sc; sc /= 256.0; i += 1 }
      x
    }
    def lcp(a: String, b: String): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      i
    }
    // Position of `v` inside the string bracket [lo, hi], by byte proxy.
    def strWithin(lo: String, hi: String, v: String): Double =
      if (v <= lo) 0.0
      else if (v >= hi) 1.0
      else {
        val p = lcp(lo, hi)
        val l = strScalar(lo.substring(math.min(p, lo.length)))
        val h = strScalar(hi.substring(math.min(p, hi.length)))
        val x = strScalar(v.substring(math.min(p, v.length)))
        if (h <= l) 0.5 else math.max(0.0, math.min(1.0, (x - l) / (h - l)))
      }
    // String range fraction: rank within the ANALYZE equi-depth bounds
    // (each bucket holds 1/B of the rows; the containing bucket
    // interpolates by proxy), else proxy interpolation across [min, max].
    def strFrac(s: GraftTable.ColumnStats, v: String): Option[Double] = {
      val bs = s.hist
      if (bs.length >= 2) {
        if (v <= bs.head) Some(0.0)
        else if (v >= bs.last) Some(1.0)
        else {
          val i = bs.lastIndexWhere(_ <= v)
          Some((i + strWithin(bs(i), bs(i + 1), v)) / (bs.length - 1))
        }
      } else if (s.min != null && s.max != null) Some(strWithin(s.min, s.max, v))
      else None
    }

    // Fraction of the domain at or below `v`: histogram-piecewise when
    // ANALYZE collected bounds, else linear inside [min, max]. Strings
    // dispatch to the rank-based path — their bounds are raw values,
    // not numeric images.
    def rangeFrac(c: String, v: Any): Option[Double] = col(c).flatMap { case (dt, s) =>
      (dt, v) match {
        case (StringType, str: String) => strFrac(s, str)
        case _ =>
          valNum(v).flatMap { x =>
            histFrac(s, x).orElse(for {
              mn <- statNum(dt, s.min)
              mx <- statNum(dt, s.max)
            } yield
              if (mx <= mn) (if (x >= mx) 1.0 else 0.0)
              else math.max(0.0, math.min(1.0, (x - mn) / (mx - mn))))
          }
      }
    }

    def clamp(d: Double): Double = math.max(0.0, math.min(1.0, d))

    f match {
      case And(l, r) => clamp(estimate(l, stats, schema) * estimate(r, stats, schema))
      case Or(l, r) =>
        val a = estimate(l, stats, schema); val b = estimate(r, stats, schema)
        clamp(a + b - a * b)
      case Not(c) => clamp(1.0 - estimate(c, stats, schema))
      case EqualTo(c, v) => clamp(eqSel(c, v))
      case EqualNullSafe(c, v) => if (v == null) nullFrac(c).getOrElse(DefaultEq) else clamp(eqSel(c, v))
      case In(c, vs) if vs != null =>
        // disjoint values: per-value MCV-aware eq estimates sum — over
        // the DISTINCT values only (SQL IN is a set membership test;
        // duplicate literals must not double-count, and MCV frequencies
        // make the overestimate large for a repeated hot key)
        clamp(vs.distinct.map(v => eqSel(c, v)).sum)
      case GreaterThan(c, v) =>
        clamp(notNull(c) * rangeFrac(c, v).map(1.0 - _).getOrElse(DefaultIneq))
      case GreaterThanOrEqual(c, v) =>
        clamp(notNull(c) * rangeFrac(c, v).map(1.0 - _).getOrElse(DefaultIneq))
      case LessThan(c, v) =>
        clamp(notNull(c) * rangeFrac(c, v).getOrElse(DefaultIneq))
      case LessThanOrEqual(c, v) =>
        clamp(notNull(c) * rangeFrac(c, v).getOrElse(DefaultIneq))
      case IsNull(c) => nullFrac(c).getOrElse(DefaultEq)
      case IsNotNull(c) => notNull(c)
      case _ => 1.0
    }
  }

  /** Estimated surviving rows for a conjunction of pushed filters. */
  def estimateRows(filters: Seq[Filter], stats: GraftTable.TableStats,
      schema: StructType): Long = {
    val sel = filters.foldLeft(1.0)((acc, f) => acc * estimate(f, stats, schema))
    math.max(1L, math.ceil(stats.rowCount * sel).toLong)
  }
}
