package graft.types

import java.math.{BigDecimal => JBigDecimal}
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** PostgreSQL type-fidelity layer (SURVEY.md §1.3 + FIXTURES.md §3): the
  * text-form parsers and Spark encodings needed to round-trip every type
  * family the reference's `data_types` regression suite exercises
  * (`/root/reference/input/data_types.source`). These run at the load
  * boundary — the role PG's COPY input functions play in the reference
  * (`cstore_fdw.c:586-634`) — producing ordinary Spark values; everything
  * downstream is plain columnar data.
  */
object PgTypes {

  // -- char(n): blank-padded (FIXTURES.md §1 'XA ') ---------------------

  /** PG `char(n)` stores blank-padded values; goldens include the
    * trailing spaces (`expected/query.out:31-40`). */
  def charN(v: String, n: Int): String =
    if (v == null) null
    else if (v.length >= n) v
    else v + (" " * (n - v.length))

  /** PG compares bpchar with trailing blanks ignored. */
  def charNEquals(a: String, b: String): Boolean = {
    def strip(s: String) = if (s == null) null else s.replaceAll(" +$", "")
    strip(a) == strip(b)
  }

  // -- arrays: '{1,2,3}', '{}', '{NULL}', '{""}' ------------------------

  /** Parse a PG array literal. Handles empty arrays, NULL elements,
    * quoted elements (including the empty string), and escaped quotes —
    * the `data/array_types.csv` + `data/null_values.csv` surface. */
  def parseArray(s: String): Seq[String] = {
    if (s == null) return null
    val t = s.trim
    require(t.startsWith("{") && t.endsWith("}"), s"not an array literal: $s")
    val body = t.substring(1, t.length - 1)
    if (body.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var i = 0
    val cur = new StringBuilder
    var quoted = false
    var wasQuoted = false
    def flush(): Unit = {
      val v = cur.toString
      out += (if (!wasQuoted && v == "NULL") null else v)
      cur.clear(); wasQuoted = false
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (quoted) {
        if (c == '\\') { cur += body.charAt(i + 1); i += 1 }
        else if (c == '"') quoted = false
        else cur += c
      } else c match {
        case '"' => quoted = true; wasQuoted = true
        case ',' => flush()
        case other => cur += other
      }
      i += 1
    }
    flush()
    out.result()
  }

  def parseIntArray(s: String): Seq[Integer] =
    Option(parseArray(s)).map(_.map(v => if (v == null) null else Integer.valueOf(v))).orNull

  def parseLongArray(s: String): Seq[java.lang.Long] =
    Option(parseArray(s)).map(_.map(v =>
      if (v == null) null else java.lang.Long.valueOf(v))).orNull

  // -- composite: '(2,b)', '(,)' (FIXTURES.md §3c/§3f) ------------------

  /** Parse a PG composite literal into field strings (null for empty). */
  def parseComposite(s: String): Seq[String] = {
    if (s == null) return null
    val t = s.trim
    require(t.startsWith("(") && t.endsWith(")"), s"not a composite literal: $s")
    val body = t.substring(1, t.length - 1)
    val out = Seq.newBuilder[String]
    var i = 0
    val cur = new StringBuilder
    var quoted = false
    var sawAny = false
    def flush(): Unit = {
      val v = cur.toString
      out += (if (v.isEmpty && !sawAny) null else v)
      cur.clear(); sawAny = false
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (quoted) {
        if (c == '"' && i + 1 < body.length && body.charAt(i + 1) == '"') {
          cur += '"'; i += 1
        } else if (c == '"') quoted = false
        else cur += c
      } else c match {
        case '"' => quoted = true; sawAny = true
        case ',' => flush()
        case other => cur += other; sawAny = true
      }
      i += 1
    }
    flush()
    out.result()
  }

  // -- ranges: '[1,10)', 'empty', '[1,)', '(,)' (FIXTURES.md §3d) -------

  /** Spark encoding of a PG range: struct(lower, upper, lower_inc,
    * upper_inc, is_empty) with open bounds as nulls. */
  def rangeSchema(element: DataType): StructType = StructType(Seq(
    StructField("lower", element, nullable = true),
    StructField("upper", element, nullable = true),
    StructField("lower_inc", BooleanType, nullable = false),
    StructField("upper_inc", BooleanType, nullable = false),
    StructField("is_empty", BooleanType, nullable = false)))

  /** Parse a range literal into (lowerStr, upperStr, lowerInc, upperInc,
    * isEmpty); bound strings are null when unbounded. */
  def parseRange(s: String): Row = {
    if (s == null) return null
    val t = s.trim
    if (t.equalsIgnoreCase("empty")) return Row(null, null, false, false, true)
    val lowerInc = t.startsWith("[")
    val upperInc = t.endsWith("]")
    require(t.startsWith("[") || t.startsWith("("), s"bad range: $s")
    val body = t.substring(1, t.length - 1)
    val comma = body.indexOf(',')
    val lo = body.substring(0, comma).trim
    val hi = body.substring(comma + 1).trim
    Row(if (lo.isEmpty) null else lo, if (hi.isEmpty) null else hi,
      lowerInc && lo.nonEmpty, upperInc && hi.nonEmpty, false)
  }

  // -- money: '$1.00' ↔ Decimal(19,2) (FIXTURES.md §3e) -----------------

  def parseMoney(s: String): JBigDecimal =
    if (s == null) null
    else new JBigDecimal(s.replace("$", "").replace(",", "")).setScale(2)

  def formatMoney(d: JBigDecimal): String =
    if (d == null) null
    else {
      val v = d.setScale(2)
      if (v.signum() < 0) "-$" + v.negate().toPlainString else "$" + v.toPlainString
    }

  // -- bytea: '\xdeadbeef' ----------------------------------------------

  def parseBytea(s: String): Array[Byte] = {
    if (s == null) return null
    require(s.startsWith("\\x"), s"bad bytea literal: $s")
    s.drop(2).grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  def formatBytea(b: Array[Byte]): String =
    if (b == null) null else "\\x" + b.map(x => f"${x & 0xff}%02x").mkString

  // -- timestamps with ±infinity (FIXTURES.md §3b) ----------------------

  /** PG `infinity`/`-infinity` timestamps have no Spark analog; map to
    * the representable extremes as sentinels (documented lossy edge). */
  val TsInfinity: Timestamp = Timestamp.valueOf("9999-12-31 23:59:59.999999")
  val TsNegInfinity: Timestamp = Timestamp.valueOf("0001-01-01 00:00:00")

  def parseTimestamp(s: String): Timestamp = s match {
    case null => null
    case "infinity" => TsInfinity
    case "-infinity" => TsNegInfinity
    case other => Timestamp.valueOf(other.replace("T", " "))
  }

  // -- interval: POSTGRES_VERBOSE day-time subset -----------------------

  /** Parse '@ 1 day 2 hours 3 mins 4 secs [ago]' (intervalstyle
    * POSTGRES_VERBOSE, day-time subset) to microseconds. */
  def parseIntervalMicros(s: String): java.lang.Long = {
    if (s == null) return null
    var t = s.trim.stripPrefix("@").trim
    val neg = t.endsWith("ago")
    if (neg) t = t.stripSuffix("ago").trim
    val Unit = "(\\d+(?:\\.\\d+)?)\\s+(day|days|hour|hours|min|mins|minute|minutes|sec|secs|second|seconds)".r
    var micros = 0L
    for (m <- Unit.findAllMatchIn(t)) {
      val qty = m.group(1).toDouble
      val unit = m.group(2) match {
        case u if u.startsWith("day") => 86400000000L
        case u if u.startsWith("hour") => 3600000000L
        case u if u.startsWith("min") => 60000000L
        case _ => 1000000L
      }
      micros += (qty * unit).toLong
    }
    if (neg) -micros else micros
  }

  // -- validators: enum / inet / uuid / bit varying ---------------------

  def checkEnum(v: String, allowed: Set[String]): String = {
    if (v != null) require(allowed.contains(v), s"invalid enum value: $v")
    v
  }

  private val UuidRe = "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}".r
  def checkUuid(v: String): String = {
    if (v != null) require(UuidRe.matches(v), s"invalid uuid: $v")
    v
  }

  private val BitRe = "[01]*".r
  def checkBit(v: String, maxLen: Int): String = {
    if (v != null) {
      require(BitRe.matches(v), s"invalid bit string: $v")
      require(v.length <= maxLen, s"bit string too long: $v")
    }
    v
  }

  private val InetRe = "[0-9a-fA-F:.]+(/\\d+)?".r
  def checkInet(v: String): String = {
    if (v != null) require(InetRe.matches(v), s"invalid inet: $v")
    v
  }
}
