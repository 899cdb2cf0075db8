package graft.types

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.storage.{GraftTable, GraftTableOptions}
import graft.types.PgTypes._

/** Transliterates the reference `data_types` suite (FIXTURES.md §3,
  * `/root/reference/input/data_types.source`): parse the PG text forms,
  * round-trip through the columnar table layer, and verify identity —
  * including the extreme/null/empty cases the reference CSVs pin down. */
class PgTypesSpec extends SparkSpec {

  private def roundTrip(schema: StructType, rows: Seq[Row]): Seq[Row] = {
    val loc = tmpDir("pgtypes") + "/t"
    val t = GraftTable.create(spark, loc, schema, GraftTableOptions())
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema))
    val back = t.read().collect().toSeq
    GraftTable.drop(loc)
    back
  }

  test("array types round-trip with extremes, empties, null elements (3a/3f)") {
    val schema = StructType(Seq(
      StructField("int_array", ArrayType(IntegerType)),
      StructField("bigint_array", ArrayType(LongType)),
      StructField("text_array", ArrayType(StringType))))
    val rows = Seq(
      Row(parseIntArray("{-2147483648,2147483647}"),
        parseLongArray("{-9223372036854775808,9223372036854775807}"),
        parseArray("{one,two}")),
      Row(parseIntArray("{}"), parseLongArray("{}"), parseArray("{\"\"}")),
      Row(parseIntArray("{NULL}"), null, parseArray("{a,NULL,\"x,y\"}")))
    val back = roundTrip(schema, rows)
    assert(back.toSet === rows.toSet)
    // the parsed forms themselves
    assert(parseIntArray("{-2147483648,2147483647}") ===
      Seq(Integer.MIN_VALUE, Integer.MAX_VALUE))
    assert(parseArray("{\"\"}") === Seq(""))
    assert(parseArray("{a,NULL,\"x,y\"}") === Seq("a", null, "x,y"))
  }

  test("char(n) blank padding matches PG semantics (§1 'XA ')") {
    assert(charN("XA", 3) === "XA ")
    assert(charN("XYZ", 3) === "XYZ")
    assert(charNEquals("XA ", "XA"))
    val schema = StructType(Seq(StructField("country", StringType)))
    val back = roundTrip(schema, Seq(Row(charN("XA", 3))))
    assert(back.head.getString(0) === "XA ") // trailing space preserved
  }

  test("datetime types incl. infinity sentinels (3b)") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("iv_micros", LongType)))
    val rows = Seq(
      Row(parseTimestamp("2000-01-01 00:00:00"),
        parseIntervalMicros("@ 4 hours 10 mins"): java.lang.Long),
      Row(parseTimestamp("infinity"),
        parseIntervalMicros("@ 1 day 2 hours ago"): java.lang.Long))
    val back = roundTrip(schema, rows)
    assert(back.map(_.getAs[Timestamp](0)).toSet === Set(
      Timestamp.valueOf("2000-01-01 00:00:00"), TsInfinity))
    assert(back.map(_.getLong(1)).toSet ===
      Set(4L * 3600000000L + 600000000L, -(86400000000L + 2 * 3600000000L)))
  }

  test("enum + composite types (3c)") {
    assert(checkEnum("b", Set("a", "b", "c")) === "b")
    intercept[IllegalArgumentException](checkEnum("z", Set("a", "b", "c")))
    assert(parseComposite("(2,b)") === Seq("2", "b"))
    assert(parseComposite("(,)") === Seq(null, null))
    assert(parseComposite("(1,\"a,b\")") === Seq("1", "a,b"))
    val schema = StructType(Seq(
      StructField("enum", StringType),
      StructField("composite", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))))))
    val c = parseComposite("(2,b)")
    val rows = Seq(
      Row("a", Row(c.head.toInt, c(1))),
      Row("b", Row(null, null)))
    assert(roundTrip(schema, rows).toSet === rows.toSet)
  }

  test("range types incl. empty and unbounded (3d)") {
    assert(parseRange("empty") === Row(null, null, false, false, true))
    assert(parseRange("[1,10)") === Row("1", "10", true, false, false))
    assert(parseRange("[1,)") === Row("1", null, true, false, false))
    assert(parseRange("(,)") === Row(null, null, false, false, false))
    val schema = StructType(Seq(StructField("r", rangeSchema(IntegerType))))
    val rows = Seq(
      Row(Row(1, 10, true, false, false)),
      Row(Row(null, null, false, false, true)))
    assert(roundTrip(schema, rows).toSet === rows.toSet)
  }

  test("other types: bool, bytea, money, inet, bit, uuid, json (3e)") {
    assert(parseBytea("\\xdeadbeef").toSeq === Seq(0xde, 0xad, 0xbe, 0xef).map(_.toByte))
    assert(formatBytea(parseBytea("\\xdeadbeef")) === "\\xdeadbeef")
    assert(parseMoney("$1.00").toPlainString === "1.00")
    assert(formatMoney(parseMoney("$1,234.50")) === "$1234.50")
    assert(formatMoney(parseMoney("-$2.00")) === "-$2.00")
    assert(checkUuid("a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11") != null)
    intercept[IllegalArgumentException](checkUuid("nope"))
    assert(checkBit("10101", 5) === "10101")
    assert(checkBit("", 5) === "")
    intercept[IllegalArgumentException](checkBit("210", 5))
    assert(checkInet("192.168.1.1/24") != null)
    val schema = StructType(Seq(
      StructField("bool", BooleanType),
      StructField("bytea", BinaryType),
      StructField("money", DecimalType(19, 2)),
      StructField("uuid", StringType),
      StructField("json", StringType)))
    val rows = Seq(
      Row(true, parseBytea("\\xdeadbeef"), BigDecimal(parseMoney("$1.00")),
        "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11", """{"k": 1}"""),
      Row(null, null, null, null, null))
    val back = roundTrip(schema, rows)
    assert(back.size === 2)
    val nonNull = back.find(!_.isNullAt(0)).get
    assert(nonNull.getAs[Array[Byte]](1).toSeq === parseBytea("\\xdeadbeef").toSeq)
    assert(nonNull.getDecimal(2).compareTo(parseMoney("$1.00")) === 0)
    assert(back.exists(r => (0 until 5).forall(r.isNullAt))) // all-NULL row (3f)
  }
}
