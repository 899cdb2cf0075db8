package graft.storage

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property test (SURVEY.md §5 plan): write→read identity through the
  * columnar layer for generated rows over a mixed-type schema, including
  * nulls, empty strings/arrays, and numeric extremes — the reference's
  * data_types surface as a property rather than fixtures. */
class RoundTripPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("arr", ArrayType(LongType)),
    StructField("st", StructType(Seq(
      StructField("x", IntegerType), StructField("y", StringType))))))

  private val genValue: Gen[Row] = for {
    i <- Gen.oneOf(Gen.const(null), Gen.oneOf(
      Int.MinValue, Int.MaxValue, 0, -1, 42).map(Integer.valueOf))
    l <- Gen.oneOf(Gen.const(null), Gen.oneOf(
      Long.MinValue, Long.MaxValue, 0L, -1L).map(java.lang.Long.valueOf))
    d <- Gen.oneOf(Gen.const(null), Gen.oneOf(
      Double.MinPositiveValue, Double.MaxValue, -0.0, 0.0, 3.14,
      Double.NegativeInfinity, Double.PositiveInfinity).map(java.lang.Double.valueOf))
    s <- Gen.oneOf(Gen.const(null), Gen.oneOf("", " ", "x", "åß∂", "a,b", "\"q\""))
    b <- Gen.oneOf(Gen.const(null), Gen.oneOf(true, false).map(java.lang.Boolean.valueOf))
    arr <- Gen.oneOf(Gen.const(null), Gen.const(Seq.empty[Any]),
      Gen.const(Seq(1L, null, Long.MaxValue)))
    st <- Gen.oneOf(Gen.const(null), Gen.const(Row(1, "y")), Gen.const(Row(null, null)))
  } yield Row(i, l, d, s, b, arr, st)

  test("generated rows round-trip identically (100 rows x 5 schema-shuffles)") {
    var seed = Seed(42L)
    val rows = (0 until 100).flatMap { _ =>
      seed = seed.next
      genValue(Gen.Parameters.default, seed).toSeq
    }
    assert(rows.size >= 90) // generator shouldn't be degenerate
    val loc = tmpDir("roundtrip") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    val rdd: org.apache.spark.rdd.RDD[Row] = spark.sparkContext.parallelize(rows, 4)
    t.append(spark.createDataFrame(rdd, schema))
    val back = t.read().collect().toSeq
    GraftTable.drop(loc)

    def key(r: Row): String = r.toSeq.map {
      case null => "∅"
      case d: Double => if (d == 0.0 && 1 / d < 0) "-0.0" else d.toString
      case s: scala.collection.Seq[_] => s.mkString("[", ",", "]")
      case x => x.toString
    }.mkString("|")
    assert(back.map(key).sorted === rows.map(key).sorted)
  }
}
