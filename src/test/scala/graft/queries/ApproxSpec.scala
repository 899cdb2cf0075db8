package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** q37 has no cross-engine oracle (HLL sketches are engine-specific);
  * assert the estimates against exact counts within HLL's default
  * relative error (~5% at rsd 0.05). */
class ApproxSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact") {
    val dir = sf("sf0.01")
    val approx = ExtendedQueries.q37ApproxDistinct(spark, dir).collect().head
    val li = Tables.load(spark, dir, "lineitem")
    val exact = li.agg(
      countDistinct(col("l_orderkey")), countDistinct(col("l_partkey"))).collect().head
    for (i <- 0 until 2) {
      val a = approx.getLong(i).toDouble
      val e = exact.getLong(i).toDouble
      assert(math.abs(a - e) / e < 0.05, s"col $i: approx $a vs exact $e")
    }
  }
}
