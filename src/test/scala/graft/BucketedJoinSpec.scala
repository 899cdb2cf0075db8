package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the 100 TB pattern for repeated
  * large-large joins on a stable key: both sides pre-bucketed on the
  * join key join with ZERO shuffle exchanges (only per-bucket sorts),
  * versus two full exchanges for the unbucketed plan. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, sf("sf0.001"), "orders")
      val lineitem = Tables.load(spark, sf("sf0.001"), "lineitem")
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_bkt")
      lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_bkt")

      val joined = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // join + agg both run on the bucket partitioning: no exchange
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found ${shuffles.size} exchanges")

      // and the result matches the unbucketed join
      val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
