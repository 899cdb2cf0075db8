package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints red-flag operators per query (cartesian
  * products, broadcast-nested-loop joins over non-tiny inputs). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "whole-row-scan-for-agg" -> false
        ).collect { case (f, true) => f }
        val exchanges = "Exchange".r.findAllIn(plan).size
        println(f"[audit] $name%-22s exchanges=$exchanges%2d ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
