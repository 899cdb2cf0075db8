package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Shingles.shinglesDistinctFast

object ProfD2 {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").config(graft.Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.load(spark, dir, "documents")
    t("warmup")(docs.count())
    val sh = docs
      .select(col("doc_id"), shinglesDistinctFast(col("text")).as("shs"))
      .select(col("doc_id"), size(col("shs")).cast("long").as("n"),
        explode(col("shs")).as("s"))
    t("shingle rows (native)")(sh.count())
    val posting = sh.groupBy("s")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
      .filter(size(col("ds")) > 1)
    t("postings")(posting.count())
    val pairs = posting
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.getField("doc_id").as("a"), x.getField("n").as("na"),
            y.getField("doc_id").as("b"), y.getField("n").as("nb")))))).as("p"))
    t("pair explode")(pairs.count())
    t("d2 end-to-end")(Dedup.ngramJaccardPairs(spark, dir).count())
    spark.stop()
  }
}
