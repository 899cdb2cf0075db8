package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salting must be a pure plan rewrite: identical results to the
  * unsalted forms on a deliberately skewed dataset (one key holding
  * half the rows). */
class SaltingSpec extends SparkSpec {

  private lazy val skewed = {
    import spark.implicits._
    val hot = (1 to 50000).map(i => ("hot", i.toLong))
    val rest = (1 to 10000).map(i => (s"k${i % 100}", i.toLong))
    (hot ++ rest).toDF("k", "v")
  }

  test("saltedAggregate == plain aggregate on skewed keys") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Salting.saltedAggregate(skewed, Seq("k"), buckets = 16,
      aggs = Map(
        "s" -> (sum("v"), (p: String) => sum(col(p))),
        "c" -> (count(lit(1)), (p: String) => sum(col(p)))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedDistinctCount == plain count(DISTINCT) under a hot group key") {
    import spark.implicits._
    // one hot group ("hot": 5000 rows, 500 distinct users), many cold ones
    val rows = (0 until 5000).map(i => ("hot", (i % 500).toLong)) ++
      (0 until 200).map(i => (s"cold$i", (i % 7).toLong))
    val df = rows.toDF("k", "u")
    val plain = df.groupBy("k")
      .agg(count_distinct(col("u")).as("n"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Salting.saltedDistinctCount(df, Seq("k"), "u", "n", buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedJoin == plain join on a skewed probe side") {
    import spark.implicits._
    val dim = (0 until 100).map(i => (s"k$i", s"name$i")).toDF("dk", "dname")
      .union(Seq(("hot", "hotname")).toDF("dk", "dname"))
    val plain = skewed.join(dim, skewed("k") === dim("dk"))
      .select("k", "v", "dname")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Salting.saltedJoin(skewed, dim, "k", "dk", buckets = 8)
      .select("k", "v", "dname")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
  }
}
