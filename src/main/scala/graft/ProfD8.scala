package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of d8 at sf0.1 to find the hot part. */
object ProfD8 {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    t("warmup")(docs.count())
    val k = 8
    val toks = split(col("text"), " ")
    val wins = when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
    val w = docs.select(col("doc_id"), explode(wins).as("win"))
    t("w explode")(w.count())
    t("w explode again")(w.count())
    val shared = w.groupBy("win")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .filter(col("lo") < col("hi")).select("win")
    t("shared")(shared.count())
    val tot = w.groupBy("doc_id").agg(count(lit(1)).as("n_win"))
    t("tot")(tot.count())
    val dup = w.join(shared, "win").groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    t("dup join")(dup.count())
    t("full")(operators.Dedup.d8WindowDedup(spark, dir).count())
    spark.stop()
  }
}
