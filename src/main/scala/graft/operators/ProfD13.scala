package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Shingles.shinglesFast

/** Stage-by-stage wall profile of d13's postings build (dev tooling,
  * like ProfD2/ProfD6). */
object ProfD13 {
  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
    val n = f
    println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs cpu ${(osBean.getProcessCpuTime-c0)/1e9}%6.2fs rows=$n")
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
    val tg = docs.select(col("doc_id"), explode(shinglesFast(col("text"), 3)).as("term"))
    t("trigram explode")(tg.count())
    val tf = tg.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    t("tf groupBy")(tf.count())
    val nDocs = docs.select(count(lit(1)).as("nd"))
    val dfBand = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= Dedup.TfidfDfCap)
      .crossJoin(broadcast(nDocs))
      .select(col("term"),
        round(log(col("nd").cast("double") / col("df").cast("double"))
          * lit(1000000.0)).cast("long").as("idfq"))
    t("df band")(dfBand.count())
    val w = tf.join(dfBand, "term")
      .select(col("doc_id"), col("term"), (col("tf") * col("idfq")).as("w"))
    t("weights join")(w.count())
    val wp = w.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("persist+count")(wp.count())
    val posting = wp.groupBy("term")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("w")))).as("ds"))
    t("posting lists")(posting.count())
    t("d13 end-to-end warm")(Dedup.d13TfidfCosine(spark, dir).count())
    t("d13 again")(Dedup.d13TfidfCosine(spark, dir).count())
    // dot-stage isolation (round 17): which leg of the steady-state
    // re-run carries the CPU — the pair expansion, the decimal
    // aggregation, or the norm joins?
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pairs = posting
      .select(explode(graft.functions.PostingPairs.pairsFast(col("ds"))).as("p"))
    t("pairs explode")(pairs.count())
    val dot = pairs
      .select(col("p.a").as("da"), col("p.b").as("db"),
        (col("p.na").cast(dec) * col("p.nb")).as("prod"))
      .groupBy("da", "db").agg(sum(col("prod")).as("dp"))
    t("dot decimal agg")(dot.count())
    val dotL = pairs
      .select(col("p.a").as("da"), col("p.b").as("db"),
        (col("p.na") * col("p.nb")).as("prod"))
      .groupBy("da", "db").agg(sum(col("prod")).as("dp"))
    t("dot long agg (counterfact)")(dotL.count())
    val nrm = wp.groupBy("doc_id").agg(sum(col("w").cast(dec) * col("w")).as("n2"))
    t("norms")(nrm.count())
    val joined = dot
      .join(nrm.select(col("doc_id").as("da"), col("n2").as("na2")), "da")
      .join(nrm.select(col("doc_id").as("db"), col("n2").as("nb2")), "db")
    t("norm joins")(joined.count())
    t("d13 third")(Dedup.d13TfidfCosine(spark, dir).count())
    println(s"[prof] wp partitions = ${wp.rdd.getNumPartitions}")
    println(s"[prof] posting partitions = ${posting.rdd.getNumPartitions}")
    println(s"[prof] pairs partitions = ${pairs.rdd.getNumPartitions}")
    println(s"[prof] dot partitions = ${dot.rdd.getNumPartitions}")
    spark.stop()
  }
}
