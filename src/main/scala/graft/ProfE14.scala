package graft

import org.apache.spark.sql.SparkSession

/** One-off: the round-13 continuation entries (e14 banded range join,
  * m8 pHash near-dup) at 1× (sf0.1) vs the MakeScale 100× copy — pins
  * the scale exponents for SCALE_r16. */
object ProfE14 {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.toSeq) {
      println(s"== $dir")
      t("warm")(Tables.load(spark, dir, "events").count())
      t("e14_range_join")(operators.Events.e14RangeJoin(spark, dir).count())
      t("e14 warm")(operators.Events.e14RangeJoin(spark, dir).count())
      t("m8_phash_neardup")(operators.Multimodal.m8PhashNeardup(spark, dir).count())
      t("m8 warm")(operators.Multimodal.m8PhashNeardup(spark, dir).count())
      t("m9_audio_neardup")(operators.Multimodal.m9AudioNeardup(spark, dir).count())
      t("m9 warm")(operators.Multimodal.m9AudioNeardup(spark, dir).count())
    }
    spark.stop()
  }
}
