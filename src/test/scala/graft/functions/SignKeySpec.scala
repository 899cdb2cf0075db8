package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The codegen SignKey must produce BIT-identical keys to the
  * higher-order formulation it replaced (same plane constants, same
  * left-fold dot, same sign rule) — a differing key silently changes
  * every LSH bucket and band assignment. */
class SignKeySpec extends SparkSpec {

  test("signKeyFast == HOF plane fold on the corpus, all bands") {
    val e = Tables.load(spark, sf("sf0.01"), "embeddings")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    for (band <- 0 until 8) {
      val mismatches = e.select(
        SignKey.signKeyFast(col("v"), band * 6, 6).as("fast"),
        graft.operators.Similarity.signKeyHof(col("v"), band * 6, 6).as("hof"))
        .filter(col("fast") =!= col("hof"))
        .count()
      assert(mismatches === 0, s"band $band keys diverge")
    }
  }

  test("a null element zeroes the key, matching the HOF null-fold — codegen and eval") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq[Any](1.0, -2.0, 3.0)),
        Row(Seq[Any](1.0, null, 3.0)),
        Row(Seq[Any](null, null, null))),
      StructType(Seq(StructField("v", ArrayType(DoubleType, containsNull = true)))))
    def run(): Seq[(Long, Long)] = df.select(
      SignKey.signKeyFast(col("v"), 0, 6).as("fast"),
      graft.operators.Similarity.signKeyHof(col("v"), 0, 6).as("hof"))
      .na.fill(0L) // HOF yields null key for null dots; fast yields 0 — both mean "no bits"
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val codegen = run()
    assert(codegen.head._1 === codegen.head._2)
    assert(codegen(1)._1 === 0L, "null element must zero the key")
    assert(codegen(2)._1 === 0L)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() === codegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val df = (1 to 50).map(i => Array.tabulate(16)(j => math.sin(i * 16 + j)))
      .toDF("v")
    val codegen = df.select(SignKey.signKeyFast(col("v"), 3, 12).as("k")).collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(SignKey.signKeyFast(col("v"), 3, 12).as("k")).collect()
      assert(codegen.map(_.getLong(0)).toSeq === interp.map(_.getLong(0)).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
