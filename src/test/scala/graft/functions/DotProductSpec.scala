package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The codegen DotProduct must be BIT-identical to the higher-order
  * aggregate(zip_with(...)) fold it replaced — same add order, so the
  * same floating-point result — and honor the HOF null semantics. */
class DotProductSpec extends SparkSpec {

  test("dotFast == aggregate(zip_with) fold, bit-identical on the corpus") {
    val e = Tables.load(spark, sf("sf0.01"), "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val paired = e.as("a").join(e.as("b"), col("a.vec_id") === col("b.vec_id") - 1)
    val mismatches = paired.select(
      DotProduct.dotFast(col("a.v"), col("b.v")).as("fast"),
      aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .filter(col("fast") =!= col("hof")) // exact equality: same fold order
      .count()
    assert(mismatches === 0)
  }

  test("null semantics: null array, null element, length mismatch → null") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0), Array(3.0, 4.0)),   // 11.0
      (null, Array(1.0, 2.0)),              // null array
      (Array(1.0, 2.0), Array(1.0))         // length mismatch
    ).toDF("a", "b")
      .withColumn("b", when(col("a").isNull, col("b")).otherwise(col("b")))
    val rows = df.select(DotProduct.dotFast(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
    // null element poisons the fold (zip_with semantics)
    val withNullElem = spark.sql(
      "SELECT array(1.0D, CAST(null AS DOUBLE)) a, array(2.0D, 3.0D) b")
    assert(withNullElem.select(DotProduct.dotFast(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val df = (1 to 100).map(i =>
      (Array.tabulate(8)(j => i * 0.1 + j), Array.tabulate(8)(j => j * 0.3 - i)))
      .toDF("a", "b")
    val viaCodegen = df.select(DotProduct.dotFast(col("a"), col("b")).as("d")).collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(DotProduct.dotFast(col("a"), col("b")).as("d")).collect()
      assert(viaCodegen.map(_.getDouble(0)).toSeq === interpreted.map(_.getDouble(0)).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
