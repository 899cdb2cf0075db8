package graft.storage

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Randomized model check of the mutation layer: a seeded stream of CDC
  * batches (updates, inserts, deletes of present AND absent keys) is
  * applied both to a graft table ([[GraftTable.applyCdc]]) and to an
  * in-memory reference map; after every batch the table's content, its
  * metadata row count, and the model must agree exactly. Interleaved
  * small-file compaction proves layout maintenance never perturbs
  * content. Two fixed seeds keep the run deterministic while covering
  * materially different op interleavings. */
class CdcModelPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", LongType)))

  private def runSeed(seed: Long): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val t = GraftTable.create(spark, tmpDir(s"cdc-model-$seed") + "/t", schema,
      GraftTableOptions(sortBy = Seq("id")))
    val model = scala.collection.mutable.Map[Int, Long]()
    val init = (0 until 60).map(i => i -> rnd.nextLong())
    t.append(init.toDF("id", "v"))
    model ++= init

    for (round <- 1 to 8) {
      val keyPool = model.keys.toVector.sorted
      val batch = scala.collection.mutable.Map[Int, (java.lang.Long, String)]()
      // updates of present keys
      rnd.shuffle(keyPool).take(rnd.nextInt(8)).foreach { k =>
        batch(k) = (java.lang.Long.valueOf(rnd.nextLong()), "U")
      }
      // inserts of fresh keys
      (0 until rnd.nextInt(6)).foreach { _ =>
        val k = 1000 * round + rnd.nextInt(50)
        if (!model.contains(k) && !batch.contains(k))
          batch(k) = (java.lang.Long.valueOf(rnd.nextLong()), "U")
      }
      // deletes of present keys (skipping ones already in the batch)
      rnd.shuffle(keyPool).take(rnd.nextInt(6)).foreach { k =>
        if (!batch.contains(k)) batch(k) = (null, "D")
      }
      // deletes of ABSENT keys: must no-op
      val absent = 900000 + rnd.nextInt(100)
      if (!batch.contains(absent)) batch(absent) = (null, "D")

      val df = batch.toSeq.map { case (k, (v, op)) => (k, v, op) }
        .toDF("id", "v", "op")
      val (u, i, d) = t.applyCdc(df, Seq("id"), "op")
      // fold the same batch into the model
      var (mu, mi, md) = (0L, 0L, 0L)
      batch.foreach {
        case (k, (v, "U")) =>
          if (model.contains(k)) mu += 1 else mi += 1
          model(k) = v.longValue()
        case (k, (_, "D")) =>
          if (model.remove(k).isDefined) md += 1
        case _ => ()
      }
      assert((u, i, d) === ((mu, mi, md)), s"seed=$seed round=$round counts")
      if (round % 3 == 0) t.compactSmall(smallBytes = 64L << 20)
      val got = t.read().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got === model.toMap, s"seed=$seed round=$round content diverged")
      assert(t.rowCountFromMetadata() === model.size.toLong,
        s"seed=$seed round=$round metadata row count")
    }
    GraftTable.drop(t.location)
  }

  test("table ≡ model across randomized CDC batches (seed 42)") { runSeed(42L) }
  test("table ≡ model across randomized CDC batches (seed 1337)") { runSeed(1337L) }
}
