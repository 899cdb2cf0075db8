package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming Misra–Gries sketch: after EVERY micro-batch the emitted
  * candidate set must cover every token above n/k of the stream so far —
  * which exercises the aggregate's serialize/deserialize/merge path
  * through the state store, not just the batch code path. */
class HeavyHittersStreamSpec extends SparkSpec {

  test("candidates cover the stream-so-far heavy hitters after every batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val k = 12

    // three skewed batches with DIFFERENT hot tokens, so the heavy set
    // after batch 3 differs from the one after batch 1 — state must
    // genuinely evolve across triggers
    val rnd = new Random(5)
    def batch(hot: String, nHot: Int, nNoise: Int): Seq[String] =
      rnd.shuffle(Seq.fill(nHot)(hot) ++
        (1 to nNoise).map(i => s"noise_${rnd.nextInt(5000)}"))
    val batches = Seq(
      batch("alpha", 400, 600),
      batch("beta", 900, 400),
      batch("alpha", 300, 500))

    val input = MemoryStream[String]
    val q = HeavyHittersStream.query(input.toDF().toDF("tok"), k)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream")
      .option("checkpointLocation", tmpDir("hh-ckpt"))
      .start()
    try {
      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        seen ++= b
        val row = s.table("hh_stream").collect().head
        val cand = row.getSeq[String](0).toSet
        val n = row.getLong(1)
        assert(n === seen.size.toLong, "exact stream length per trigger")
        assert(cand.size <= k - 1, s"state bound violated: ${cand.size}")
        val exact = seen.groupBy(identity).view.mapValues(_.size.toLong)
        val mustSurvive = exact.filter { case (_, c) => c * k > n }.keys.toSet
        assert(mustSurvive.nonEmpty, "test batches must contain heavy hitters")
        assert(mustSurvive.subsetOf(cand),
          s"after ${seen.size} tokens lost: ${mustSurvive -- cand}")
      }
    } finally q.stop()
  }
}
