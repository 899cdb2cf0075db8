package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Similarity
import graft.storage.GraftTable

/** Continuous RAG serving: a multi-batch stream of query vectors must
  * produce exactly the batch composition (persisted-index pool → shared
  * MMR + token-pack tail), land it exactly-once, and replay nothing on
  * restart. */
class RagStreamSpec extends SparkSpec {

  private def dir = sf("sf0.001")

  /** The batch twin assembled from the same shared stages the stream
    * uses — the expected value is the COMPOSITION, not a reimplementation. */
  private def batchServe(root: String, rawQ: DataFrame,
      filterIds: Option[DataFrame]): DataFrame = {
    val q = Similarity.normalizeQueryFrame(rawQ)
    val toks = Similarity.docTokenCounts(
      graft.Tables.load(spark, dir, "documents"))
    val pool = Similarity.ragPoolFromIndex(spark, root, q, toks, filterIds)
    Similarity.mmrPackStage(spark, pool).orderBy("q_id", "rank")
  }

  test("streamed RAG contexts equal the batch composition; replay appends nothing") {
    val root = Similarity.ivfIndexDir(spark, dir)
    val docs = graft.Tables.load(spark, dir, "documents")
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
    val expected = batchServe(root, queries, None).collect()
    assert(expected.nonEmpty, "the probe pool must produce contexts")
    val src = tmpDir("rag-stream-src")
    queries.filter(col("vec_id") < 2).write.parquet(s"$src/part=a")
    queries.filter(col("vec_id") >= 2).write.parquet(s"$src/part=b")
    val qschema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def incoming = spark.readStream.schema(qschema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val destLoc = tmpDir("rag-stream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc,
      batchServe(root, queries, None).schema)
    val ckpt = tmpDir("rag-stream-ckpt")
    val q = RagStream.start(incoming, root, docs, dest, ckpt)
    assert(q.awaitTermination(120000), "rag stream drain timed out")
    val streamed = dest.read().orderBy("q_id", "rank").collect()
    assert(streamed.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq,
      "the continuous serving path must equal the batch composition")
    // every context obeys the packing law: dense ranks from 1, running
    // sum consistent, budget binds
    val byQ = streamed.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length).toSeq)
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(4)
        assert(r.getLong(5) === cum, "cum_tok must be the inclusive sum")
      }
      assert(cum <= 300L, "the token budget must bind")
    }
    // restart on the same checkpoint: replay must be a no-op
    val q2 = RagStream.start(incoming, root, docs, dest, ckpt)
    assert(q2.awaitTermination(120000))
    assert(dest.read().count() === expected.length.toLong,
      "replay must be a no-op")
    GraftTable.drop(destLoc)
  }

  test("filtered streamed RAG contexts stay inside the id universe (stream-static, zero state)") {
    val root = Similarity.ivfIndexDir(spark, dir)
    val docs = graft.Tables.load(spark, dir, "documents")
    val en = docs.filter(col("lang") === "en")
      .select(col("doc_id").cast("long").as("id"))
    val enIds = en.collect().map(_.getLong(0)).toSet
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
    val expected = batchServe(root, queries, Some(en)).collect()
    val src = tmpDir("rag-fstream-src")
    queries.write.parquet(s"$src/part=a")
    val qschema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val incoming = spark.readStream.schema(qschema)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val destLoc = tmpDir("rag-fstream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc,
      batchServe(root, queries, Some(en)).schema)
    val q = RagStream.start(incoming, root, docs, dest,
      tmpDir("rag-fstream-ckpt"), filterIds = Some(en))
    assert(q.awaitTermination(120000))
    val streamed = dest.read().orderBy("q_id", "rank").collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq)
    assert(streamed.forall(r => enIds.contains(r.getLong(2))),
      "every packed pick must come from the filtered universe")
    GraftTable.drop(destLoc)
  }
}
