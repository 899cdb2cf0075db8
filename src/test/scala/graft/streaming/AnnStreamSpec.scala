package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Similarity
import graft.storage.GraftTable

/** Continuous ANN against the persisted IVF index: a multi-batch stream
  * of query vectors must produce exactly s7's batch results, land them
  * exactly-once, and replay nothing on restart. */
class AnnStreamSpec extends SparkSpec {

  private def dir = sf("sf0.001")

  test("streamed probes equal the batch s7 results; replay appends nothing") {
    val root = Similarity.ivfIndexDir(spark, dir)
    val batchResult = Similarity.s7AnnPersisted(spark, dir)
    // the same 5 query vectors, arriving as a 2-batch stream
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
    val src = tmpDir("ann-stream-src")
    queries.filter(col("vec_id") < 2).write.parquet(s"$src/part=a")
    queries.filter(col("vec_id") >= 2).write.parquet(s"$src/part=b")
    val qschema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def incoming = spark.readStream.schema(qschema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val destLoc = tmpDir("ann-stream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc, batchResult.schema)
    val ckpt = tmpDir("ann-stream-ckpt")
    val q = AnnStream.start(incoming, root, dest, ckpt)
    assert(q.awaitTermination(120000), "ann stream drain timed out")
    val streamed = dest.read().orderBy("q_id", "rank").collect()
    val batch = batchResult.collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq,
      "the continuous probe must equal the batch operator")
    // restart on the same checkpoint: everything already committed —
    // the txn watermark must keep replayed batches out
    val q2 = AnnStream.start(incoming, root, dest, ckpt)
    assert(q2.awaitTermination(120000))
    assert(dest.read().count() === batch.length.toLong, "replay must be a no-op")
    GraftTable.drop(destLoc)
  }

  test("streamed IVF-PQ probes equal the batch s9 results; replay appends nothing") {
    val root = Similarity.ivfPqIndexDir(spark, dir)
    val batchResult = Similarity.s9AnnIvfPq(spark, dir)
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
    val src = tmpDir("ivfpq-stream-src")
    queries.filter(col("vec_id") < 2).write.parquet(s"$src/part=a")
    queries.filter(col("vec_id") >= 2).write.parquet(s"$src/part=b")
    val qschema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def incoming = spark.readStream.schema(qschema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val destLoc = tmpDir("ivfpq-stream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc, batchResult.schema)
    val ckpt = tmpDir("ivfpq-stream-ckpt")
    val q = AnnStream.startPq(incoming, root, dest, ckpt)
    assert(q.awaitTermination(120000), "ivf-pq stream drain timed out")
    val streamed = dest.read().orderBy("q_id", "rank").collect()
    val batch = batchResult.collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq,
      "the continuous IVF-PQ probe must equal the batch s9 operator")
    val q2 = AnnStream.startPq(incoming, root, dest, ckpt)
    assert(q2.awaitTermination(120000))
    assert(dest.read().count() === batch.length.toLong, "replay must be a no-op")
    GraftTable.drop(destLoc)
  }

  test("streamed INT8 probes equal the batch s17 results; replay appends nothing") {
    val root = Similarity.int8IndexDir(spark, dir)
    val batchResult = Similarity.s17AnnInt8Persisted(spark, dir)
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
    val src = tmpDir("int8-stream-src")
    queries.filter(col("vec_id") < 2).write.parquet(s"$src/part=a")
    queries.filter(col("vec_id") >= 2).write.parquet(s"$src/part=b")
    val qschema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def incoming = spark.readStream.schema(qschema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val destLoc = tmpDir("int8-stream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc, batchResult.schema)
    val ckpt = tmpDir("int8-stream-ckpt")
    val q = AnnStream.startInt8(incoming, root, dest, ckpt)
    assert(q.awaitTermination(120000), "int8 stream drain timed out")
    val streamed = dest.read().orderBy("q_id", "rank").collect()
    val batch = batchResult.collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq,
      "the continuous int8 probe must equal the batch s17 operator")
    val q2 = AnnStream.startInt8(incoming, root, dest, ckpt)
    assert(q2.awaitTermination(120000))
    assert(dest.read().count() === batch.length.toLong, "replay must be a no-op")
    GraftTable.drop(destLoc)
  }

  test("streamed BINARY probes equal the batch s22 results; replay appends nothing") {
    val root = Similarity.binIndexDir(spark, dir)
    val batchResult = Similarity.s22AnnBinPersisted(spark, dir)
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
    val src = tmpDir("bin-stream-src")
    queries.filter(col("vec_id") < 2).write.parquet(s"$src/part=a")
    queries.filter(col("vec_id") >= 2).write.parquet(s"$src/part=b")
    val qschema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def incoming = spark.readStream.schema(qschema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val destLoc = tmpDir("bin-stream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc, batchResult.schema)
    val ckpt = tmpDir("bin-stream-ckpt")
    val q = AnnStream.startBin(incoming, root, dest, ckpt)
    assert(q.awaitTermination(120000), "binary stream drain timed out")
    val streamed = dest.read().orderBy("q_id", "rank").collect()
    val batch = batchResult.collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq,
      "the continuous binary probe must equal the batch s22 operator")
    val q2 = AnnStream.startBin(incoming, root, dest, ckpt)
    assert(q2.awaitTermination(120000))
    assert(dest.read().count() === batch.length.toLong, "replay must be a no-op")
    GraftTable.drop(destLoc)
  }

  test("filtered streamed probes equal the batch s12 results (stream-static filter, zero state)") {
    val root = Similarity.ivfIndexDir(spark, dir)
    val en = graft.Tables.load(spark, dir, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id").cast("long").as("id"))
    val batchResult = Similarity.s12FilteredPersisted(spark, dir)
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 5).select("vec_id", "embedding")
    val src = tmpDir("ann-fstream-src")
    queries.filter(col("vec_id") < 2).write.parquet(s"$src/part=a")
    queries.filter(col("vec_id") >= 2).write.parquet(s"$src/part=b")
    val qschema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def incoming = spark.readStream.schema(qschema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val destLoc = tmpDir("ann-fstream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc, batchResult.schema)
    val ckpt = tmpDir("ann-fstream-ckpt")
    val q = AnnStream.start(incoming, root, dest, ckpt, filterIds = Some(en))
    assert(q.awaitTermination(120000), "filtered ann stream drain timed out")
    val streamed = dest.read().orderBy("q_id", "rank").collect()
    val batch = batchResult.collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq,
      "the continuous filtered probe must equal the batch s12 operator")
    GraftTable.drop(destLoc)
  }
}
