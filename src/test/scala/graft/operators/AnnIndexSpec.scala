package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.In

import graft.SparkSpec
import graft.storage.GraftTable

/** s7 — the PERSISTED IVF index: s2's quantizer materialized as graft
  * tables (centroids + label-clustered postings), probes served through
  * zone-map file pruning, and incremental vector appends that never
  * touch committed files. */
class AnnIndexSpec extends SparkSpec {

  private def dir = sf("sf0.001")

  test("s7 from the persisted index equals the inline IVF plan (s2)") {
    val fromIndex = Similarity.s7AnnPersisted(spark, dir).collect()
    val inline = Similarity.s2AnnIvf(spark, dir).collect()
    assert(fromIndex.nonEmpty)
    assert(fromIndex.map(_.toSeq).toSeq === inline.map(_.toSeq).toSeq,
      "materializing the index and pruning the probe must lose nothing")
  }

  test("a probe's label filter zone-map-prunes the postings scan") {
    val root = Similarity.ivfIndexDir(spark, dir)
    val post = GraftTable.open(spark, s"$root/postings")
    val all = post.committedFiles.size
    assert(all >= 5, s"range partitioning should split the lists; got $all files")
    val one = post.prunedFiles(Seq(In("label", Array[Any](0)))).size
    assert(one < all,
      s"a single-list probe must read a file subset ($one of $all)")
    // every row is still reachable: the per-list prunes cover the corpus
    val covered = (0 to 9).flatMap(l =>
      post.prunedFiles(Seq(In("label", Array[Any](l))))).toSet
    assert(covered.size === all, "the union of list probes covers every file")
  }

  test("incremental append routes to the nearest list, commits no rewrite") {
    import spark.implicits._
    // clone the index so the memoized one (shared with s7 runs) stays pristine
    val root = Similarity.ivfIndexDir(spark, dir)
    val root2 = tmpDir("ann-append")
    GraftTable.open(spark, s"$root/centroids").cloneTo(s"$root2/centroids")
    GraftTable.open(spark, s"$root/postings").cloneTo(s"$root2/postings")
    val post = GraftTable.open(spark, s"$root2/postings")
    val before = post.committedFiles.toSet
    val nBefore = post.rowCountFromMetadata()
    // the new vector: an exact copy of vec 0 under a fresh id
    val v0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0).select("embedding").head
      .getSeq[Float](0).toArray
    val added = Seq((1000000L, v0)).toDF("vec_id", "embedding")
    assert(Similarity.appendToIvfIndex(spark, root2, added) === 1L)
    val post2 = GraftTable.open(spark, s"$root2/postings")
    assert(before.subsetOf(post2.committedFiles.toSet),
      "index appends must never rewrite committed postings files")
    assert(post2.rowCountFromMetadata() === nBefore + 1)
    // the stored list is the argmax-cosine centroid, recomputed here
    // with the same left-fold order
    val cents = GraftTable.open(spark, s"$root2/centroids").read()
      .collect().map { r =>
        val cv = r.getSeq[Double](r.fieldIndex("cv"))
        val cn = r.getDouble(r.fieldIndex("cnrm"))
        val lab = r.getInt(r.fieldIndex("label"))
        val dot = v0.map(_.toDouble).zip(cv).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
        val nrm = math.sqrt(v0.map(_.toDouble).foldLeft(0.0)((a, x) => a + x * x))
        (lab, dot / (nrm * cn))
      }
    val expected = cents.maxBy(c => (c._2, -c._1))._1
    val got = post2.read().filter(col("vec_id") === 1000000L)
      .select("label").head.getInt(0)
    assert(got === expected, "assignment must match the committed quantizer")
  }
}
