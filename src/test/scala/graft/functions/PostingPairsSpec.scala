package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The native PostingPairs expression must be element-for-element
  * identical to the HOF formulation it replaced (nested transform over
  * the tail slice), across the real corpus posting lists. */
class PostingPairsSpec extends SparkSpec {

  test("pairsFast == nested-transform HOF chain on sf0.01 posting lists") {
    val posting = Dedup.postingLists(spark, sf("sf0.01"))
    val fast = posting
      .select(explode(PostingPairs.pairsFast(col("ds"))).as("p"))
      .select(col("p.a"), col("p.na"), col("p.b"), col("p.nb"))
    val hof = posting
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.getField("doc_id").as("a"), x.getField("n").as("na"),
            y.getField("doc_id").as("b"), y.getField("n").as("nb")))))).as("p"))
      .select(col("p.a"), col("p.na"), col("p.b"), col("p.nb"))
    assert(fast.exceptAll(hof).isEmpty && hof.exceptAll(fast).isEmpty)
    assert(fast.count() === hof.count()) // multiset equality incl. duplicates
  }

  test("pairs preserve sort order invariant a < b and handle tiny lists") {
    import spark.implicits._
    val df = Seq(
      Seq((1L, 5L)),                         // singleton: no pairs
      Seq((1L, 5L), (2L, 7L)),               // one pair
      Seq((1L, 5L), (2L, 7L), (9L, 1L))      // three pairs
    ).toDF("ds")
    val out = df.select(explode(PostingPairs.pairsFast(col("ds"))).as("p"))
      .select(col("p.a"), col("p.b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((1L, 2L), (1L, 9L), (2L, 9L)))
    assert(out.forall { case (a, b) => a < b })
  }
}
