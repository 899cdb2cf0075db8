package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Structural pins for the round-17 execution patterns — the two
  * cross-cutting changes that re-shaped how (not what) operators
  * compute: [[Tables.fanned]] head fan-out and the persisted-probe
  * session clone. The oracle sweep pins the VALUES; these pin the
  * SHAPES the optimization claims (OPTIMIZATION_r17.md), so a refactor
  * that silently drops the fan or re-enables AQE on a probe fails here
  * rather than only in a bench regression two rounds later. */
class ExecShapeSpec extends SparkSpec {

  test("Tables.fanned repartitions on the key at defaultParallelism (deterministic hash, not round-robin)") {
    val df = Tables.fanned(Tables.load(spark, sf("sf0.001"), "documents"), "doc_id")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("hashpartitioning(doc_id"),
      s"fanned head must hash-partition on the key column:\n$plan")
    assert(!plan.contains("roundrobin"),
      "fanned must never round-robin (retry-nondeterministic)")
    assert(df.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
  }

  test("d6's pair distinct rides the head fan's partitioning - no (vec_a, vec_b) exchange") {
    val plan = Dedup.d6EmbedNearDupAnn(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("hashpartitioning(vec_id"),
      s"banding head must be fanned on vec_id:\n$plan")
    // the whole point of keying the fan on vec_id: HashPartitioning(vec_a)
    // satisfies the pair clustering, so the ~all-pairs distinct needs no
    // exchange of its own
    assert(!plan.contains("hashpartitioning(vec_a"),
      s"pair distinct must not re-exchange on (vec_a, vec_b):\n$plan")
  }

  test("persisted probes run AQE-free on the bounded-width probe session") {
    val df = Similarity.s9AnnIvfPq(spark, sf("sf0.001"))
    val ps = df.sparkSession
    assert(ps ne spark, "probe must run on the session clone")
    assert(ps.conf.get("spark.sql.adaptive.enabled") === "false")
    assert(ps.conf.get("spark.sql.shuffle.partitions").toInt ===
      math.min(spark.sparkContext.defaultParallelism, 8))
    assert(!df.queryExecution.executedPlan.toString().contains("AdaptiveSparkPlan"))
    // the clone is cached per parent session (Tables.load schema cache
    // and table opens stay warm across probe invocations)
    assert(Similarity.s17AnnInt8Persisted(spark, sf("sf0.001")).sparkSession eq ps)
  }
}
