package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.GraftTable

/** Scale profile of changelog materialization: the SAME key-local CDC
  * batch (updates + deletes + inserts confined to the newest 1/16 of
  * the key space) applied two ways to two identical key-clustered
  * tables —
  *
  *  1. [[GraftTable.applyCdc]]: ONE atomic commit (the engine's path),
  *  2. merge THEN delete: two commits (what a user without applyCdc
  *     would write).
  *
  * The claim under measurement (SCALE_r11): the two-commit form reads
  * and rewrites the candidate file set TWICE — the merge rewrites the
  * key-range files, then the delete rewrites the (new) key-range files
  * again — while applyCdc pays one candidate read and one rewrite.
  * Wall ratio approaches 2× on the mutation cost as the table grows
  * with the key range held local; file-rewrite counts prove the same
  * structurally whatever the wall noise. Optional arg = replication
  * factor (rep × sf0.1 lineitem, constant file size). */
object ProfCdc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(1)

    val root = java.nio.file.Files.createTempDirectory("graft_profcdc").toString
    val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
    val shift = li0.agg(max("l_orderkey")).head.getLong(0) + 1
    val li = (0 until rep).map(i =>
      li0.withColumn("l_orderkey", col("l_orderkey") + lit(i * shift)))
      .reduce(_ unionByName _)
      .repartitionByRange(16 * rep, col("l_orderkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def build(name: String): GraftTable = {
      val t = GraftTable.create(spark, s"$root/$name", li.schema,
        graft.storage.GraftTableOptions(sortBy = Seq("l_orderkey")))
      t.append(li)
      t
    }
    val t1 = build("one_commit")
    val t2 = build("two_commits")
    val maxKey = rep * shift - 1
    val lo = maxKey - shift / 16 // the newest ~1/16 of the key space
    println(s"[profcdc] ${t1.rowCountFromMetadata()} rows, " +
      s"${t1.committedFiles.size} files per table; changelog keys > $lo")

    // the changelog: one row per touched key — updates take a bumped
    // quantity, deletes are keys (values ignored), inserts shift past
    // the max key
    val inRange = li.filter(col("l_orderkey") > lo)
      .dropDuplicates("l_orderkey")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ups = inRange.filter(col("l_orderkey") % 3 === 0)
      .withColumn("l_quantity", col("l_quantity") + lit(100.0))
    val delKeys = inRange.filter(col("l_orderkey") % 3 === 1)
      .select("l_orderkey").limit(200).collect().map(_.getLong(0))
    val dels = inRange.filter(col("l_orderkey").isin(delKeys.toIndexedSeq: _*))
    val ins = inRange.filter(col("l_orderkey") % 3 === 2)
      .withColumn("l_orderkey", col("l_orderkey") + lit(rep * shift))

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profcdc] $label%-36s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    def rewritten(t: GraftTable, before: Set[String]): Int =
      before.diff(t.committedFiles.toSet).size

    // materialize every shared input BEFORE timing (delKeys above
    // already forced inRange; force the other branches too) so neither
    // path pays the cached plans' first materialization
    Seq(ups, dels, ins).foreach(_.count())

    // the two-commit path runs FIRST: any residual warm-up bias then
    // works AGAINST the engine's path, not for it
    val b2 = t2.committedFiles.toSet
    timed("merge + delete (TWO commits)") {
      t2.merge(ups.unionByName(ins), Seq("l_orderkey"))
      val afterMerge = t2.committedFiles.toSet
      t2.delete(Seq(org.apache.spark.sql.sources.In(
        "l_orderkey", delKeys.map(java.lang.Long.valueOf).toArray[Any])))
      val mergeRewrote = rewritten(t2, b2)
      val deleteRewrote = afterMerge.diff(t2.committedFiles.toSet).size
      println(s"[profcdc]   merge rewrote $mergeRewrote files, delete then " +
        s"rewrote $deleteRewrote MORE (the same key range touched twice)")
    }

    val b1 = t1.committedFiles.toSet
    val cdcSrc = ups.withColumn("__op", lit("U"))
      .unionByName(dels.withColumn("__op", lit("D")))
      .unionByName(ins.withColumn("__op", lit("U")))
    val (u, i, d) = timed("applyCdc (ONE commit)") {
      t1.applyCdc(cdcSrc, Seq("l_orderkey"), "__op")
    }
    val r1 = rewritten(t1, b1)
    println(s"[profcdc]   updated=$u inserted=$i deleted=$d files_rewritten=$r1 (once)")
    require(t1.read().count() == t2.read().count(),
      "the two strategies must produce the same row count")
    println(s"[profcdc] final rows both paths: ${t1.rowCountFromMetadata()}")
    spark.stop()
  }
}
