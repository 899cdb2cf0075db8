package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.In

import graft.storage.{GraftTable, GraftTableOptions}

/** Scale profile of merge-on-read deletes (deletion vectors) vs
  * copy-on-write, on the layout where the difference matters: a LARGE
  * UNclustered table (the delete key scattered across every file — the
  * compliance-erasure shape, where zone maps prune nothing and COW must
  * rewrite every file).
  *
  *  1. sparse COW delete — wall ∝ table (every file rewritten),
  *  2. identical sparse MOR delete — wall ∝ rows matched (sidecars only),
  *  3. full-scan aggregate before / with vectors — the standing read tax,
  *  4. compact() — materializes the vectors, read tax gone.
  *
  * The 100 TB claim under test: (2) stays ~flat as the table grows
  * while (1) grows linearly; (3)'s tax is per-row-filter on ONLY the
  * vectored files and disappears after (4). Optional arg = replication
  * factor (table grows, deleted row count constant).
  */
object ProfDv {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(1)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profdv] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    // unclustered layout: orderkeys round-robin across 16*rep files, so
    // a scattered key-set predicate touches EVERY file. FULL row width —
    // the asymmetry under test is rewrite-bytes vs matched-rows, and a
    // narrow projection would understate the rewrite side
    val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
    val li = (0 until rep).map(i => li0.withColumn("l_partkey",
      col("l_partkey") + lit(i))).reduce(_ unionByName _)
    def build(name: String): GraftTable = {
      val loc = java.nio.file.Files.createTempDirectory(s"graft_profdv_$name")
        .toString + "/t"
      val t = GraftTable.create(spark, loc, li.schema, GraftTableOptions())
      t.append(li.repartition(16 * rep))
      t
    }
    val cow = build("cow")
    val mor = build("mor")
    println(s"[profdv] table: ${cow.rowCountFromMetadata()} rows, " +
      s"${cow.committedFiles.size} files")

    // ~1000 scattered keys (every 6000th orderkey)
    val keys = li0.select("l_orderkey").distinct()
      .filter(col("l_orderkey") % 6000 === 0)
      .collect().map(_.getLong(0)).sorted
    println(s"[profdv] deleting rows of ${keys.length} scattered orderkeys")

    // bytes written is the scale-invariant asymmetry: local-mode walls
    // understate rewrite cost (tiny files, 32 parallel CPU writers, no
    // network storage), but write amplification carries to any cluster
    def fileBytes(abs: Iterable[String]): Long = {
      val conf = spark.sessionState.newHadoopConf()
      abs.map { a =>
        val p = new org.apache.hadoop.fs.Path(a)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum
    }
    val cowBefore = cow.committedFiles.toSet
    val d1 = timed("sparse COW delete (rewrites all files)") {
      cow.delete(Seq(In("l_orderkey", keys.map(_.asInstanceOf[Any]))))
    }
    val d2 = timed("sparse MOR delete (sidecars only)") {
      mor.deleteMor(Seq(In("l_orderkey", keys.map(_.asInstanceOf[Any]))))
    }
    require(d1 == d2, s"paths disagree: COW deleted $d1, MOR deleted $d2")
    val cowWritten = fileBytes(cow.committedFiles.filterNot(cowBefore))
    val morWritten = fileBytes(
      mor.dvEntries.values.map(e => s"${mor.location}/${e.path}"))
    println(s"[profdv] rows deleted: $d2; MOR sidecars: ${mor.dvEntries.size}; " +
      f"bytes written COW ${cowWritten / 1e6}%.1f MB vs MOR ${morWritten / 1e3}%.1f KB " +
      f"(${cowWritten.toDouble / math.max(1L, morWritten)}%.0fx amplification)")

    def scanAgg(t: GraftTable): Double =
      t.read().agg(sum("l_extendedprice")).head.getDouble(0)
    val base = timed("full-scan agg, clean table")(scanAgg(cow))
    val taxed = timed("full-scan agg, every file vectored")(scanAgg(mor))
    require(math.abs(base - taxed) < 1e-6 * math.abs(base),
      s"vectored scan disagrees: $base vs $taxed")
    timed("compact() materializes the vectors")(mor.compact())
    require(mor.dvEntries.isEmpty)
    timed("full-scan agg, after materialize")(scanAgg(mor))
    timed("verify() footer audit")(assert(mor.verify().isEmpty))
    spark.stop()
  }
}
