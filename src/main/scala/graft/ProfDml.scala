package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.GraftTable

/** Scale profile of the row-level DML paths on a key-clustered table:
  * builds a scratch graft table from sf lineitem (range-partitioned on
  * l_orderkey so per-file zone maps are disjoint — the 100 TB layout a
  * clustered fact table would have), then measures
  *
  *  1. SQL DELETE with a non-translatable predicate confined to a narrow
  *     key range (runtime group filtering must rewrite ~1/16 of files),
  *  2. SQL MERGE of a CDC increment on recent keys (static key-range
  *     group pruning through MergeRows/ReplaceData),
  *  3. Scala-API merge of the same increment (zone-map candidate prune),
  *  4. the change feed over the merge commit (reads only swapped files).
  *
  * Prints wall seconds plus files rewritten vs carried — the number that
  * must stay ~constant as the table grows when mutations stay key-local.
  */
object ProfDml {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val wh = java.nio.file.Files.createTempDirectory("graft_profdml").toString
    spark.conf.set("spark.sql.catalog.pdml", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pdml.warehouse", wh)

    // optional arg: replication factor — rep copies under shifted key
    // ranges, rep*16 files of CONSTANT size. Key-local DML cost must
    // stay ~flat as the table grows this way; only the file count (and
    // the metadata the driver prunes over) scales.
    val rep = args.headOption.map(_.toInt).getOrElse(1)
    val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
    val shift = li0.agg(max("l_orderkey")).head.getLong(0) + 1
    val li = (0 until rep).map(i =>
      li0.withColumn("l_orderkey", col("l_orderkey") + lit(i * shift)))
      .reduce(_ unionByName _)
    val loc = s"$wh/db/li"
    val t = GraftTable.create(spark, loc, li.schema,
      graft.storage.GraftTableOptions(sortBy = Seq("l_orderkey")))
    t.append(li.repartitionByRange(16 * rep, col("l_orderkey")))
    val total = t.committedFiles.size
    val rows = t.rowCountFromMetadata()
    val maxKey = li.agg(max("l_orderkey")).head.getLong(0)
    println(s"[profdml] table: $rows rows, $total files, keys to $maxKey")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profdml] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    // 1. non-translatable DELETE on a narrow key range: runtime group
    // filter on the clustered column must confine the rewrite
    val before1 = t.committedFiles.toSet
    val cut = shift / 16 // constant key width however large the table
    timed(s"SQL DELETE (runtime-pruned)") {
      spark.sql(s"DELETE FROM pdml.db.li WHERE pmod(l_orderkey, 7) = 3 AND l_orderkey < $cut")
    }
    val g1 = GraftTable.open(spark, loc)
    println(s"[profdml]   files rewritten=${before1.diff(g1.committedFiles.toSet).size - 0} " +
      s"carried=${before1.intersect(g1.committedFiles.toSet).size} of $total")

    // 2. SQL MERGE of a recent-key CDC increment (top 5% of ONE replica's
    // key width — constant increment size however large the table)
    val lo = maxKey - (shift / 20)
    li.filter(col("l_orderkey") >= lo)
      .withColumn("l_quantity", col("l_quantity") + 100.0)
      .dropDuplicates("l_orderkey", "l_linenumber") // MERGE cardinality rule
      .createOrReplaceTempView("cdc")
    val before2 = g1.committedFiles.toSet
    timed("SQL MERGE (recent keys)") {
      spark.sql("""
        MERGE INTO pdml.db.li t USING cdc s
        ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
        WHEN MATCHED THEN UPDATE SET l_quantity = s.l_quantity
        WHEN NOT MATCHED THEN INSERT *""")
    }
    val g2 = GraftTable.open(spark, loc)
    println(s"[profdml]   carried=${before2.intersect(g2.committedFiles.toSet).size} of ${before2.size}")

    // 3. Scala merge of the same shape (separate insert files, stream-safe)
    val inc = li.filter(col("l_orderkey") >= lo)
      .withColumn("l_quantity", col("l_quantity") + 200.0)
      .dropDuplicates("l_orderkey", "l_linenumber")
    val v0 = g2.version
    timed("Scala merge (recent keys)") {
      g2.merge(inc, Seq("l_orderkey", "l_linenumber"))
    }

    // 4. change feed over the merge commit: swapped files only
    timed("changes() over the merge") {
      val n = g2.changes(v0, g2.version).count()
      println(s"[profdml]   change rows=$n")
    }

    spark.stop()
  }
}
