package graft.storage

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** End-to-end consumer of the GraftTable public API — the reference's
  * README quick-start flow (create foreign table → COPY → SQL → ALTER →
  * TRUNCATE → DROP) driven through this library. */
object GraftTableDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loc = Files.createTempDirectory("graft-demo").toString + "/contestant"

    val schema = StructType(Seq(
      StructField("handle", StringType),
      StructField("birthdate", DateType),
      StructField("rating", IntegerType),
      StructField("percentile", DoubleType),
      StructField("country", StringType),
      StructField("achievements", StringType)))
    val t = GraftTable.create(spark, loc, schema,
      GraftTableOptions(compression = "zstd", stripeRowCount = 150000, blockRowCount = 10000))
    println(s"[demo] created, empty count = ${t.read().count()}")

    val csv = loc + "-in.csv"
    Files.write(Paths.get(csv),
      ("a,1990-01-10,2090,97.1,XA,a\n" +
        "b,1990-11-01,2203,98.1,XA,a\n" +
        "c,1988-11-01,2907,99.4,XB,b\n").getBytes)
    val n = t.copyFromCsv(csv)
    println(s"[demo] COPY loaded $n rows; size bytes = ${t.tableSize()}")

    t.read().createOrReplaceTempView("contestant")
    val agg = spark.sql(
      "SELECT country, round(avg(rating),2) AS avg_rating FROM contestant " +
        "WHERE rating > 2200 GROUP BY country ORDER BY country").collect()
    println(s"[demo] sql agg = ${agg.mkString(", ")}")

    t.addColumn("wins", IntegerType, default = 0)
    val wins = t.read().select("handle", "wins").orderBy("handle").collect()
    println(s"[demo] after ADD COLUMN DEFAULT 0: ${wins.mkString(", ")}")

    val st = t.analyze()
    println(s"[demo] ANALYZE: rows=${st.rowCount} rating min/max=" +
      s"${st.columns("rating").min}/${st.columns("rating").max}")
    println(s"[demo] EXPLAIN: ${t.explainInfo}")

    import graft.types.PgTypes
    println(s"[demo] pg types: char3=${PgTypes.charN("XA", 3)}| " +
      s"money=${PgTypes.formatMoney(PgTypes.parseMoney("$1,234.50"))} " +
      s"arr=${PgTypes.parseArray("{a,NULL,\"x,y\"}")} " +
      s"range=${PgTypes.parseRange("[1,10)")}")

    t.truncate()
    println(s"[demo] after TRUNCATE count = ${t.read().count()}")
    GraftTable.drop(loc)
    println(s"[demo] dropped, exists = ${GraftTable.exists(loc)}")

    // SQL surface via the DSv2 connector — the reference's end-user flow.
    val sqlLoc = loc + "-sql"
    spark.sql(s"CREATE TABLE demo_sql (a INT, b STRING) USING graft " +
      s"OPTIONS (path '$sqlLoc', compression 'zstd')")
    spark.sql("INSERT INTO demo_sql VALUES (1, 'one'), (2, 'two')")
    spark.sql("INSERT INTO demo_sql SELECT a + 10, b FROM demo_sql")
    val cnt = spark.sql("SELECT count(*) FROM demo_sql WHERE a > 2")
      .collect().head.getLong(0)
    println(s"[demo] DSv2 SQL: rows a>2 = $cnt (expect 2)")
    spark.sql("DROP TABLE demo_sql")
    GraftTable.drop(sqlLoc)
    spark.stop()
  }
}
