package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events table's physical `ts` encoding belongs to the data
  * generator and has changed across regenerations (TIMESTAMP(NANOS) in
  * earlier drops, timestamp[us]/NTZ now). `Tables.loadEvents` must serve
  * identical microsecond instants from every encoding — this spec writes
  * one mini-fixture per encoding and asserts the loaded rows agree, so a
  * regeneration can never silently break the nine events consumers again.
  */
class EventsLoaderSpec extends SparkSpec {

  // Microsecond instants with a non-zero sub-millisecond component, so a
  // lossy nanos conversion (double division) or a dropped cast would show.
  private val microsUtc = Seq(
    (1L, 1700000000123456L, 10L, "view", 1.5, """{"k":1}"""),
    (2L, 1700000456654321L, 11L, "click", 2.5, """{"k":2}"""),
    (3L, 1700900999000001L, 10L, "purchase", 9.0, "null"))

  private def base: DataFrame = {
    val s = spark
    import s.implicits._
    microsUtc.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
  }

  /** Write a fixture whose ts column uses the given encoding, return its dir. */
  private def fixture(name: String)(tsCol: org.apache.spark.sql.Column): String = {
    val dir = tmpDir(s"events-$name")
    base.withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadedMicros(dir: String): (DataType, Seq[(Long, Long)]) = {
    val df = Tables.load(spark, dir, "events")
    val dt = df.schema("ts").dataType
    val rows = df.select(col("event_id"), unix_micros(col("ts").cast(TimestampType)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    (dt, rows)
  }

  private val expected = microsUtc.map(t => (t._1, t._2)).sortBy(_._1)

  test("nanos-as-long encoding converts losslessly to micros") {
    val dir = fixture("long")(col("ts_us") * lit(1000L)) // raw LongType nanos
    val (dt, rows) = loadedMicros(dir)
    assert(dt === TimestampType)
    assert(rows === expected)
  }

  test("timestamp_ntz encoding (current generator output) loads as-is") {
    val dir = fixture("ntz")(timestamp_micros(col("ts_us")).cast(TimestampNTZType))
    // Confirm the fixture really round-trips as NTZ before asserting on it.
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType === TimestampNTZType)
    val (dt, rows) = loadedMicros(dir)
    assert(dt === TimestampType)
    assert(rows === expected)
  }

  test("native timestamp encoding loads as-is") {
    val dir = fixture("ltz")(timestamp_micros(col("ts_us")))
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType === TimestampType)
    val (dt, rows) = loadedMicros(dir)
    assert(dt === TimestampType)
    assert(rows === expected)
  }

  test("e13 dense grid: full rectangle, zeros exactly where e11's sparse grid has no cell") {
    import org.apache.spark.sql.functions._
    // sf0.001: 477 of the 600 (type × window) cells are occupied, so
    // the gap-fill semantics are actually exercised (sf0.01's rectangle
    // happens to be full — zero gap cells to pin there)
    val dir = sf("sf0.001")
    val dense = graft.operators.Events.e13DenseGrid(spark, dir).collect()
    val ev = graft.Tables.load(spark, dir, "events")
    val sparse = ev
      .groupBy(floor(unix_timestamp(col("ts")) / lit(21600.0)).cast("long")
        .as("win6h"), col("event_type"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val types = ev.select("event_type").distinct().count()
    val wins = sparse.keys.map(_._1)
    val span = wins.max - wins.min + 1
    assert(dense.length.toLong === types * span,
      "the dense frame must be the full types × windows rectangle")
    dense.foreach { r =>
      val key = (r.getLong(0), r.getString(1))
      assert(r.getLong(2) === sparse.getOrElse(key, 0L),
        s"cell $key must be the sparse count or an explicit zero")
    }
    // the operator only adds value if the corpus actually has gaps
    assert(dense.exists(_.getLong(2) == 0L),
      "test corpus should exercise at least one gap cell")
  }

  test("all three encodings serve identical instants") {
    val long = loadedMicros(fixture("long2")(col("ts_us") * lit(1000L)))._2
    val ntz = loadedMicros(fixture("ntz2")(timestamp_micros(col("ts_us")).cast(TimestampNTZType)))._2
    val ltz = loadedMicros(fixture("ltz2")(timestamp_micros(col("ts_us"))))._2
    assert(long === ntz)
    assert(ntz === ltz)
  }
}
