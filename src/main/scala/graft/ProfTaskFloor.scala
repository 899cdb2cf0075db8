package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-task CPU floor at local[32] (round 17): the overhead probe showed
  * a trivial 8M-row shuffle consuming ~9 s of TASK CPU (~270 ms/task) —
  * 100x the data work. This isolates how task CPU scales with partition
  * count and concurrency for a fixed tiny workload, to decide whether the
  * suite's CPU is dominated by per-task fixed cost (then: fewer
  * partitions for small stages) or by something per-row. */
object ProfTaskFloor {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // conf matrix via env, e.g. PROF_CONF="spark.shuffle.compress=false,spark.shuffle.sort.bypassMergeThreshold=0"
    sys.env.get("PROF_CONF").foreach(_.split(",").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    println(s"[floor] conf: ${sys.env.getOrElse("PROF_CONF", "(default)")}")
    spark.sparkContext.setLogLevel("ERROR")
    val taskCpu = new java.util.concurrent.atomic.AtomicLong(0)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        if (e.taskMetrics != null) {
          taskCpu.addAndGet(e.taskMetrics.executorCpuTime)
          nTasks.incrementAndGet()
        }
      }
    })
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def run(name: String)(body: => Unit): Unit = {
      Thread.sleep(300)
      val c0 = osBean.getProcessCpuTime; val tc0 = taskCpu.get; val nt0 = nTasks.get
      val w0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(200)
      val dt = nTasks.get - nt0
      println(f"[floor] $name%-34s wall $wall%6.3f cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%6.2f taskCpu ${(taskCpu.get - tc0) / 1e9}%6.2f tasks $dt%4d cpu/task ${(taskCpu.get - tc0) / 1e6 / math.max(1, dt)}%8.1f ms")
    }
    def shuffle(rows: Long, parts: Int): Unit =
      spark.range(0L, rows, 1L, parts)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").agg(sum("v")).count()

    // warm codegen/plans
    shuffle(8000000L, 32); shuffle(8000000L, 32)
    run("shuffle 8M rows 32 parts")(shuffle(8000000L, 32))
    run("shuffle 8M rows 32 parts (2)")(shuffle(8000000L, 32))
    run("shuffle 8M rows 8 parts")(shuffle(8000000L, 8))
    run("shuffle 8M rows 8 parts (2)")(shuffle(8000000L, 8))
    run("shuffle 8M rows 1 part")(shuffle(8000000L, 1))
    run("shuffle 80k rows 32 parts")(shuffle(80000L, 32))
    run("shuffle 80k rows 32 parts (2)")(shuffle(80000L, 32))
    run("shuffle 80k rows 1 part")(shuffle(80000L, 1))
    // pure scan, no shuffle
    def scan(rows: Long, parts: Int): Unit =
      spark.range(0L, rows, 1L, parts).selectExpr("sum(id)").count()
    scan(8000000L, 32)
    run("scan-agg 8M 32 parts")(scan(8000000L, 32))
    run("scan-agg 8M 1 part")(scan(8000000L, 1))
    // single-threaded reference for the same arithmetic
    run("local loop 8M (driver)") {
      var s = 0L; var i = 0L
      while (i < 8000000L) { s += i % 1000; i += 1 }
      if (s == 42) println("")
    }
    spark.stop()
  }
}
