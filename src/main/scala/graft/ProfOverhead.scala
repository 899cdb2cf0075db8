package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does the process CPU of a warm re-run actually go? (round 17)
  *
  * ProfD13 showed every Spark action at sf0.1 costing 3-25 process-CPU
  * seconds while the data work is microseconds — this probe splits a
  * query's process-CPU delta into (a) task CPU (executorCpuTime — real
  * data work), (b) task run-wall beyond CPU (blocked/fetch), (c) GC, and
  * (d) the unattributed remainder: driver planning + codegen compilation
  * + scheduler overhead. Prints Janino compile time from Spark's
  * CodegenMetrics alongside.
  */
object ProfOverhead {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.sources.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val taskCpu = new java.util.concurrent.atomic.AtomicLong(0)
    val taskRun = new java.util.concurrent.atomic.AtomicLong(0)
    val taskGc = new java.util.concurrent.atomic.AtomicLong(0)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0)
    val nStages = new java.util.concurrent.atomic.AtomicLong(0)
    val deserTime = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          taskCpu.addAndGet(m.executorCpuTime) // ns
          taskRun.addAndGet(m.executorRunTime) // ms
          taskGc.addAndGet(m.jvmGCTime) // ms
          deserTime.addAndGet(m.executorDeserializeTime)
          nTasks.incrementAndGet()
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        nStages.incrementAndGet(); ()
      }
    })
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def janinoMs: Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot
        .getValues.sum
    def janinoN: Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount

    def probe(name: String)(body: => Long): Unit = {
      // settle, then snapshot
      Thread.sleep(300)
      Thread.sleep(200) // let the listener bus drain
      val c0 = osBean.getProcessCpuTime
      val (tc0, tr0, tg0, nt0, ns0, j0, jn0) =
        (taskCpu.get, taskRun.get, taskGc.get, nTasks.get, nStages.get, janinoMs, janinoN)
      val w0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(200) // let the listener bus drain
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      val tCpu = (taskCpu.get - tc0) / 1e9
      val tRun = (taskRun.get - tr0) / 1e3
      val tGc = (taskGc.get - tg0) / 1e3
      println(f"[ovh] $name%-26s wall $wall%6.2f cpu $cpu%6.2f | taskCpu $tCpu%6.2f taskRun $tRun%6.2f gc $tGc%5.2f tasks ${nTasks.get - nt0}%5d stages ${nStages.get - ns0}%3d janino ${(janinoMs - j0)}%5d ms/${janinoN - jn0}%3d | rows $rows")
    }

    val docs = Tables.load(spark, dir, "documents")
    probe("warm count")(docs.count())
    probe("count again")(docs.count())
    probe("d13 cold")(operators.Dedup.d13TfidfCosine(spark, dir).count())
    probe("d13 warm")(operators.Dedup.d13TfidfCosine(spark, dir).count())
    probe("d13 warm2")(operators.Dedup.d13TfidfCosine(spark, dir).count())
    probe("d2b")(operators.Dedup.d2NgramJaccardCapped(spark, dir).count())
    probe("d2b again")(operators.Dedup.d2NgramJaccardCapped(spark, dir).count())
    probe("d10")(operators.Dedup.d10Containment(spark, dir).count())
    probe("d10 again")(operators.Dedup.d10Containment(spark, dir).count())
    probe("q51")(queries.ExtendedQueries.q51WaitingSupplier(spark, dir).count())
    probe("q51 again")(queries.ExtendedQueries.q51WaitingSupplier(spark, dir).count())
    probe("shuffle probe (calib)") {
      spark.range(0L, 8000000L, 1L, 32)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").agg(sum("v")).count()
      1L
    }
    spark.stop()
  }
}
