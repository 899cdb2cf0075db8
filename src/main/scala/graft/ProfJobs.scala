package graft

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-JOB breakdown of a single query (optimization round 17, guide §1):
  * runs the named queries twice (pass 1 pays plan/codegen/cache-build,
  * pass 2 is steady state) and prints, for each Spark job of the pass-2
  * run, its wall, task count, task-CPU and the first line of its call
  * site — the map from a query's wall to the ACTIONS that spend it.
  * This is what the bench/ProfCpu totals can't show: whether a slow
  * query is one big job or forty sequential tiny ones (driver-bound).
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfJobs <query1,query2,...>")
    val names = args(0).split(",").toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.sources.GraftExtensions())
      .master(s"local[$cpus]")
      .appName("graft-profjobs")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, desc: String, site: String, t0: Long,
        var t1: Long = 0L, var tasks: Long = 0L, var cpuNs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.HashMap[Int, Int]()
    var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (record) {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, desc, site, System.nanoTime())
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.t1 = System.nanoTime())
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += 1
            if (e.taskMetrics != null) j.cpuNs += e.taskMetrics.executorCpuTime
          }
        }
    })

    Tables.all.foreach(t => Tables.load(spark, dir, t).count())
    queries.CoreQueries.q11MultiJoin(spark, dir).count()
    operators.Similarity.ivfIndexDir(spark, dir)
    operators.Similarity.ivfPqIndexDir(spark, dir)
    queries.MutationQueries.warmTemplate(spark, dir)

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val w1 = System.nanoTime()
      fn(spark, dir).count() // pass 1: plan/codegen/caches
      val w1s = (System.nanoTime() - w1) / 1e9
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      record = true
      val w2 = System.nanoTime()
      fn(spark, dir).count()
      val w2s = (System.nanoTime() - w2) / 1e9
      record = false
      Thread.sleep(100) // listener drain
      println(f"[profjobs] === $n p1 $w1s%.2fs p2 $w2s%.2fs jobs=${jobs.size} ===")
      jobs.values.foreach { j =>
        val wall = if (j.t1 == 0) Double.NaN else (j.t1 - j.t0) / 1e9
        val what = if (j.desc.nonEmpty) j.desc else j.site
        println(f"[profjobs]   job ${j.id}%4d wall $wall%6.3f tasks ${j.tasks}%4d " +
          f"cpu ${j.cpuNs / 1e9}%6.2f  $what")
      }
    }
    spark.stop()
  }
}
