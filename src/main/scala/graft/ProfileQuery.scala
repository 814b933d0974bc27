package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Job-level profiler behind the optimization rounds: runs each named
  * registry query once (warm) with a listener that records every Spark
  * job's wall time and call site, so the per-query cost decomposes into
  * its constituent actions (eager checkpoints, driver collects, the
  * final noop write). Diagnostic only — never part of the driver
  * contract.
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <query> [query...]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQuery <sfDir> <query> [query...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, desc: String, site: String, start: Long,
                   var end: Long = 0L, var nTasks: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        val site = Option(e.properties.getProperty("callSite.short")).getOrElse("")
        jobs(e.jobId) = Job(e.jobId, desc, site, e.time,
          nTasks = e.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
    })

    for (name <- args.drop(1)) {
      val fn = SparkEntry.queries(name)
      // warm-up run outside the profile: JIT + codegen + footer caches
      fn(spark, args(0)).write.mode("overwrite").format("noop").save()
      jobs.synchronized(jobs.clear())
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, args(0)).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"==== $name%s wall=$wall%.2fs ====")
      jobs.synchronized {
        var prevEnd = 0L
        jobs.values.foreach { j =>
          val dur = (j.end - j.start) / 1e3
          val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1e3
          prevEnd = j.end
          println(f"job ${j.id}%3d ${dur}%7.2fs gap=${gap}%6.2fs tasks=${j.nTasks}%4d ${j.site}%s")
        }
        val sumJobs = jobs.values.map(j => (j.end - j.start) / 1e3).sum
        println(f"sum(jobs)=$sumJobs%.2fs driver-gaps=${wall - sumJobs}%.2fs")
      }
    }
    spark.stop()
  }
}
