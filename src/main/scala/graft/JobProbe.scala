package graft

import scala.collection.mutable

/** Scratch per-job profiler (local dev only; the driver never runs it):
  * runs each named query once against `SPARK_GRAFT_SF_DIR` with a
  * listener attached and prints one line per Spark JOB — duration, task
  * count, input/shuffle bytes, and the job's call site — so the cost of
  * a composite lifecycle (a foreachBatch stream, an iterative operator)
  * can be attributed to its internal passes instead of guessed from the
  * total. The guide's "measure first" applied to multi-job queries,
  * where a single explain() shows only the final read-back. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    case class JobRec(id: Int, var desc: String, start: Long,
        var end: Long = 0L, var tasks: Int = 0, var inputBytes: Long = 0L,
        var shuffleRead: Long = 0L, var shuffleWrite: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]

    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
          e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        }
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          for (jid <- stageToJob.get(e.stageId); j <- jobs.get(jid);
               m <- Option(e.taskMetrics)) {
            j.tasks += 1
            j.inputBytes += m.inputMetrics.bytesRead
            j.shuffleRead += m.shuffleReadMetrics.totalBytesRead
            j.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          }
        }
    }
    sc.addSparkListener(listener)

    val reps = sys.env.getOrElse("SPARK_GRAFT_JOBPROBE_REPS", "2").toInt
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      // warm reps: rep 1 pays codegen/JIT/footer-cache startup exactly as
      // the bench's min-of-N discards; only the LAST rep's jobs print
      var dt = 0.0
      var wall0 = 0L
      for (r <- 1 to reps) {
        // drain before clearing so in-flight events from the prior rep
        // cannot land in (and pollute) the fresh ledger (r18 ADVICE)
        org.apache.spark.GraftSparkBridge.drainListenerBus(sc)
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        wall0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        dt = (System.nanoTime() - t0) / 1e9
        println(f"[jobprobe] $name rep $r: $dt%.3f s")
      }
      // drain the listener bus (r18 ADVICE: a fixed sleep raced late
      // onTaskEnd/onJobEnd events and undercounted task/byte metrics)
      org.apache.spark.GraftSparkBridge.drainListenerBus(sc)
      println(f"[jobprobe] $name total $dt%.3f s, ${jobs.size} jobs")
      jobs.synchronized {
        jobs.values.foreach { j =>
          val d = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
          val off = (j.start - wall0) / 1e3
          println(f"[jobprobe]   job ${j.id}%3d @$off%7.3f ${d}%7.3f s tasks ${j.tasks}%4d " +
            f"in ${j.inputBytes / 1e6}%8.1f MB sr ${j.shuffleRead / 1e6}%8.1f MB " +
            f"sw ${j.shuffleWrite / 1e6}%8.1f MB  ${j.desc.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
