package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: attribute a declared query's WALL time to Spark jobs vs the
  * driver-side gaps between them (Catalyst planning, AQE re-planning,
  * checkpoint-round scheduling). The curate-family queries are gap-bound
  * at fixture scale (PLANS.md), so optimizing them means watching the job
  * COUNT and the inter-job idle, not task time — this prints exactly that.
  *
  * Usage: `Profile <sfDir> <queryName> [queryName ...]` — runs each query
  * once unmeasured (JIT/codegen warm), then once measured, and prints one
  * line per query: wall, #jobs, summed job span, inter-job idle, and the
  * executor CPU total (listener-fed, bus drained).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Profile <sfDir> <queryName> [...]")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    // per-stage: (n_tasks, summed task ms, max task ms, summed cpu ms)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, Array(e.time, -1L))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val a = jobs.get(e.jobId); if (a != null) a(1) = e.time
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics; if (m != null) cpu.addAndGet(m.executorCpuTime)
        if (e.taskInfo != null) {
          val a = stages.computeIfAbsent(e.stageId, _ => Array(0L, 0L, 0L, 0L))
          a.synchronized {
            a(0) += 1; a(1) += e.taskInfo.duration
            a(2) = math.max(a(2), e.taskInfo.duration)
            if (m != null) a(3) += m.executorCpuTime / 1000000L
          }
        }
      }
    })
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    args.tail.foreach { name =>
      run(name); clear() // warm
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      jobs.clear(); cpu.set(0); stages.clear()
      val t0 = System.currentTimeMillis()
      run(name)
      val t1 = System.currentTimeMillis()
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      clear()
      import scala.jdk.CollectionConverters._
      val spans = jobs.values.asScala.toSeq.filter(_(1) >= 0).sortBy(_(0))
      // inter-job idle: wall minus the union of job spans (jobs can overlap)
      var covered = 0L; var cursor = t0
      spans.foreach { case Array(s, e) =>
        val s2 = math.max(s, cursor)
        if (e > s2) { covered += e - s2; cursor = e } else cursor = math.max(cursor, e)
      }
      val wall = t1 - t0
      println(f"$name%-28s wall=${wall / 1000.0}%6.2fs jobs=${spans.size}%3d " +
        f"job_span=${covered / 1000.0}%6.2fs driver_gap=${(wall - covered) / 1000.0}%6.2fs " +
        f"cpu=${cpu.get / 1e9}%6.2fs")
      if (sys.env.get("GRAFT_PROFILE_STAGES").contains("1")) {
        stages.asScala.toSeq.sortBy(-_._2(1)).take(12).foreach { case (sid, a) =>
          println(f"  stage $sid%4d n=${a(0)}%4d task_sum=${a(1) / 1000.0}%7.2fs " +
            f"task_max=${a(2) / 1000.0}%6.2fs cpu_sum=${a(3) / 1000.0}%7.2fs")
        }
      }
    }
    spark.stop()
  }
}
