package graft

import org.apache.spark.sql.functions._

/** Throwaway perf bisection driver (not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Array[Long])]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        stages.putIfAbsent(e.stageInfo.stageId, (e.stageInfo.name, Array(0L, 0L, 0L)))
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val v = stages.get(e.stageId)
        if (v != null && e.taskMetrics != null) v._2.synchronized {
          v._2(0) += 1
          v._2(1) += e.taskInfo.duration
          v._2(2) += e.taskMetrics.executorCpuTime / 1000000L
        }
      }
    })
    val e = Tables.embeddings(spark, dir)
    def report(label: String)(f: => Long): Unit = {
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      stages.clear()
      val t0 = System.nanoTime(); val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val big = stages.asScala.toSeq.filter(_._2._2(0) >= 16).sortBy(_._1)
      val cpu = stages.asScala.toSeq.map(_._2._2(2)).sum / 1000.0
      println(f"== $label%-28s $wall%.2f s wall  $cpu%.2f s cpu  rows=$n")
      big.foreach { case (sid, (_, a)) =>
        println(f"   stage $sid%4d n=${a(0)}%4d cpu=${a(2) / 1000.0}%7.2fs")
      }
    }
    e.count()
    report("ivfIndex iters=4") {
      val (cells, cent) = ext.SimSearch.ivfIndex(e, nCells = 16, lloydIters = 4)
      cells.count() + cent.count()
    }
    spark.stop()
  }
}
