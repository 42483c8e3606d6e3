package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of declared queries.
  *
  * Usage: `runMain graft.Explain <sfDir> <queryName> [queryName ...]`
  * (PLANS.md excerpts are regenerated with this; PlanSpec pins the
  * load-bearing shapes in CI.)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <queryName> [...]")
    val sfDir = args.head
    // SPARK_GRAFT_CPUS speeds up the stateful queries' store writes;
    // shuffle partitions stay pinned at 4 so plan text (Exchange
    // partition counts) is comparable across captures regardless of the
    // driving machine's width.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
