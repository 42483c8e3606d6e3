package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.Dedup

/** Scale-stress tier: the PlanSpec shape guards re-checked on a corpus
  * ~20x the sf0.001 fixture, plus coarse runtime-growth bounds on the
  * pair operators. A plan that is secretly quadratic (all-pairs join, lost
  * blocking) turns 20x data into ~400x work; the generous <=80x runtime
  * bound catches that while staying far from timing-noise flakiness
  * (plan-compile overhead dominates the 1x timings, which only makes the
  * measured ratio SMALLER). Each replica's words are salted with the
  * replica id, so near-dup structure replicates within a cohort but never
  * across cohorts — output pair counts, and therefore honest runtime, grow
  * linearly in the multiplier by construction.
  */
class StressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** `mult` word-salted replicas of the documents fixture, materialized
    * (eager localCheckpoint) so timings below measure the operator, not
    * the synthesis.
    */
  private def corpus(mult: Int): DataFrame = {
    val base = graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "source")
    base.crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        (col("doc_id") * mult + col("rep")).as("doc_id"),
        concat_ws(" ",
          transform(split(col("text"), " "),
            w => concat(w, lit("_"), col("rep")))).as("text"),
        col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .localCheckpoint(true)
  }

  private def timeRun(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def minhash(c: DataFrame) = Dedup.minhashPairs(c, minJaccard = 0.8)
  private def simhash(c: DataFrame) = Dedup.simhashPairs(c, maxHamming = 10)
  private def incremental(c: DataFrame) = Dedup.incrementalDedup(
    c.where(col("doc_id") % 7 === 0), c.where(col("doc_id") % 7 =!= 0),
    lenCol = "n_chars", tol = 16, minJaccard = 0.5)
  private def spans(c: DataFrame) = Dedup.duplicatedSpans(c, k = 8)
  private def spanDecon(c: DataFrame) = Dedup.spanDecontaminate(
    c.where(col("doc_id") % 10 =!= 0), c.where(col("doc_id") % 10 === 0), k = 8)
  private def collapse(c: DataFrame) = Dedup.collapseComponents(c,
    Dedup.ngramJaccardPairs(c, lenCol = "n_chars", tol = 16, minJaccard = 0.5))
  private def boiler(c: DataFrame) =
    graft.ext.TextStats.removeBoilerplate(c, k = 3, minDocs = 5)

  test("20x corpus: pair-operator plan shapes hold (no cartesian, blocking joins intact)") {
    val big = corpus(20)
    for ((name, q) <- Seq(("minhash", minhash(big)), ("simhash", simhash(big)),
                          ("incremental", incremental(big)), ("spans", spans(big)),
                          ("spanDecon", spanDecon(big)), ("collapse", collapse(big)),
                          ("boiler", boiler(big)))) {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name went all-pairs:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name lost its equi-join:\n$p")
    }
    assert(incremental(big).queryExecution.executedPlan.toString
      .contains("sortedintersectsize"), "near tier lost the codegen'd intersect")
  }

  test("20x corpus: dedup runtime grows ~linearly, never pairwise",
      org.scalatest.tagobjects.Slow) {
    val small = corpus(1)
    val big = corpus(20)
    for ((name, q) <- Seq[(String, DataFrame => DataFrame)](
        ("minhash", minhash), ("simhash", simhash), ("incremental", incremental),
        ("spans", spans), ("spanDecon", spanDecon))) {
      q(small).write.format("noop").mode("overwrite").save() // warm codegen/JIT
      var t1 = timeRun(q(small))
      var t20 = timeRun(q(big))
      if (t20 > 80 * t1 + 5.0) {
        // The sandbox hypervisor stalls single measurements 2-10x
        // (BASELINE.md "Round-5 measurements"); a genuine quadratic
        // blowup reproduces, a stall doesn't — so re-measure once and
        // judge the favorable pair before declaring a regression.
        t1 = math.max(t1, timeRun(q(small)))
        t20 = math.min(t20, timeRun(q(big)))
      }
      assert(t20 <= 80 * t1 + 5.0,
        f"$name: 20x data took ${t20 / t1}%.1fx the 1x time ($t1%.2fs -> $t20%.2fs) " +
          "— quadratic blowup suspected (reproduced across two measurements)")
    }
  }
}
