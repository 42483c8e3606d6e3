package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The band-join optimizer rule: a naive `abs(l − r) <= tol` inner join
  * must stop planning as a nested-loop join once the rule is registered,
  * with row-identical results; joins that already carry an equi-key
  * (AsofJoin's pre-bucketed shape) must pass through untouched.
  */
class BandJoinRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Other suites may have registered the rule on the shared session via
  // GraftExtensions.register (that IS the deployment path), so both
  // helpers set the exact state they need rather than assuming a baseline.
  private def withRule[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      before.filterNot(_ == BandJoinRewrite) :+ BandJoinRewrite
    try f finally spark.experimental.extraOptimizations = before
  }

  private def withoutRule[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before.filterNot(_ == BandJoinRewrite)
    try f finally spark.experimental.extraOptimizations = before
  }

  private lazy val sensors =
    (0L until 300L).map(i => (i, i * 7 % 1000)).toDF("s_id", "s_ts")
  private lazy val readings =
    (0L until 400L).map(i => (i, i * 13 % 1000)).toDF("r_id", "r_ts")

  private def bandJoin(): DataFrame =
    sensors.join(readings, abs(col("s_ts") - col("r_ts")) <= 25, "inner")

  test("naive band join: nested-loop without the rule, hash join with it") {
    val naive = withoutRule { bandJoin().queryExecution.executedPlan.toString }
    assert(naive.contains("BroadcastNestedLoopJoin"), naive)

    withRule {
      val p = bandJoin().queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("Generate explode"), p) // the 3-bucket right side
    }
  }

  test("rewrite is row-identical to the nested-loop plan") {
    val expected = withoutRule { bandJoin().collect().map(_.toSeq).toSet }
    val got = withRule { bandJoin().collect().map(_.toSeq).toSet }
    assert(got == expected && got.nonEmpty)
    // boundary rows (diff exactly tol) are present — bucket edges covered
    assert(got.exists { r =>
      math.abs(r(1).asInstanceOf[Long] - r(3).asInstanceOf[Long]) == 25
    })
  }

  test("long bands beyond 2^53 bucket exactly: no qualifying pair is dropped") {
    // epoch-nanos-scale ids: the ulp of a double at 1.7e18 is 256, so the
    // old double-arithmetic bucketing could put a truly-qualifying pair
    // (diff exactly tol) in buckets 2 apart and silently drop it from the
    // join output — the long path buckets in exact integer arithmetic
    val base = 1700000000000000000L
    val l = Seq((1L, base + 100L), (2L, base + 777L), (3L, base - 50L))
      .toDF("l_id", "l_ts")
    val r = Seq((10L, base + 200L), (11L, base + 999L), (12L, base - 150L))
      .toDF("r_id", "r_ts")
    def join() = l.join(r, abs(col("l_ts") - col("r_ts")) <= 100, "inner")
    val expected = withoutRule { join().collect().map(_.toSeq).toSet }
    assert(expected.nonEmpty)
    withRule {
      val p = join().queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), s"long band not rewritten:\n$p")
      assert(join().collect().map(_.toSeq).toSet == expected,
        "rewritten long band join dropped or invented pairs")
    }
    // negative values exercise the floor-vs-truncate divide distinction
    val ln = Seq((1L, -1000L), (2L, -907L)).toDF("l_id", "l_ts")
    val rn = Seq((10L, -950L), (11L, -850L)).toDF("r_id", "r_ts")
    def joinN() = ln.join(rn, abs(col("l_ts") - col("r_ts")) <= 100, "inner")
    val expN = withoutRule { joinN().collect().map(_.toSeq).toSet }
    withRule { assert(joinN().collect().map(_.toSeq).toSet == expN) }
  }

  test("non-deterministic band expressions never reach the rewrite") {
    // rand() in the band would make the rewrite evaluate one draw for the
    // bucket and a different draw in the kept predicate. The analyzer
    // already rejects non-deterministic join conditions outright
    // (INVALID_NON_DETERMINISTIC_EXPRESSIONS), so the rule can never see
    // one — this pins that upstream guarantee, and asBand's own
    // `deterministic` check stays as defense-in-depth should a future
    // Spark relax the analyzer.
    val l = (0L until 50L).map(i => (i, i.toDouble)).toDF("l_id", "l_v")
    val r = (0L until 50L).map(i => (i, i.toDouble)).toDF("r_id", "r_v")
    withRule {
      val e = intercept[Exception] {
        l.join(r, abs(col("l_v") * rand(7) - col("r_v")) <= 0.5, "inner").collect()
      }
      assert(e.getMessage.contains("NON_DETERMINISTIC"),
        s"expected the analyzer to reject the join, got: ${e.getMessage}")
    }
  }

  test("joins with an equi-key (as-of shape) are not double-bucketed") {
    withRule {
      // AsofJoin's internal join has bucket equality + band residual: the
      // rule must leave it alone (no Generate injected by the rewrite)
      val left = (0L until 50L).map(i => (i, i * 60)).toDF("l_id", "ts")
      val right = (0L until 50L).map(i => (i, i * 90)).toDF("r_id", "rts")
      val asof = graft.operators.AsofJoin.nearest(
        left.withColumn("datetime", timestamp_seconds(col("ts"))).drop("ts"),
        right.withColumn("datetime", timestamp_seconds(col("rts"))).drop("rts"),
        "datetime", toleranceSeconds = 120L, leftKey = Seq("l_id"))
      // AsofJoin has its OWN bucket explode; the rule must not add a
      // second layer — its marker columns must be absent
      val p = asof.queryExecution.executedPlan.toString
      assert(!p.contains("__band_bucket"), p)
      assert(asof.count() == 50) // left-preserving as always
    }
  }

  test("SQL surface: rule active via GraftExtensions.register") {
    // newSession: isolated temp views + isolated experimental methods,
    // so registration here never leaks into the shared test session
    val fresh = spark.newSession()
    graft.GraftExtensions.register(fresh)
    fresh.range(300).selectExpr("id AS s_id", "id * 7 % 1000 AS s_ts")
      .createOrReplaceTempView("band_sensors")
    fresh.range(400).selectExpr("id AS r_id", "id * 13 % 1000 AS r_ts")
      .createOrReplaceTempView("band_readings")
    val df = fresh.sql(
      """SELECT s_id, r_id FROM band_sensors JOIN band_readings
        |ON abs(s_ts - r_ts) <= 25""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(df.count() > 0)
  }
}
