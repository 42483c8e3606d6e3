package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass approximate per-group quantiles — the sketch face of the
  * exact `percentile_disc` surface (a6). Exact per-group percentiles need
  * every group's values sorted in one place; `percentile_approx` (Spark's
  * Greenwald–Khanna-style mergeable summary) is partial-aggregable: each
  * task folds its rows into a bounded sketch, the shuffle moves sketches
  * (O(accuracy) state per group per task, never the values), and the
  * merged sketch answers any quantile with RANK error <= n/accuracy —
  * the published GK guarantee. That is the 100-TB shape: one scan, one
  * tiny exchange, and the same aggregate runs unchanged inside a
  * watermarked streaming aggregation (a sorted exact percentile cannot).
  *
  * Sketch VALUES are engine-specific (DuckDB's reservoir-based
  * approx_quantile would not hash-match), so the declared query is the
  * AUDIT: [[withRankAudit]] joins each group's sketch output back to the
  * data, computes the returned values' empirical ranks exactly, and
  * emits per-group 0/1 flags for the rank-error bound — oracle-checkable
  * (the bound is a theorem: a red flag means the sketch, not the data),
  * the same gate discipline as the ANN recall rows (x2b/x7c/x47b).
  */
object Quantiles {

  /** Per-group approximate quantiles: one row per group, one
    * `p<NN>_approx` column per requested probability. The returned value
    * is always an actual element of the group's multiset (GK summaries
    * store observed values), which is what makes [[withRankAudit]]'s
    * exact rank check well-defined.
    */
  def approxByGroup(df: DataFrame, group: String, value: Column,
                    probs: Seq[Double], accuracy: Int = 1000): DataFrame =
    approxByGroups(df, Seq(col(group)), value, probs, accuracy)

  /** General grouping-expression form — the streaming face: pass
    * `window(col(ts), "1 hour")` plus keys on a watermarked frame and the
    * SAME aggregate runs as a streaming windowed quantile (sketches are
    * mergeable, so late rows fold into window state like any agg;
    * StreamingSpec proves closed windows within the rank bound). The
    * exact a6 surface cannot do this: `percentile_disc` needs the
    * window's full value multiset sorted at emit time.
    */
  def approxByGroups(df: DataFrame, groups: Seq[Column], value: Column,
                     probs: Seq[Double], accuracy: Int = 1000): DataFrame = {
    require(groups.nonEmpty, "approxByGroups needs at least one grouping column")
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0,1], got $probs")
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    // Labels round to whole percent; two probs that round the same (0.949
    // and 0.954) would emit DUPLICATE columns and the audit's col(...)
    // lookup would die later with an ambiguous-reference error — fail
    // with the real cause at call time instead.
    val labels = probs.map(p => f"p${math.round(p * 100)}%02d_approx")
    require(labels.distinct.size == labels.size,
      s"probabilities $probs round to duplicate column labels ${labels.mkString(", ")} — " +
        "use probabilities that differ by at least a whole percent")
    val aggs = probs.zip(labels).map { case (p, label) =>
      percentile_approx(value, lit(p), lit(accuracy)).as(label)
    }
    df.groupBy(groups: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The sketch's accuracy contract, checked exactly: for each group and
    * each probability p, the approx value's empirical rank window
    * [#{v < approx}, #{v <= approx}] must intersect
    * `p * n ± (n / accuracy + 1)` — the GK rank-error bound plus one row
    * of discretization slack. Emits (group, n, p<NN>_ok...) with 0/1
    * BIGINT flags; n and the flags replay cross-engine (the flags as the
    * constant 1 — the bound holds by theorem unless the sketch breaks).
    *
    * Scale shape: the sketch frame is one row per group — broadcast back
    * onto the data, so the audit is a second scan with a partial-agg'd
    * count, no shuffle of the values beyond the groupBy's own.
    */
  def withRankAudit(df: DataFrame, group: String, value: Column,
                    probs: Seq[Double], accuracy: Int = 1000): DataFrame =
    rankAudit(df, group, value, approxByGroup(df, group, value, probs, accuracy),
      probs, accuracy)

  /** The audit against a CALLER-SUPPLIED sketch frame (one row per group,
    * `p<NN>_approx` columns) — split out so the gate is falsifiable: a
    * sketch built at lower accuracy than the audited bound fails it
    * (QuantilesSpec proves the red path that way; the green theorem is
    * only meaningful because the tripwire can trip).
    */
  def rankAudit(df: DataFrame, group: String, value: Column,
                sketch: DataFrame, probs: Seq[Double],
                accuracy: Int): DataFrame = {
    val names = probs.map(p => f"p${math.round(p * 100)}%02d")
    require(names.distinct.size == names.size,
      s"probabilities $probs round to duplicate audit labels ${names.mkString(", ")}")
    val flags = probs.map { p =>
      val c = f"p${math.round(p * 100)}%02d"
      val slack = count(lit(1)).cast("double") / accuracy + 1.0
      val target = lit(p) * count(lit(1)).cast("double")
      (sum(when(value < col(s"${c}_approx"), 1L).otherwise(0L)).cast("double")
          <= target + slack &&
        sum(when(value <= col(s"${c}_approx"), 1L).otherwise(0L)).cast("double")
          >= target - slack)
        .cast("long").as(s"${c}_ok")
    }
    df.join(broadcast(sketch), group)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n"), flags: _*)
  }
}
