package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Batch gap-based sessionization — the batch twin of
  * [[graft.streaming.EventStreams]]' stateful sessionizer: a new session
  * starts when the gap to the previous event of the same key exceeds
  * `gapSeconds`.
  *
  * Scale shape: ONE shuffle end-to-end. Gap detection (lag), session
  * numbering (running sum), and the per-session rollup all ride the same
  * hashpartitioning(key) — Catalyst proves the rollup's grouping keys
  * (key, session_seq) are a superset of the window partitioning, so no
  * second exchange is planned (verified in PLANS.md). Long-running keys
  * skew into single partitions like any keyed window; pre-split
  * pathological keys by day before sessionizing if one key dominates.
  */
object Sessionize {

  /** Attach `session_seq` (1-based per key, ordered by `tsCol`). */
  def assign(df0: DataFrame, keyCol: String, tsCol: String,
             gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gap must be positive")
    // TIMESTAMP_NTZ can't `cast("long")` (analysis error) — normalize to the
    // session-local TimestampType first; no-op on LTZ input, wall-clock
    // values preserved under the UTC session timezone.
    val df =
      if (df0.schema(tsCol).dataType == TimestampNTZType)
        df0.withColumn(tsCol, col(tsCol).cast(TimestampType))
      else df0
    val byTs = Window.partitionBy(keyCol).orderBy(tsCol)
    val gap: Column =
      col(tsCol).cast("long") - lag(col(tsCol), 1).over(byTs).cast("long")
    df.withColumn("__new", when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_seq", sum("__new").over(byTs))
      .drop("__new")
  }

  /** One row per (key, session): event count and time bounds. */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
               gapSeconds: Long): DataFrame =
    assign(df, keyCol, tsCol, gapSeconds)
      .groupBy(keyCol, "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min(tsCol).as("session_start"), max(tsCol).as("session_end"))
}
