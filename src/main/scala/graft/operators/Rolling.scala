package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window aggregates per key over event time — the feature shape
  * behind "activity in the last hour" / "sum of the last N readings"
  * signals (fraud velocity checks, rate features, trend inputs). Two
  * frames on one pass:
  *   - a RANGE frame over epoch seconds (`[t - windowSeconds, t]`,
  *     inclusive both ends — equal-timestamp rows are peers and all
  *     included, which keeps the result independent of intra-tick order);
  *   - a ROWS frame over the last `lastN` observations, tie-broken by
  *     `idCol` so the frame is total-ordered and deterministic.
  *
  * Scale shape: one shuffle on the key; both window specs share the
  * partitioning and differ only in sort, so the plan is Exchange + two
  * in-partition sorts — no second exchange (pinned in PlanSpec). Frames
  * are bounded (an hour / N rows), so state per task is O(frame), not
  * O(partition); an unbounded-preceding running sum this is not. Long-hot
  * keys skew like any keyed window — at cluster scale the same
  * day-bucketing used by [[Sessionize.sessionsSkewSafe]] applies, since a
  * trailing hour never crosses a day boundary by more than one bucket.
  */
object Rolling {

  def trailing(events: DataFrame, key: String, tsCol: String, idCol: String,
               valueCol: String, windowSeconds: Long, lastN: Int): DataFrame = {
    require(windowSeconds > 0 && lastN > 0, "window sizes must be positive")
    // Cast-to-long truncates to whole epoch seconds — the same truncation
    // the oracle's epoch_us(...) // 1_000_000 applies, so frame membership
    // agrees across engines even on sub-second timestamps.
    val byTime = Window.partitionBy(key).orderBy(col(tsCol).cast("long"))
      .rangeBetween(-windowSeconds, 0)
    val byRows = Window.partitionBy(key).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(lastN - 1), 0)
    events.select(col(idCol), col(key), col(tsCol),
      count(lit(1)).over(byTime).as("n_window"),
      round(sum(valueCol).over(byTime), 2).as("sum_window"),
      round(sum(valueCol).over(byRows), 2).as("sum_lastn"))
  }
}
