package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: collapse a keyed
  * observation log — one row per (key, observation time) carrying the
  * entity's attributes as seen at that time — into validity intervals.
  * Consecutive observations with identical tracked attributes merge into
  * one row `[valid_from, valid_to)`; `valid_to` is null (and `is_current`
  * = 1) on each key's last run. This is [[SnapshotDiff]]'s longitudinal
  * twin: the diff says WHAT changed between two snapshots, the SCD2
  * history says WHEN each value was in effect across all of them — the
  * standard warehouse shape for point-in-time joins ("which status did
  * this user have when the order was placed?").
  *
  * Scale shape: ONE shuffle end-to-end. Change-point detection (lag of
  * the packed attribute struct, null-safe `<=>` so nulls never fake a
  * change) and the interval close (lead of the next change point) ride
  * the same hashpartitioning(key) + sort — the intervening filter keeps
  * ordering and distribution, so Catalyst plans a single Exchange
  * (pinned in PlanSpec). Output size is the number of VALUE CHANGES, not
  * observations — on an append-only 100 TB event log this is exactly the
  * compaction that makes dimension history queryable at all. Nothing
  * driver-side; tie-breaking is total given `orderCols` extends the
  * observation time with a unique id.
  */
object Scd2 {

  /** @param orderCols observation order per key; head is the validity
    *                  timeline (becomes `valid_from`/`valid_to`), the
    *                  rest only break ties deterministically.
    * @param trackCols attributes whose changes open a new interval. */
  def history(obs: DataFrame, key: String, orderCols: Seq[String],
              trackCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "scd2 needs an observation order column")
    require(trackCols.nonEmpty, "scd2 needs at least one tracked column")
    val byObs = Window.partitionBy(key).orderBy(orderCols.map(col): _*)
    val tracked = struct(trackCols.map(col): _*)
    // First row per key: lag is null, and null <=> struct is false, so the
    // run opener is flagged without a special case.
    obs.withColumn("__chg", !(tracked <=> lag(tracked, 1).over(byObs)))
      .where(col("__chg"))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(byObs))
      .select(
        (col(key) +: trackCols.map(col)) ++ Seq(
          col(orderCols.head).as("valid_from"),
          col("valid_to"),
          col("valid_to").isNull.cast("long").as("is_current")): _*)
  }
}
