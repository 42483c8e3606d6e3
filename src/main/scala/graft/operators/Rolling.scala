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
  * keys skew WORSE than most keyed windows here (Spark recomputes sliding
  * frames per row — hot-key cost is rows x frame_size in one task);
  * [[trailingSkewSafe]] is the bucketed identical-output variant for when
  * one key dominates.
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

  /** Skew-safe two-phase [[trailing]] — identical output, bounded windows.
    *
    * [[trailing]]'s windows put ALL of a key's events in one task, and the
    * sliding RANGE frame makes that worse than linear: Spark recomputes
    * the frame aggregate per row (no retract support), so a hot key pays
    * O(rows x frame_size) in ONE task — measured on zipf(1.2) keys, the
    * hot-key task ran 5x the stage median while the same data's scd2
    * change-point window (linear per row) stayed AQE-balanced. This is
    * the day-bucketing mitigation [[trailing]]'s scaladoc names,
    * implemented with exact-output carry rows:
    *
    *   1. window per (key, bucket) — per-task work is bounded by a key's
    *      busiest bucket, not its lifetime;
    *   2. TIME carry: each bucket's last `windowSeconds` of rows duplicate
    *      into the next bucket as non-emitted context, so a RANGE frame
    *      near a bucket's start still sees its cross-boundary rows
    *      (`bucketSeconds >= windowSeconds` makes one bucket back enough —
    *      required);
    *   3. COUNT carry: the last `lastN - 1` rows of ALL earlier buckets
    *      (assembled on a one-row-per-(key, bucket) summary frame, so a
    *      sparse key whose previous rows sit many buckets back still gets
    *      its full ROWS frame) explode into the same context stream,
    *      minus rows the time carry already ships.
    *
    * The context union is a SUFFIX of each bucket's global predecessors
    * (time-carried rows are the newest rows of the previous bucket;
    * count-carried rows are the newest `lastN - 1` before those), so both
    * frames see exactly the rows the single-partition windows would —
    * context rows score frames but are filtered from the output.
    * OperatorsSpec pins output identity against [[trailing]]; StressSpec's
    * zipf tier pins the bounded task skew the plain path fails.
    */
  def trailingSkewSafe(events: DataFrame, key: String, tsCol: String,
                       idCol: String, valueCol: String, windowSeconds: Long,
                       lastN: Int, bucketSeconds: Long = 21600L): DataFrame = {
    require(windowSeconds > 0 && lastN > 0, "window sizes must be positive")
    require(bucketSeconds >= windowSeconds,
      s"bucketSeconds ($bucketSeconds) must cover windowSeconds ($windowSeconds) " +
        "so a range frame reaches at most one bucket back")
    val e = events.select(col(idCol), col(key), col(tsCol), col(valueCol))
      .withColumn("__tsec", col(tsCol).cast("long"))
      .withColumn("__bkt", floor(col("__tsec") / bucketSeconds))
    val cols = Seq(col(idCol), col(key), col(tsCol), col(valueCol),
      col("__tsec"), col("__bkt"))
    val own = e.select(cols :+ lit(true).as("__own"): _*)
    // rows within windowSeconds of their bucket's END also serve the next
    // bucket's early range frames
    val timeCarry = e
      .where(col("__tsec") >= (col("__bkt") + 1) * bucketSeconds - windowSeconds)
      .withColumn("__bkt", col("__bkt") + 1)
      .select(cols :+ lit(false).as("__own"): _*)
    val all =
      if (lastN == 1) own.unionByName(timeCarry)
      else {
        // newest lastN-1 rows per (key, bucket) — map-side WindowGroupLimit
        val wDesc = Window.partitionBy(col(key), col("__bkt"))
          .orderBy(col(tsCol).desc, col(idCol).desc)
        val tails = e.withColumn("__rk", row_number().over(wDesc))
          .where(col("__rk") < lastN)
          .groupBy(col(key), col("__bkt"))
          .agg(collect_list(struct(col("__tsec"), col(tsCol).as("__ts"),
            col(idCol).as("__id"), col(valueCol).as("__v"))).as("__tail"))
        // one row per NON-EMPTY (key, bucket): the summary window hops
        // empty buckets for free, so sparse keys carry correctly. The
        // frame is the previous lastN-1 SUMMARY rows, not unbounded: each
        // non-empty bucket contributes >= 1 row, so the newest lastN-1
        // global rows always sit within the newest lastN-1 non-empty
        // buckets — bounded per-row work (measured: the unbounded frame's
        // per-row flatten+sort of the whole history made this branch a
        // 12-second single task after AQE coalesced its tiny-bytes output)
        val n1 = lastN - 1
        val byBkt = Window.partitionBy(col(key)).orderBy(col("__bkt"))
        // collect_list over an empty frame yields an empty array (never
        // null), so the first bucket's __prev is simply empty
        val prevSorted = array_sort(flatten(collect_list(col("__tail"))
          .over(byBkt.rowsBetween(-n1, -1))))
        val countCarry = tails
          .withColumn("__prev", when(size(prevSorted) > n1,
            slice(prevSorted, -n1, n1)).otherwise(prevSorted))
          .select(col(key), col("__bkt"), explode(col("__prev")).as("__c"))
          // rows the time carry already ships would double-count the frames
          .where(col("__c.__tsec") < col("__bkt") * bucketSeconds - windowSeconds)
          .select(col("__c.__id").as(idCol), col(key), col("__c.__ts").as(tsCol),
            col("__c.__v").as(valueCol), col("__c.__tsec").as("__tsec"),
            col("__bkt"), lit(false).as("__own"))
        own.unionByName(timeCarry).unionByName(countCarry)
      }
    val byTime = Window.partitionBy(col(key), col("__bkt")).orderBy(col("__tsec"))
      .rangeBetween(-windowSeconds, 0)
    val byRows = Window.partitionBy(col(key), col("__bkt"))
      .orderBy(col(tsCol), col(idCol)).rowsBetween(-(lastN - 1), 0)
    all.select(col(idCol), col(key), col(tsCol),
        count(lit(1)).over(byTime).as("n_window"),
        round(sum(valueCol).over(byTime), 2).as("sum_window"),
        round(sum(valueCol).over(byRows), 2).as("sum_lastn"),
        col("__own"))
      .where(col("__own"))
      .drop("__own")
  }
}
