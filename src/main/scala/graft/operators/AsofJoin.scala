package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins (time-series point lookup), Spark-first.
  *
  * Reproduces the semantics of `pd.merge_asof` as used by the reference
  * (`raw_data_collection/raw_data.py:223-229`): left-preserving, nearest
  * match within an inclusive tolerance, equidistant tie broken toward the
  * earlier (backward) right row.
  *
  * Scale design: a naive formulation is a pure band join
  * (`abs(l.ts - r.ts) <= tol`), which Spark can only execute as a
  * broadcast-nested-loop / cartesian product — fine for a tiny right side,
  * quadratic at 100 TB. Instead we bucket both sides by
  * `floor(ts / tolerance)` and explode each RIGHT row into its bucket and
  * the two adjacent buckets: every pair within `tolerance` then shares an
  * equi-join key, so Catalyst plans a shuffle/broadcast HASH join that
  * partitions cleanly across executors. The per-left-row best match is
  * picked with a `row_number` window partitioned by the left row key —
  * also hash-partitioned, no global sort, no driver materialization.
  */
object AsofJoin {

  sealed trait Direction
  case object Nearest extends Direction
  case object Backward extends Direction
  case object Forward extends Direction

  /** Nearest-within-tolerance as-of join, pandas `merge_asof` parity.
    *
    * @param left      left (preserved) side
    * @param right     right (lookup) side; its `on` column is dropped from the output
    * @param on        timestamp column name present on both sides
    * @param toleranceSeconds inclusive match tolerance, in seconds
    * @param leftKey   a column (or combination) uniquely identifying left rows,
    *                  used to select the single best match per left row
    */
  def nearest(left: DataFrame, right: DataFrame, on: String,
              toleranceSeconds: Long, leftKey: Seq[String]): DataFrame =
    asof(left, right, on, toleranceSeconds, leftKey, Nearest)

  def backward(left: DataFrame, right: DataFrame, on: String,
               toleranceSeconds: Long, leftKey: Seq[String]): DataFrame =
    asof(left, right, on, toleranceSeconds, leftKey, Backward)

  def forward(left: DataFrame, right: DataFrame, on: String,
              toleranceSeconds: Long, leftKey: Seq[String]): DataFrame =
    asof(left, right, on, toleranceSeconds, leftKey, Forward)

  // NTZ inputs normalize through the shared TimeCols.ltz (see its note).
  private def ltz(df: DataFrame, on: String): DataFrame = TimeCols.ltz(df, on)

  def asof(left0: DataFrame, right0: DataFrame, on: String,
           toleranceSeconds: Long, leftKey: Seq[String],
           direction: Direction): DataFrame = {
    require(toleranceSeconds > 0, "tolerance must be positive")
    val left = ltz(left0, on)
    val right = ltz(right0, on)
    // Contract (was implicit): right payload columns land next to the full
    // left row, so any shared name other than `on` would make the final
    // equi-join ambiguous and silently mis-resolve. Fail fast instead.
    val collisions = right.columns.toSet.intersect(left.columns.toSet) - on
    require(collisions.isEmpty,
      s"right-side columns collide with left: ${collisions.mkString(", ")} — rename before joining")
    val tolMicros = toleranceSeconds * 1000000L

    val lt = col("__l_ts")
    val rt = col("__r_ts")

    // Left candidates: only key + timestamp travel through the join; the
    // full left payload is re-attached by a final equi-join on leftKey.
    val lSlim = left
      .select((leftKey.map(col) :+ unix_micros(col(on)).as("__l_ts")): _*)
      .withColumn("__l_bucket", floor(lt / tolMicros))

    // Right rows exploded into the 3 buckets any in-tolerance left row can
    // occupy. |l - r| <= tol  =>  floor(l/tol) ∈ {floor(r/tol)-1, .., +1}.
    val rCols = right.columns.filter(_ != on)
    val rExp = right
      .withColumn("__r_ts", unix_micros(col(on)))
      .drop(on)
      .withColumn("__r_bucket0", floor(rt / tolMicros))
      .withColumn("__l_bucket",
        explode(array(col("__r_bucket0") - 1, col("__r_bucket0"), col("__r_bucket0") + 1)))
      .drop("__r_bucket0")

    val inTol: Column = direction match {
      case Nearest  => abs(lt - rt) <= tolMicros
      case Backward => rt <= lt && (lt - rt) <= tolMicros
      case Forward  => rt >= lt && (rt - lt) <= tolMicros
    }
    val ordering: Seq[Column] = direction match {
      // pandas tie-break: equidistant -> earlier (backward) right row wins.
      case Nearest  => Seq(abs(lt - rt).asc, rt.asc)
      case Backward => Seq(rt.desc)
      case Forward  => Seq(rt.asc)
    }

    val cand = lSlim.join(rExp, Seq("__l_bucket")).where(inTol)
    val w = Window.partitionBy(leftKey.map(col): _*).orderBy(ordering: _*)
    val best = cand
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select((leftKey.map(col) ++ rCols.map(col)): _*)

    left.join(best, leftKey, "left")
  }
}
