package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch z-score scaling — sklearn `StandardScaler` parity
  * (`data_engineering/data_engineering.py:81-97`):
  *
  *   - `fillna(0)` before fitting AND transforming (`:93`);
  *   - POPULATION stddev (sklearn ddof=0) — Spark's `stddev` is sample
  *     stddev, so this uses [[functions.stddev_pop]];
  *   - zero-variance columns divide by 1.0 (sklearn's guard).
  *
  * Scale design: fit is a single partial-aggregable `agg` (map-side combine,
  * one tiny shuffle); the fitted means/stds are a ONE-ROW DataFrame attached
  * back via `crossJoin(broadcast(...))`, keeping the whole fit+transform
  * lazy, in-plan, and free of driver-side `.collect()` loops — at 100 TB the
  * stats row is still one row.
  */
object Scaling {

  /** Columns scaled by the reference (`data_engineering.py:84-89`). */
  val referenceColumns: Seq[String] = Seq(
    "temperature_C", "wind_speed_mps", "humidity_%",
    "carbon_intensity_actual", "uk_gen_wind_%", "uk_gen_gas_%")

  /** Adds `<prefix><c>` = (fillna(c,0) − mean) / stddev_pop for each column.
    * Fit scope is `df` itself — the reference fits on the current delta batch
    * only (`data_engineering.py:118-121`); callers choose the scope by
    * choosing `df`.
    */
  def zscore(df: DataFrame, cols: Seq[String], prefix: String = "scaled_"): DataFrame = {
    val present = cols.filter(df.columns.contains)
    if (present.isEmpty) return df
    val aggs = present.flatMap { c =>
      val filled = coalesce(col(s"`$c`"), lit(0.0))
      Seq(avg(filled).as(s"__mean_$c"), stddev_pop(filled).as(s"__std_$c"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val scaled = present.foldLeft(df.crossJoin(broadcast(stats))) { (d, c) =>
      val std = col(s"`__std_$c`")
      val safeStd = when(std.isNull || std === 0.0, lit(1.0)).otherwise(std)
      d.withColumn(s"$prefix$c",
        (coalesce(col(s"`$c`"), lit(0.0)) - coalesce(col(s"`__mean_$c`"), lit(0.0))) / safeStd)
    }
    scaled.drop(present.flatMap(c => Seq(s"__mean_$c", s"__std_$c")): _*)
  }
}
