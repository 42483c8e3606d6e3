package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering column derivations
  * (`data_engineering/data_engineering.py:31-78`), with the pandas/Spark
  * semantic gotchas resolved (SURVEY.md §2.7):
  *
  *   - `day_of_week` uses [[functions.weekday]] (Monday=0), NOT `dayofweek`
  *     (Sunday=1) — pandas `dt.dayofweek` is Monday=0 (`data_engineering.py:34`).
  *   - `week_of_year` = ISO-8601 week in both pandas and Spark `weekofyear`.
  *   - `clip(lower=0)` preserves NaN/null in pandas; Spark `greatest` would
  *     skip nulls and return 0, so [[clipLower0]] null-guards.
  *
  * All derivations are built-in, codegen'd column expressions — they stay
  * inside one WholeStageCodegen span, no UDFs, no shuffle.
  */
object Features {

  /** pandas `(x).clip(lower=0)`: null in → null out (`data_engineering.py:54-55`). */
  def clipLower0(c: Column): Column =
    when(c.isNull, lit(null).cast("double")).otherwise(greatest(lit(0.0), c))

  private val TwoPi = 2.0 * math.Pi

  /** Temporal + cyclical features (`data_engineering.py:31-47`). */
  def withTemporal(df: DataFrame, ts: String = "datetime"): DataFrame = {
    val t = col(ts)
    df.withColumn("hour", hour(t))
      .withColumn("day_of_week", weekday(t)) // Monday=0, pandas dt.dayofweek parity
      .withColumn("month", month(t))
      .withColumn("day_of_month", dayofmonth(t))
      .withColumn("week_of_year", weekofyear(t)) // ISO-8601 in pandas + Spark
      .withColumn("is_weekend", (col("day_of_week") >= 5).cast("int"))
      .withColumn("is_peak_hour", col("hour").between(17, 21).cast("int")) // inclusive
      .withColumn("is_night", (col("hour") === 23 || col("hour").between(0, 6)).cast("int"))
      .withColumn("hour_sin", sin(lit(TwoPi) * col("hour") / 24))
      .withColumn("hour_cos", cos(lit(TwoPi) * col("hour") / 24))
      .withColumn("month_sin", sin(lit(TwoPi) * col("month") / 12))
      .withColumn("month_cos", cos(lit(TwoPi) * col("month") / 12))
  }

  /** Interaction / derived features (`data_engineering.py:50-60`). */
  def withInteractions(df: DataFrame): DataFrame =
    df.withColumn("renewable_pct", col("`uk_gen_wind_%`") + col("`uk_gen_solar_%`"))
      .withColumn("fossil_pct", col("`uk_gen_gas_%`"))
      .withColumn("heating_demand", clipLower0(lit(18.0) - col("temperature_C")))
      .withColumn("cooling_demand", clipLower0(col("temperature_C") - lit(22.0)))
      .withColumn("wind_solar_combined", col("`uk_gen_wind_%`") * col("solar_radiation_Wm2"))
      .withColumn("carbon_per_price",
        col("carbon_intensity_actual") / (col("`retail_price_£_per_kWh`") + lit(1e-6)))

  /** Columns log1p-transformed by the reference (`data_engineering.py:66-70`). */
  val logColumns: Seq[String] = Seq(
    "so2", "pm2_5", "co", "no2", "pm10", "solar_radiation_Wm2", "uk_gen_solar_%", "aqi_us")

  /** `log_<c> = log1p(fillna(c, 0))`, existence-guarded (`data_engineering.py:63-78`). */
  def withLogTransforms(df: DataFrame, cols: Seq[String] = logColumns): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(s"log_$c", log1p(coalesce(col(s"`$c`"), lit(0.0))))
    }
}
