package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet fixture tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * through here so scans stay uniform: plain parquet scans that Catalyst can
  * prune/push into (verified via `.explain` — `PushedFilters`/`ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The driver has shipped `events.ts` in two physical shapes across
    * testdata regenerations, and this loader normalizes both to a session-
    * local TimestampType so every downstream operator sees one type:
    *   - TIMESTAMP(NANOS), which Spark 4 refuses to map to TimestampType:
    *     read nanos as long (legacy flag) and truncate to microseconds —
    *     the same truncation DuckDB's `CAST(ts AS TIMESTAMP)` applies;
    *   - timestamp[us] with isAdjustedToUTC=false, which Spark 4 reads as
    *     TIMESTAMP_NTZ: cast to TimestampType. Under the UTC session
    *     timezone (set by Verify/Bench/tests) the wall-clock values are
    *     preserved, matching the oracle's `CAST(ts AS TIMESTAMP)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-WIDE side effect, deliberately not restored: the flag is
    // captured at physical-planning time, so resetting it after this lazy
    // read would break the returned frame's own later execution. The only
    // behavior change for other reads is that TIMESTAMP(NANOS) parquet
    // columns arrive as bigint instead of failing the scan — every such
    // read in this engine goes through this loader anyway, which
    // normalizes them. Out-of-engine callers sharing the session should
    // know the flag is on.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // `div` = exact integer division; `/` would go through double and
        // lose precision above 2^53 (epoch-nanos are ~1.7e18).
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
