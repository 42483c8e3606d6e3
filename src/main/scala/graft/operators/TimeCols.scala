package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Shared timestamp normalization for the time-keyed operators.
  *
  * `unix_micros` / `cast("long")` reject TIMESTAMP_NTZ input (analysis
  * error), and the driver's testdata has already flipped `events.ts`
  * between physical flavors once (round 7) — so every time-keyed operator
  * normalizes NTZ to the session-local TimestampType up front, in ONE
  * place: a future change to this policy (different session-timezone
  * handling, DateType support) must not be applied to three divergent
  * copies. No-op on already-LTZ input; under a UTC session timezone the
  * wall-clock values are preserved.
  */
private[graft] object TimeCols {
  def ltz(df: DataFrame, on: String): DataFrame =
    if (df.schema(on).dataType == TimestampNTZType)
      df.withColumn(on, col(on).cast(TimestampType))
    else df
}
