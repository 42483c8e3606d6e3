package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-dedup / upsert — the reference's "MERGE INTO".
  *
  * The reference expresses upsert as `concat` + `drop_duplicates(subset=key)`
  * with `keep="last"` (collection, new row wins —
  * `raw_data_collection/raw_data.py:252-261`) or `keep="first"` (feature
  * engineering, previously-engineered row wins —
  * `data_engineering/data_engineering.py:123-127`). pandas' keep-last over a
  * non-stable sort is order-undefined; we make the intent explicit and
  * deterministic with a priority column + `row_number` window.
  *
  * Scale: one hash-partitioned window over the key — a single shuffle, no
  * global sort; skew only if a single key repeats massively (not possible for
  * a primary key).
  */
object Upsert {

  /** Contract: each SIDE must be unique per key (true for both reference
    * call sites — hourly collection and engineered history). With
    * duplicate keys within one side, which duplicate survives is
    * tie-broken arbitrarily among equal priorities.
    */

  /** Incoming rows replace existing rows on key collision (upsert-keep-newest, D1). */
  def keepNewest(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    resolve(existing, incoming, keys, incomingWins = true)

  /** Existing rows win on key collision (dedup-keep-first, D2). */
  def keepFirst(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    resolve(existing, incoming, keys, incomingWins = false)

  private def resolve(existing: DataFrame, incoming: DataFrame,
                      keys: Seq[String], incomingWins: Boolean): DataFrame = {
    val e = existing.withColumn("__prio", lit(if (incomingWins) 0 else 1))
    val i = incoming.withColumn("__prio", lit(if (incomingWins) 1 else 0))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__prio").desc)
    e.unionByName(i, allowMissingColumns = true)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__prio", "__rn")
  }
}
