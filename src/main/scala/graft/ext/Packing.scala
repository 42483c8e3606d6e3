package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training (SURVEY.md §7.4 adjacents): group
  * documents into training sequences of at most `maxTokens` tokens by
  * chunked cumulative sum over a deterministic hash order.
  *
  * Why hash order: packing is an order-dependent decision, and ordering by
  * [[Sampling.hashUnit]] makes it reproducible and partition-independent
  * (same corpus -> same sequences on any cluster), while also shuffling
  * documents pseudo-randomly so a sequence mixes unrelated documents — the
  * usual requirement for pretraining batches.
  *
  * Why buckets: a single global running sum would serialize into one
  * window task. Documents are first split into `nBuckets` independent hash
  * buckets and packed within each — every bucket is a parallel window
  * partition, so parallelism is `nBuckets` regardless of corpus size (set
  * it to ~the cluster's core count at scale; sequences never cross
  * buckets).
  *
  * Packing rule: within a bucket, a document with inclusive running token
  * sum `cum` lands in sequence `floor((cum - 1) / maxTokens)` — chunked
  * cumsum, the scalable approximation of greedy first-fit (exact first-fit
  * is inherently sequential). A sequence can overflow `maxTokens` only by
  * less than the token count of its first document, so with documents
  * pre-truncated to `maxTokens` (upstream policy) every sequence fits in
  * `2*maxTokens - 1` and the average fill is high. Deterministic,
  * window-function-only — DuckDB replays it exactly.
  */
object Packing {

  /** Assign each row a (bucket, seq_id): `seq_id` is the 0-based sequence
    * number within the row's hash bucket. `tokens` must be a positive
    * per-row token count (e.g. [[TextStats.tokenCount]]).
    */
  def packSequences(df: DataFrame, tokens: Column, maxTokens: Int,
                    nBuckets: Int, key: String,
                    salt: String = "pack"): DataFrame = {
    val u = Sampling.hashUnit(col(key), salt)
    val w = Window.partitionBy(col("bucket")).orderBy(col("__u"), col(key))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__u", u)
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("bucket", floor(col("__u") * nBuckets).cast("long"))
      .withColumn("seq_id",
        floor((sum(col("n_tokens")).over(w) - lit(1.0)) / maxTokens).cast("long"))
      .drop("__u")
  }
}
