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

  /** Split documents into overlapping token windows — the chunking step
    * of an embedding/RAG pipeline: chunk i covers words
    * `[i*stride, i*stride + chunkTokens)`; consecutive chunks overlap by
    * `chunkTokens - stride` words so no boundary context is lost. The
    * chunk count per doc is `max(ceil((n - overlap) / stride), 1)` —
    * every chunk contributes at least one new word, and a short document
    * yields exactly one (possibly short) chunk.
    *
    * Scale shape: one `posexplode` over a per-row `sequence` — map-side,
    * shuffle-free, output rows ~ corpus tokens / stride. Deterministic
    * slicing, so DuckDB replays the exact chunk text.
    */
  def chunkDocuments(df: DataFrame, text: String = "text", id: String = "doc_id",
                     chunkTokens: Int = 32, stride: Int = 24): DataFrame = {
    require(stride >= 1 && chunkTokens >= stride,
      s"need 1 <= stride <= chunkTokens, got stride=$stride chunkTokens=$chunkTokens")
    val overlap = chunkTokens - stride
    val n = size(split(col(text), " "))
    // integer ceil((n - overlap) / stride); values are small ints, so the
    // double division is exact
    val nChunks = greatest(
      ceil((n - lit(overlap)).cast("double") / stride).cast("int"), lit(1))
    df.withColumn("__ws", split(col(text), " "))
      .select(col(id), col("__ws"),
        posexplode(sequence(lit(0), nChunks - 1)).as(Seq("chunk_idx", "__i")))
      .select(col(id), col("chunk_idx").cast("long").as("chunk_idx"),
        size(slice(col("__ws"), col("__i") * stride + 1, lit(chunkTokens)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__ws"), col("__i") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

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
