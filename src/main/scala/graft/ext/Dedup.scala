package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for an LLM training-data pipeline
  * (SURVEY.md §7.4): exact (content-hash), MinHash+LSH, SimHash, and exact
  * n-gram Jaccard.
  *
  * Scale design notes (the 100 TB story):
  *   - Exact dedup groups on `sha2(text)` — 64-byte keys shuffle instead of
  *     full documents; partial aggregation keeps the shuffle tiny.
  *   - MinHash signatures are computed per-document with array expressions —
  *     shuffle-free, stays inside whole-stage codegen. Candidate generation
  *     explodes each doc into `bands` rows and hash-joins on
  *     (band, bandHash): only docs agreeing on a full band ever meet, which
  *     is the standard sub-quadratic LSH join. No cross join anywhere.
  *   - SimHash pairs join on any equal 16-bit chunk (pigeonhole: hamming
  *     distance <= 3 over 64 bits guarantees one equal chunk; we use 4
  *     chunks and verify the true distance after the equi-join).
  *   - n-gram Jaccard is quadratic by nature, so it only ever runs over a
  *     blocked/candidate pair set, never the full corpus.
  */
object Dedup {

  /** Word k-shingles (distinct), the unit for Jaccard/MinHash. */
  def shingles(text: Column, k: Int = 3): Column = {
    val ws = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(ws) - (k - 1), lit(1))),
      i => concat_ws(" ", (0 until k).map(j => element_at(ws, i + j)): _*)))
  }

  /** Exact dedup: keep the smallest id per identical text; report copies.
    * Groups on a 256-bit content hash, not the text itself.
    */
  def exact(df: DataFrame, text: String = "text", id: String = "doc_id"): DataFrame =
    df.groupBy(sha2(col(text), 256).as("text_hash"))
      .agg(min(col(id)).as(id), count(lit(1)).as("n_copies"))

  /** Per-document MinHash signature: `perms` independent min-hashes over the
    * shingle set. Each permutation is xxhash64 re-keyed by the permutation
    * index — deterministic, seedless, identical across executors.
    */
  def minhashSignatures(df: DataFrame, text: String = "text", id: String = "doc_id",
                        k: Int = 3, perms: Int = 64): DataFrame = {
    val hashes = transform(shingles(col(text), k), s => xxhash64(s))
    val sig = array((0 until perms).map(i =>
      array_min(transform(col("__sh"), h => xxhash64(h, lit(i))))): _*)
    df.select(col(id), hashes.as("__sh"))
      .select(col(id), sig.as("signature"))
  }

  /** MinHash+LSH near-duplicate candidate pairs with estimated Jaccard.
    *
    * bands x rowsPerBand must equal the signature length; the LSH threshold
    * is roughly (1/bands)^(1/rowsPerBand) (defaults: (1/16)^(1/4) ~ 0.5).
    * Returns (idA, idB, est_jaccard) with idA < idB, est >= minJaccard.
    */
  def minhashPairs(df: DataFrame, text: String = "text", id: String = "doc_id",
                   k: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                   minJaccard: Double = 0.8): DataFrame = {
    val perms = bands * rowsPerBand
    val sigs = minhashSignatures(df, text, id, k, perms)

    val banded = sigs.select(
      col(id),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("signature"), b * rowsPerBand + 1, rowsPerBand))): _*))
        .as(Seq("band", "band_hash")))

    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a.join(b,
        col(s"a.band") === col(s"b.band") &&
        col(s"a.band_hash") === col(s"b.band_hash") &&
        col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .distinct()

    val sa = sigs.select(col(id).as("id_a"), col("signature").as("sig_a"))
    val sb = sigs.select(col(id).as("id_b"), col("signature").as("sig_b"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), p => p))
          .cast("double") / perms.toDouble)
      .where(col("est_jaccard") >= minJaccard)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 64-bit SimHash as 4x16-bit chunks (array<long> of length 4) — the
    * chunk layout doubles as the hamming-LSH blocking key.
    */
  def simhashChunks(df: DataFrame, text: String = "text", id: String = "doc_id"): DataFrame = {
    val words = split(col(text), " ")
    val wordHashes = transform(words, w => xxhash64(w))
    // per-bit one-counts over all word hashes
    val counts = aggregate(
      wordHashes,
      array_repeat(lit(0), 64),
      (acc, h) => array((0 until 64).map(j =>
        element_at(acc, j + 1) + shiftright(h, j).bitwiseAND(1L).cast("int")): _*))
    val bits = zip_with(counts, array_repeat(size(words), 64),
      (c, n) => (c * 2 > n).cast("int"))
    val chunk = (c: Int) => (0 until 16).map(j =>
      element_at(col("__bits"), c * 16 + j + 1).cast("long") * lit(1L << j))
      .reduce(_ + _)
    df.select(col(id), bits.as("__bits"))
      .select(col(id), array((0 until 4).map(chunk): _*).as("simhash"))
  }

  /** SimHash near-dup pairs: equi-join on any shared 16-bit chunk, then
    * verify true hamming distance <= maxHamming. Sub-quadratic: only docs
    * sharing a chunk value ever pair up.
    */
  def simhashPairs(df: DataFrame, text: String = "text", id: String = "doc_id",
                   maxHamming: Int = 10): DataFrame = {
    val sh = simhashChunks(df, text, id)
    val banded = sh.select(col(id), col("simhash"),
      posexplode(col("simhash")).as(Seq("chunk_idx", "chunk_val")))
    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a.join(b,
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
    cand
      .withColumn("hamming",
        aggregate(zip_with(col("sh_a"), col("sh_b"),
          (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")), lit(0L), (acc, v) => acc + v))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard over a length-blocked pair space: only pairs whose
    * `lenCol` differs by <= `tol` are compared (near-duplicates have
    * near-equal lengths). Like [[graft.operators.AsofJoin]], the band
    * predicate is turned into an equi-join on overlapping `lenCol / tol`
    * buckets (right side exploded into its 3 adjacent buckets), so Catalyst
    * plans a hash join, never a cartesian product — sub-quadratic and
    * shuffle-partitioned at any scale.
    */
  def ngramJaccardPairs(df: DataFrame, lenCol: String, tol: Int = 16,
                        text: String = "text", id: String = "doc_id", k: Int = 3,
                        minJaccard: Double = 0.5): DataFrame = {
    val withSh = df.select(col(id), col(lenCol), shingles(col(text), k).as("sh"))
    val a = withSh
      .withColumn("__bucket", floor(col(lenCol) / tol))
      .select(col(id).as("id_a"), col(lenCol).as("len_a"), col("sh").as("sh_a"), col("__bucket"))
    val b = withSh
      .withColumn("__b0", floor(col(lenCol) / tol))
      .withColumn("__bucket", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .select(col(id).as("id_b"), col(lenCol).as("len_b"), col("sh").as("sh_b"), col("__bucket"))
    a.join(b, Seq("__bucket"))
      .where(col("id_a") < col("id_b") && abs(col("len_a") - col("len_b")) <= tol)
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
