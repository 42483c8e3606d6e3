package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair-encoding vocabulary — the real subword
  * tokenizer a training pipeline needs where
  * [[TextStats.bpeishTokenCount]] is only a stand-in (ceil(len/4) has the
  * right magnitude but no corpus adaptivity; token budgets (x23/x23b) and
  * sequence packing (x21) are only as faithful as the counts feeding
  * them).
  *
  * Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"): start from single characters, repeatedly
  * merge the most frequent adjacent symbol pair. The standard trick makes
  * it scale: training runs on the DISTINCT-WORD frequency table, not the
  * corpus — deriving that table is ONE partial-agg'd shuffle over the
  * 100 TB corpus, and every later round touches only the bounded
  * vocabulary frame (tens of millions of rows at web scale, distributed,
  * never collected). Per merge round:
  *   - adjacent-pair counts: one map-side zip_with explode + one
  *     partial-agg'd shuffle on (l, r);
  *   - arg-max pair: a 1-row driver collect (count desc, then lexicographic
  *     (l, r) — fully deterministic);
  *   - merge application: a shuffle-free per-row fold over each word's
  *     symbol array (greedy left-to-right, non-overlapping — the
  *     "aaaa" + (a,a) case merges positions 1-2 and 3-4, not 2-3);
  *   - eager localCheckpoint so round k+1 does not re-derive rounds 1..k.
  * Driver state is K merge rows — never data-sized.
  *
  * Everything is deterministic and engine-neutral (character splitting,
  * integer counts, lexicographic tie-breaks), so DuckDB replays the whole
  * derivation — see the generated x28 oracle in
  * [[graft.queries.ExtensionQueries]], which reproduces the greedy merge
  * with a window-parity formulation (adjacent candidates only arise for
  * l = r runs; greedy keeps the odd-indexed candidates of each run).
  */
object Bpe {

  /** The learned merge table: `rank` is the merge order (1-based — lower
    * rank = more frequent = applied first), `pairCount` the weighted
    * adjacent-pair frequency that won the round.
    */
  final case class Merge(rank: Int, lhs: String, rhs: String, merged: String,
                         pairCount: Long)

  /** Distinct-word frequency table: ONE shuffle over the corpus; empty
    * tokens (from doubled separators) are dropped so every word has at
    * least one symbol.
    */
  def wordFrequencies(df: DataFrame, text: String = "text"): DataFrame =
    df.select(explode(split(col(text), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial segmentation: one symbol per character. `[\s\S]` (not `.`)
    * so literally every code point survives, and identically in Java
    * regex and RE2.
    */
  private def charSyms(word: Column): Column =
    regexp_extract_all(word, lit("[\\s\\S]"), lit(0))

  /** Greedy left-to-right, non-overlapping application of ONE merge to a
    * symbol array, as a fold: append each symbol, but when the
    * accumulator's last symbol is `l` and the incoming one is `r`,
    * replace the last with `l+r`. After a merge the new last symbol is
    * `l+r` (never equal to `l` — `r` is non-empty), so an overlapping
    * re-merge cannot fire; that IS the standard BPE run semantics.
    * Interpreted HOF — fine here because it runs on the bounded
    * vocabulary frame, never the corpus.
    */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Train `k` merges on a word-frequency table. Returns the merge table
    * (driver-side, K rows) and the final segmentation frame
    * `(word, freq, syms)` — the lookup table a tokenization join uses.
    *
    * NOTE: training is control flow, so constructing the result RUNS the
    * K rounds (each: one shuffle + a 1-row collect). Callers that only
    * want a plan should not call train.
    */
  def train(words: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    var seg = words.select(col("word"), col("freq"), charSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (i <- 1 to k if !exhausted) {
      val pairs = seg.select(col("freq"),
          explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      // arg-max with a total order: count desc, then lexicographic (l, r).
      // TakeOrderedAndProject — per-partition top-1, 1 row to the driver.
      val best = pairs.orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word is a single symbol
      else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        val c = best(0).getLong(2)
        merges += Merge(i, l, r, l + r, c)
        seg = seg.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    (merges.toSeq, seg)
  }

  /** Per-document subword token counts from a trained segmentation: the
    * corpus explodes to words ONCE and equi-joins the vocabulary lookup
    * (broadcast-able at real scale), then one partial-agg'd groupBy — the
    * same shape a production "tokenize and count" pass has. Words absent
    * from the vocabulary (impossible when `seg` was trained on the same
    * corpus) would drop out of the inner join on both engines alike.
    * Documents with NO countable words (empty / whitespace-only text)
    * come back with n_bpe_tokens = 0 rather than vanishing: a downstream
    * inner join on the counts (x21b's packing feed) must not silently
    * drop corpus rows.
    */
  def tokenCounts(df: DataFrame, seg: DataFrame,
                  text: String = "text", docId: String = "doc_id"): DataFrame = {
    val counted = df
      .select(col(docId), explode(split(col(text), " ")).as("word"))
      .where(length(col("word")) > 0)
      .join(seg.select(col("word"), size(col("syms")).cast("long").as("n_syms")), "word")
      .groupBy(docId).agg(sum(col("n_syms")).as("n_bpe_tokens"))
    df.select(col(docId)).distinct().join(counted, Seq(docId), "left")
      .select(col(docId), coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** Full tokenization — each document rendered as its in-order subword
    * stream (what a training/serving pipeline actually feeds the model,
    * where [[tokenCounts]] only aggregates). Same scale shape as the
    * count: explode words WITH POSITION, equi-join the vocabulary lookup,
    * then one partial-agg'd groupBy whose ordered reassembly is
    * `array_sort` over (pos, syms) structs — `collect_list` alone has no
    * order guarantee, the sort restores document order deterministically.
    * Output: (docId, n_bpe_tokens, bpe_tokens) with the stream as one
    * '|'-joined string (cross-engine hashable; symbols come from
    * whitespace-split words, so '|' inside a symbol can only come from
    * a '|' in the source text — fine for a fixture-grade contract).
    */
  def tokenize(df: DataFrame, seg: DataFrame,
               text: String = "text", docId: String = "doc_id"): DataFrame =
    df.select(col(docId), posexplode(split(col(text), " ")).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
      .join(seg.select(col("word"), col("syms")), "word")
      .groupBy(docId)
      .agg(array_sort(collect_list(struct(col("pos"), col("syms")))).as("ps"))
      .select(col(docId),
        flatten(transform(col("ps"), p => p.getField("syms"))).as("__toks"))
      .select(col(docId),
        size(col("__toks")).cast("long").as("n_bpe_tokens"),
        concat_ws("|", col("__toks")).as("bpe_tokens"))
}
