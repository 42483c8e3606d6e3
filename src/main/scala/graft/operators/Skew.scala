package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / the 100 TB checklist).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the two cases it does not:
  *
  *   - [[saltedAggregate]]: a groupBy whose key distribution is so hot that
  *     even map-side combine leaves one reducer with most of the data
  *     (e.g. counting events per type when one type is 90% of traffic).
  *     Two phases: aggregate on (key, salt) — spreading each hot key over
  *     `salts` reducers — then re-aggregate on key. Works for any algebraic
  *     aggregate (sum/count/min/max; avg = sum+count).
  *
  *   - [[saltedJoin]]: a large-x-small equi-join where a handful of keys
  *     dominate the large side and the small side is too big to broadcast.
  *     The big side gets a random salt in [0, salts); the small side is
  *     exploded `salts` times so every (key, salt) bucket can match.
  *
  * Salting uses a HASH of the row's own columns, not rand(): deterministic,
  * retry-safe, and identically distributed.
  */
object Skew {

  private def salt(salts: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(salts)).cast("int")

  /** Two-phase skew-safe aggregation: per-(key,salt) partial sums/counts,
    * then per-key final combine. `aggs` maps output column name ->
    * (phase-1 aggregate of an input column, phase-2 combiner of the
    * phase-1 column).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      saltBy: Seq[String],
                      aggs: Map[String, (Column, String => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", salt(salts, saltBy.map(col)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, (a, _)) => a.as(s"__p_$n") }.toSeq: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(s"__p_${aggs.head._1}").as(aggs.head._1),
        aggs.tail.map { case (n, (_, c)) => c(s"__p_$n").as(n) }.toSeq: _*)
  }

  /** Skew-safe count per key (the common case, pre-wired). */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16,
                  saltBy: Seq[String] = Seq.empty): DataFrame = {
    val by = if (saltBy.nonEmpty) saltBy else df.columns.toSeq
    saltedAggregate(df, keys, salts, by,
      Map("n" -> (count(lit(1)), (c: String) => sum(col(c)))))
  }

  /** Skew-safe large-x-small equi-join: salt the big side, replicate the
    * small side once per salt value. Result equals `big.join(small, keys)`.
    *
    * `saltBy` picks the columns hashed into the salt (default: all of
    * `big`'s columns). Because the salt is a deterministic row hash,
    * byte-identical duplicate rows land in the SAME salt bucket — if the
    * hot key's rows are exact duplicates, pass a unique column (row id,
    * offset) as `saltBy`, or dedup-with-count first; a rand() salt would
    * spread them but breaks task-retry determinism, so we refuse it here.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 16, saltBy: Seq[String] = Seq.empty): DataFrame = {
    val by = if (saltBy.nonEmpty) saltBy else big.columns.toSeq
    val b = big.withColumn("__salt", salt(salts, by.map(col)))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
