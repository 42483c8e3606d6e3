package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Engine-side regression pins for the declared queries whose VALUES have
  * no DuckDB oracle (xxhash64 sketches / JVM-codec checksums are not
  * replayable in SQL): the driver's correctness gate checks only row
  * counts for these, and their oracle-checked companion gates (x2b, x4b,
  * x7c, x11b, x13b) verify recall/invariants — so a sketch-breaking edit
  * (hash function, band layout, probe order) that keeps counts and recall
  * plausible could still drift silently. Each test hashes the query's
  * full sf0.001 output in a canonical form (columns sorted by name, rows
  * sorted, SHA-256) against a committed literal.
  *
  * All six outputs are partition-independent by design (hash-keyed
  * decisions; pins verified identical under local[4]/4-partition and
  * local[8]/8-partition sessions), so a pin failure means sketch
  * SEMANTICS changed, not scheduling. If the change is deliberate,
  * regenerate the pins:
  *
  *   SKETCH_REGEN=1 sbt "testOnly *SketchGoldenSpec"   // prints new pins
  */
class SketchGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def canonicalHash(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.map(col): _*).collect()
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|"))
      .sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.foreach(s => md.update((s + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private val pinned: Map[String, String] = Map(
    "x2_dedup_minhash" -> "e8039665ceab2883870e2877a1aeb9f177ba28ed85a003ae743164833e4fe419",
    "x4_dedup_simhash" -> "6caafa49cad4e6c19fe2a9a818990040f240520e93ce03edcf49a8b1c6e37d8c",
    "x7_ann_lsh" -> "c38a11c49708e61d6d665c3a1883b7e2ceff3490b8d3b415bfbeec849c9218ed",
    "x7b_ann_ivf" -> "4acf08ae3be400bfc69383ea521fab876682c67a8ad4acd62e17edcf1ffd6c63",
    "x11_fingerprint" -> "d9f1224835eb75440273d1f257d726fc159b29bae7ba9653ac9d5360968f44bd",
    // x13 re-pinned 2026-08-14: the last frame now absorbs the payload
    // tail (complete coverage) — a deliberate semantics fix, oracle x13b
    // updated in the same commit
    "x13_multimodal_frames" -> "3797147b6d1be3c264c6dfc4c82cf5314c9e92d90f33dae742da48aabedbc831",
    // PQ codes: float-Lloyd codebooks are not SQL-replayable (x47b gates
    // serving recall; this pin catches silent codebook/encode drift)
    "x47_pq_codes" -> "19a6be9a5e42576b9ebbff919f83e88b5ae249a3c5c4752e52d9411b1b4cadc1")

  pinned.toSeq.sortBy(_._1).foreach { case (name, want) =>
    test(s"$name: sf0.001 sketch output matches the committed pin") {
      val got = canonicalHash(SparkEntry.queries(name)(spark, sfDir))
      if (sys.env.get("SKETCH_REGEN").contains("1"))
        info(s"""PIN "$name" -> "$got"""")
      else
        assert(got == want,
          s"$name sketch output drifted (got $got) — if the change is " +
            "deliberate, regenerate with SKETCH_REGEN=1")
    }
  }
}
