package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests (SURVEY.md §5): operator laws over scalacheck-generated
  * inputs. Generators are driven with explicit seeds (no scalatestplus
  * bridge on the offline classpath) — each law is checked over several
  * deterministic samples.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-06-01 00:00:00").getTime
  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("asof nearest == brute force, and is left-total") {
    val offsets = Gen.listOfN(40, Gen.choose(0, 6 * 3600))
    for (seed <- 1 to 5) {
      val lOff = sample(offsets, seed)
      val rOff = sample(offsets, seed + 100)
      val lRows = lOff.zipWithIndex.map { case (o, i) => (i.toLong, new Timestamp(base + o * 1000L)) }
      val rRows = rOff.distinct.zipWithIndex.map { case (o, i) => (new Timestamp(base + o * 1000L), i.toDouble) }
      val out = AsofJoin.nearest(lRows.toDF("id", "t"), rRows.toDF("t", "v"), "t", 600L, Seq("id"))
        .select("id", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(out.size == lRows.size) // left-preserving: every left id present
      lRows.foreach { case (id, lt) =>
        val cands = rRows.filter { case (rt, _) => math.abs(rt.getTime - lt.getTime) <= 600000L }
        val expected =
          if (cands.isEmpty) null
          else cands.minBy { case (rt, _) => (math.abs(rt.getTime - lt.getTime), rt.getTime) }._2
        assert(out(id) == expected, s"seed=$seed id=$id")
      }
    }
  }

  test("upsert laws: idempotent, key-total, incoming-wins") {
    val kvs = Gen.listOfN(30, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0, 1000)))
    for (seed <- 1 to 5) {
      val a = sample(kvs, seed).distinctBy(_._1)
      val b = sample(kvs, seed + 100).distinctBy(_._1)
      val once = Upsert.keepNewest(a.toDF("k", "v"), b.toDF("k", "v"), Seq("k")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(once.keySet == (a.map(_._1) ++ b.map(_._1)).toSet)
      b.foreach { case (k, v) => assert(once(k) == v) } // incoming wins
      a.filterNot(kv => b.exists(_._1 == kv._1)).foreach { case (k, v) => assert(once(k) == v) }
      val twice = Upsert.keepNewest(once.toSeq.toDF("k", "v"), b.toDF("k", "v"), Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(twice == once) // idempotent
    }
  }

  test("salted aggregate == plain aggregate; salted join == plain join") {
    val rows = Gen.listOfN(200, Gen.zip(Gen.frequency(3 -> Gen.const("hot"), 1 -> Gen.oneOf("a", "b")),
      Gen.choose(0, 100)))
    for (seed <- 1 to 3) {
      val data = sample(rows, seed)
      val df = data.toDF("k", "v")
      val expected = df.groupBy("k").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = Skew.saltedCount(df, Seq("k"), salts = 8).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)

      val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("unused", "U")).toDF("k", "name")
      val plain = df.join(dim, Seq("k")).groupBy("k", "name").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val salted = Skew.saltedJoin(df, dim, Seq("k"), salts = 8)
        .groupBy("k", "name").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(salted == plain)
    }
  }

  test("scaler output: mean ~ 0, stddev_pop ~ 1 on non-degenerate input") {
    val xs = Gen.listOfN(50, Gen.choose(-1000.0, 1000.0))
    for (seed <- 1 to 3) {
      val data = sample(xs, seed)
      val z = Scaling.zscore(data.toDF("a"), Seq("a"))
        .agg(avg("scaled_a"), stddev_pop("scaled_a")).head()
      assert(math.abs(z.getDouble(0)) < 1e-9)
      assert(math.abs(z.getDouble(1) - 1.0) < 1e-9)
    }
  }
}
