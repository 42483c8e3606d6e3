package graft.io

import org.apache.spark.sql.functions._

/** One-shot measurement harness (NOT a test): Hilbert curve vs Z-order
  * (Morton) for the multi-key clustered layout, at the x51b geometry.
  * Run via `sbt "Test/runMain graft.io.CurveAb"`; results recorded in
  * PLANS.md round 14 (the OPQ/IVFADC-decision discipline).
  *
  * Method: the layout quality metric IS "files whose [min,max] stats
  * overlap a predicate" — computable exactly from a simulated layout
  * without writing parquet. Both curves see identical equal-mass bucket
  * ids (the shipped quantile bucketing, exact quantiles here), rows sort
  * by curve index and chunk into equal-count files (what
  * repartitionByRange does), per-file min/max of each ORIGINAL column
  * feed the overlap count. Predicates: every aligned 1/16-width window
  * per single column, plus the 16x16 grid of two-sided windows.
  */
object CurveAb {

  private val BITS = 6

  private def zIndex(bx: Int, by: Int): Long = {
    var z = 0L
    for (i <- 0 until BITS) {
      z |= ((bx >> i) & 1).toLong << (2 * i)
      z |= ((by >> i) & 1).toLong << (2 * i + 1)
    }
    z
  }

  /** Classic xy2d (Wikipedia/Hamilton form): n = 2^BITS grid. */
  private def hilbertIndex(x0: Int, y0: Int): Long = {
    var (x, y) = (x0, y0)
    var rx = 0; var ry = 0
    var d = 0L
    var s = (1 << BITS) / 2
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  private def bucketize(vs: Array[Double]): Array[Int] = {
    val n = 1 << BITS
    val sorted = vs.sorted
    val bounds = (1 until n).map(i => sorted((i.toLong * vs.length / n).toInt
      .min(vs.length - 1))).toArray
    vs.map(v => bounds.count(b => v > b))
  }

  private def filesTouched(order: Array[Int], cols: Array[Array[Int]],
                           files: Int, preds: Seq[Seq[(Int, Int, Int)]]): Double = {
    // order = row indices sorted by curve; chunk into equal-count files
    val n = order.length
    val ranges = Array.tabulate(files) { f =>
      val lo = (f.toLong * n / files).toInt
      val hi = ((f + 1).toLong * n / files).toInt
      cols.map { c =>
        var mn = Int.MaxValue; var mx = Int.MinValue
        var i = lo
        while (i < hi) { val v = c(order(i)); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
        (mn, mx)
      }
    }
    val touched = preds.map { conj =>
      ranges.count(fr => conj.forall { case (ci, lo, hi) =>
        fr(ci)._2 >= lo && fr(ci)._1 <= hi })
    }
    touched.sum.toDouble / preds.length
  }

  private def zIndex3(bx: Int, by: Int, bz: Int): Long = {
    var z = 0L
    for (i <- 0 until BITS) {
      z |= ((bx >> i) & 1).toLong << (3 * i)
      z |= ((by >> i) & 1).toLong << (3 * i + 1)
      z |= ((bz >> i) & 1).toLong << (3 * i + 2)
    }
    z
  }

  /** n-dimensional Hilbert index: the PRODUCTION Skilling transform
    * ([[graft.functions.HilbertIndexN.compute]]) — the A/B measures the
    * shipped code path, so a transform defect would corrupt these numbers
    * rather than hide behind a drifted local copy. Orientation may differ
    * from the 2-D xy2d above by a reflection — irrelevant to locality,
    * which is what the A/B measures.
    */
  private def hilbertIndexN(axes: Array[Int]): Long =
    graft.functions.HilbertIndexN.compute(axes.map(_.toLong), BITS)

  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rows = graft.Tables.events(spark, sf)
      .select(col("user_id").cast("double"), col("ts").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val bx = bucketize(rows.map(_._1))
    val by = bucketize(rows.map(_._2))
    val idx = rows.indices.toArray
    val byZ = idx.sortBy(i => (zIndex(bx(i), by(i)), i))
    val byH = idx.sortBy(i => (hilbertIndex(bx(i), by(i)), i))
    val cols = Array(bx, by)
    val w = (1 << BITS) / 16 // 1/16-width windows on the bucket grid
    val singleX = (0 until 16).map(j => Seq((0, j * w, j * w + w - 1)))
    val singleY = (0 until 16).map(j => Seq((1, j * w, j * w + w - 1)))
    val both = for (jx <- 0 until 16; jy <- 0 until 16)
      yield Seq((0, jx * w, jx * w + w - 1), (1, jy * w, jy * w + w - 1))
    for (files <- Seq(16, 64, 256)) {
      def t(o: Array[Int], p: Seq[Seq[(Int, Int, Int)]]) = filesTouched(o, cols, files, p)
      println(f"files=$files%-4d  user-pred  z=${t(byZ, singleX)}%6.2f  h=${t(byH, singleX)}%6.2f" +
        f"   ts-pred  z=${t(byZ, singleY)}%6.2f  h=${t(byH, singleY)}%6.2f" +
        f"   both  z=${t(byZ, both)}%6.2f  h=${t(byH, both)}%6.2f")
    }

    // sanity: Skilling's n-D transform at n=2 must be a bijection with
    // unit-step adjacency (possibly reflected vs xy2d — locality-equal)
    val nGrid = 1 << BITS
    val all2 = for (a <- 0 until nGrid; b <- 0 until nGrid)
      yield hilbertIndexN(Array(a, b)) -> (a, b)
    require(all2.map(_._1).distinct.size == nGrid * nGrid, "hilbertIndexN not bijective at n=2")
    val byIdx = all2.sortBy(_._1).map(_._2)
    require(byIdx.sliding(2).forall { case Seq((ax, ay), (bx2, by2)) =>
      (ax - bx2).abs + (ay - by2).abs == 1 }, "hilbertIndexN not unit-adjacent at n=2")

    // ---- 3-key tier: (user_id, ts, value) ---------------------------------
    println("--- 3-D: (user_id, ts, value), Morton vs Skilling-Hilbert ---")
    // one collect serves the 3-D AND 4-D tiers (event_id rides along)
    val rows3 = graft.Tables.events(spark, sf)
      .select(col("user_id").cast("double"), col("ts").cast("double"),
        col("value").cast("double"), col("event_id").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val b3 = Array(bucketize(rows3.map(_._1)), bucketize(rows3.map(_._2)),
      bucketize(rows3.map(_._3)))
    val idx3 = rows3.indices.toArray
    val byZ3 = idx3.sortBy(i => (zIndex3(b3(0)(i), b3(1)(i), b3(2)(i)), i))
    val byH3 = idx3.sortBy(i => (hilbertIndexN(Array(b3(0)(i), b3(1)(i), b3(2)(i))), i))
    val singles3 = (0 until 3).map(ci =>
      (0 until 16).map(j => Seq((ci, j * w, j * w + w - 1))))
    val pairs3 = for (ci <- 0 until 3; cj <- ci + 1 until 3) yield
      (for (jx <- 0 until 16; jy <- 0 until 16)
        yield Seq((ci, jx * w, jx * w + w - 1), (cj, jy * w, jy * w + w - 1))).toSeq
    for (files <- Seq(16, 64, 256)) {
      def t(o: Array[Int], p: Seq[Seq[(Int, Int, Int)]]) = filesTouched(o, b3, files, p)
      val s = singles3.zipWithIndex.map { case (p, ci) =>
        f"dim$ci z=${t(byZ3, p)}%6.2f h=${t(byH3, p)}%6.2f" }.mkString("  ")
      val pAvgZ = pairs3.map(t(byZ3, _)).sum / pairs3.size
      val pAvgH = pairs3.map(t(byH3, _)).sum / pairs3.size
      println(f"files=$files%-4d  $s   pair-avg z=$pAvgZ%6.2f h=$pAvgH%6.2f")
    }

    // ---- 4-key tier: (user_id, ts, value, event_id) -----------------------
    // The question a four-key layout must answer BEFORE shipping: does the
    // Hilbert advantage survive a fourth interleaved dimension, or has
    // per-dim locality diluted to where the curves tie?
    println("--- 4-D: (user_id, ts, value, event_id), Morton vs Skilling-Hilbert ---")
    def zIndexK(bs: Array[Int]): Long = {
      val k = bs.length
      var z = 0L
      for (i <- 0 until BITS; d <- 0 until k)
        z |= ((bs(d) >> i) & 1).toLong << (k * i + d)
      z
    }
    // the 3-D tier's bucket arrays carry over; only event_id buckets are new
    val b4 = Array(b3(0), b3(1), b3(2), bucketize(rows3.map(_._4)))
    val idx4 = rows3.indices.toArray
    val byZ4 = idx4.sortBy(i => (zIndexK(Array(b4(0)(i), b4(1)(i), b4(2)(i), b4(3)(i))), i))
    val byH4 = idx4.sortBy(i => (hilbertIndexN(Array(b4(0)(i), b4(1)(i), b4(2)(i), b4(3)(i))), i))
    val singles4 = (0 until 4).map(ci =>
      (0 until 16).map(j => Seq((ci, j * w, j * w + w - 1))))
    val pairs4 = for (ci <- 0 until 4; cj <- ci + 1 until 4) yield
      (for (jx <- 0 until 16; jy <- 0 until 16)
        yield Seq((ci, jx * w, jx * w + w - 1), (cj, jy * w, jy * w + w - 1))).toSeq
    for (files <- Seq(16, 64, 256)) {
      def t(o: Array[Int], p: Seq[Seq[(Int, Int, Int)]]) = filesTouched(o, b4, files, p)
      val s = singles4.zipWithIndex.map { case (p, ci) =>
        f"dim$ci z=${t(byZ4, p)}%6.2f h=${t(byH4, p)}%6.2f" }.mkString("  ")
      val pAvgZ = pairs4.map(t(byZ4, _)).sum / pairs4.size
      val pAvgH = pairs4.map(t(byH4, _)).sum / pairs4.size
      println(f"files=$files%-4d  $s   pair-avg z=$pAvgZ%6.2f h=$pAvgH%6.2f")
    }
    // bijection + unit-adjacency of the PRODUCTION transform at n=4 over
    // a small grid (4 bits -> 65536 cells) — the permanent law lives in
    // FunctionsSpec (ExtSpec.scala) beside the n=2/n=3 laws; this inline
    // check guards the A/B's own numbers above
    val g4 = 1 << 4
    def h4(a: Int, b: Int, c: Int, d: Int): Long =
      graft.functions.HilbertIndexN.compute(Array(a.toLong, b.toLong, c.toLong, d.toLong), 4)
    val all4 = for (a <- 0 until g4; b <- 0 until g4; c <- 0 until g4; d <- 0 until g4)
      yield h4(a, b, c, d) -> (a, b, c, d)
    require(all4.map(_._1).distinct.size == g4 * g4 * g4 * g4,
      "hilbert n-D transform not bijective at n=4")
    val ordered4 = all4.sortBy(_._1).map(_._2)
    require(ordered4.sliding(2).forall { case Seq((a1, b1, c1, d1), (a2, b2, c2, d2)) =>
      (a1 - a2).abs + (b1 - b2).abs + (c1 - c2).abs + (d1 - d2).abs == 1 },
      "hilbert n-D transform not unit-adjacent at n=4")
    println("n=4 bijection + unit-adjacency: OK (65536 cells)")
  }
}
