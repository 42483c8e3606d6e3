package graft.ext

import org.apache.spark.sql.functions._

/** One-shot measurement harness (NOT a test): A/B of residual-encoded
  * IVFADC (Jégou et al., TPAMI 2011 §IV — PQ codes over `x − c_cell`
  * residuals, per-(query, cell) LUTs) against the shipped raw-vector
  * IVF+PQ (`SimSearch.ivfPqTopK`), at the production budget on the sf0.1
  * embeddings fixture. Run via `sbt "Test/runMain graft.ext.IvfadcAb"`;
  * results recorded in PLANS.md round 14 (the OPQ-decision discipline:
  * adopt only on a real end-to-end gain).
  *
  * The variant math runs driver-side on the collected 2000x64 corpus —
  * this is a MEASUREMENT of ranking quality, not a distributed
  * implementation; both variants share the exact shipped training
  * artifacts (`trainCentroids`, `pqTrain`) and the shipped tie-breaks
  * (argmax dot / argmin L2 toward the lower index, survivor order
  * (adist asc, id asc)), so recall differences isolate the encoding.
  */
object IvfadcAb {

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.max(math.sqrt(v.map(x => x * x).sum), 1e-12)
    v.map(_ / n)
  }

  private def sub(x: Array[Double], j: Int, dsub: Int): Array[Double] =
    x.slice(j * dsub, (j + 1) * dsub)

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** pqTrain's Lloyd, verbatim, over caller-supplied (already subspace-
    * sliceable) vectors — used to train the residual codebooks with the
    * identical init/update/tie discipline as the shipped raw ones.
    */
  private def lloydCodebooks(xs: Array[Array[Double]], m: Int, ksub: Int,
                             iters: Int): Array[Array[Array[Double]]] = {
    val dsub = xs.head.length / m
    val k = math.min(ksub, xs.length)
    val step = math.max(xs.length / k, 1)
    Array.tabulate(m) { j =>
      var cents: Array[Array[Double]] =
        xs.indices.collect { case i if i % step == 0 => sub(xs(i), j, dsub) }
          .take(k).toArray
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Long](k)
        xs.foreach { x =>
          var best = 0; var bestDist = Double.PositiveInfinity; var c = 0
          while (c < cents.length) {
            val d = l2(sub(x, j, dsub), cents(c))
            if (d < bestDist) { bestDist = d; best = c }
            c += 1
          }
          var t = 0
          while (t < dsub) { sums(best)(t) += x(j * dsub + t); t += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (prev, c) =>
          if (counts(c) == 0) prev else sums(c).map(_ / counts(c))
        }
      }
      cents
    }
  }

  private def encode(x: Array[Double], cb: Array[Array[Array[Double]]]): Array[Int] = {
    val m = cb.length; val dsub = x.length / m
    Array.tabulate(m) { j =>
      var best = 0; var bestDist = Double.PositiveInfinity; var c = 0
      while (c < cb(j).length) {
        val d = l2(sub(x, j, dsub), cb(j)(c))
        if (d < bestDist) { bestDist = d; best = c }
        c += 1
      }
      best
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val (nCells, nProbe, m, ksub, k) = (16, 8, 16, 64, 5)

    val e = graft.Tables.embeddings(spark, sf)
    val rows = e.where(col("embedding").isNotNull &&
        !exists(col("embedding"), x => x.isNull))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> unit(r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val ids = rows.map(_._1)
    val X = rows.toMap
    val qIds = ids.filter(_ < 100)

    // shipped training artifacts
    val centroids = SimSearch.trainCentroids(e, nCells, 2, "vec_id", "embedding")
    val rawCb = SimSearch.pqTrain(e, m, ksub, 5, 10000, "vec_id", "embedding")

    def cellOf(x: Array[Double]): Int = {
      var best = 0; var bestDot = Double.NegativeInfinity; var i = 0
      while (i < centroids.length) {
        val d = dot(x, centroids(i))
        if (d > bestDot) { bestDot = d; best = i }
        i += 1
      }
      best
    }
    val cells = ids.map(id => id -> cellOf(X(id))).toMap

    // residual codebooks: same hash-ordered 10k sample as pqTrain, but
    // over (x - c_cell) residuals
    val sample = e.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc).limit(10000)
      .collect().map(_.getLong(0))
    val resCb = lloydCodebooks(
      sample.map(id => X(id).zip(centroids(cells(id))).map { case (a, b) => a - b }),
      m, ksub, 5)

    val rawCodes = ids.map(id => id -> encode(X(id), rawCb)).toMap
    val resCodes = ids.map(id =>
      id -> encode(X(id).zip(centroids(cells(id))).map { case (a, b) => a - b }, resCb)).toMap

    // distortion: mean squared reconstruction error over the corpus
    def recon(code: Array[Int], cb: Array[Array[Array[Double]]]): Array[Double] =
      code.zipWithIndex.flatMap { case (c, j) => cb(j)(c) }
    val rawDist = ids.map(id => l2(X(id), recon(rawCodes(id), rawCb))).sum / ids.length
    val resDist = ids.map { id =>
      val rec = recon(resCodes(id), resCb).zip(centroids(cells(id))).map { case (a, b) => a + b }
      l2(X(id), rec)
    }.sum / ids.length
    println(f"distortion raw=$rawDist%.4f residual=$resDist%.4f")

    // exact ground truth (cosine = dot on unit vectors), self excluded
    val truth = qIds.map { q =>
      q -> ids.filter(_ != q).map(c => (c, dot(X(q), X(c))))
        .sortBy { case (c, s) => (-s, c) }.take(k).map(_._1).toSet
    }.toMap

    def probes(q: Long): Array[Int] =
      centroids.indices.map(i => (i, dot(X(q), centroids(i))))
        .sortBy { case (i, s) => (-s, i) }.take(nProbe).map(_._1).toArray

    def adcCandidates(q: Long, residual: Boolean): Array[(Long, Double)] = {
      val pc = probes(q).toSet
      val dsub = X(q).length / m
      // raw: one LUT per query. residual: one LUT per (query, probed cell).
      val rawLut: Array[Array[Double]] =
        if (residual) null
        else Array.tabulate(m)(j => rawCb(j).map(c => l2(sub(X(q), j, dsub), c)))
      val resLuts: Map[Int, Array[Array[Double]]] =
        if (!residual) null
        else pc.iterator.map { cell =>
          val qr = X(q).zip(centroids(cell)).map { case (a, b) => a - b }
          cell -> Array.tabulate(m)(j => resCb(j).map(c => l2(sub(qr, j, dsub), c)))
        }.toMap
      ids.filter(c => c != q && pc(cells(c))).map { c =>
        val code = if (residual) resCodes(c) else rawCodes(c)
        val lut = if (residual) resLuts(cells(c)) else rawLut
        var acc = 0.0; var j = 0
        while (j < m) { acc += lut(j)(code(j)); j += 1 }
        (c, acc)
      }
    }

    for (residual <- Seq(false, true)) {
      val tag = if (residual) "residual" else "raw"
      val cand = qIds.map(q => q -> adcCandidates(q, residual)
        .sortBy { case (c, d) => (d, c) }).toMap
      // ADC-only recall@k (no re-rank)
      val adcHits = qIds.map(q => cand(q).take(k).map(_._1).count(truth(q))).sum
      println(f"$tag%-8s adc_only recall@$k = ${adcHits.toDouble / (qIds.length * k)}%.3f")
      for (os <- Seq(2, 4, 8, 16)) {
        val hits = qIds.map { q =>
          val survivors = cand(q).take(k * os).map(_._1)
          survivors.map(c => (c, dot(X(q), X(c))))
            .sortBy { case (c, s) => (-s, c) }.take(k).map(_._1).count(truth(q))
        }.sum
        println(f"$tag%-8s e2e os=$os%-3d recall@$k = ${hits.toDouble / (qIds.length * k)}%.3f")
      }
    }
  }
}
