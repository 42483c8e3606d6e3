package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.Dedup

/** Scale-stress tier: the PlanSpec shape guards re-checked on a corpus
  * ~20x the sf0.001 fixture, plus coarse runtime-growth bounds on the
  * pair operators. A plan that is secretly quadratic (all-pairs join, lost
  * blocking) turns 20x data into ~400x work; the generous <=80x runtime
  * bound catches that while staying far from timing-noise flakiness
  * (plan-compile overhead dominates the 1x timings, which only makes the
  * measured ratio SMALLER). Each replica's words are salted with the
  * replica id, so near-dup structure replicates within a cohort but never
  * across cohorts — output pair counts, and therefore honest runtime, grow
  * linearly in the multiplier by construction.
  */
class StressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Shared zipf-tier skew gate. Tracks per-task (duration, records read)
    * per stage and asserts TWO bounds over every wide-enough stage:
    *
    *   - records skew: max task records <= 4x median + 10k. Records per
    *     task are a pure function of the plan and the data — co-tenant
    *     load cannot inflate them — so this gate needs no straggler slack
    *     and stays sharp on FAST stages, where the time gate's 3 s
    *     absolute slack would let a ~30x hot-key concentration hide
    *     (round-13 advice). A genuine surviving hot key concentrates
    *     ROWS (13% of 8M in one of 32 partitions ≈ 4.2x the median) long
    *     before it concentrates seconds. Calibrated round 14: every
    *     skew-safe/AQE-split stage across the three zipf tests measured
    *     max/median records <= 1.3x (1.05-1.27 observed), so the 4x gate
    *     has ~3x headroom against legitimate variance while the 4.2x+
    *     concentration of an unsplit hot key trips it at any speed.
    *   - time skew: max task duration <= 4x median + 3 s, median >= 50 ms
    *     only. The absolute slack is co-tenant calibration (r12-r13:
    *     observed 1.9-4.2 s single-task stragglers regardless of median,
    *     while genuine catches measured 12-61 s); it stays because wall
    *     time IS contention-sensitive. The time gate still earns its keep
    *     where records are balanced but per-row cost is not — the
    *     unbounded-carry trailing fix (12.2 s vs 0.9 s median on balanced
    *     buckets) is the measured example.
    */
  private class SkewProbe {
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int,
      java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val retried = new java.util.concurrent.atomic.AtomicLong()
    val spilled = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (e.taskInfo != null) {
          if (e.taskInfo.attemptNumber > 0) retried.incrementAndGet()
          val m = e.taskMetrics
          val recs = if (m == null) 0L
            else m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
          if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          stageTasks
            .computeIfAbsent(e.stageId,
              _ => new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]())
            .add((e.taskInfo.duration, recs))
        }
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stageNames.put(e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n').take(60))
    }
    import scala.jdk.CollectionConverters._
    def summary: String = stageTasks.asScala.toSeq.sortBy(_._1).map { case (sid, q) =>
      val ts = q.asScala.toSeq
      val ds = ts.map(_._1).sorted
      val rs = ts.map(_._2).sorted
      s"stage $sid [${stageNames.getOrDefault(sid, "?")}]: n=${ds.size} " +
        s"med=${ds(ds.size / 2)}ms max=${ds.last}ms " +
        s"medRec=${rs(rs.size / 2)} maxRec=${rs.last}"
    }.mkString("; ")
    /** Asserts both gates over every wide-enough stage; returns how many
      * stages each gate actually checked (callers assert > 0 so the gates
      * can't pass vacuously on a fixture that got too small).
      *
      * The TIME gate is skipped on stages whose RECORDS are demonstrably
      * balanced (max <= 1.5x median): every genuine key-concentration
      * catch this suite has made concentrated records, the fixtures are
      * fixed-shape rows (records IS the work), and a slow-but-balanced
      * task is by construction a co-tenant artifact — the exact flake
      * the r14 records gate was added to disambiguate (observed again at
      * r15 certification: max 4069 ms vs median 177 ms with records ratio
      * 1.15 in a window whose mem-bw floor had halved). Stages where
      * records CANNOT witness (sub-10k-record medians, or imbalance
      * between 1.5x and the 4x gate) keep the time gate.
      */
    def assertBounded(diagnosis: String): (Int, Int) = {
      var timeChecked = 0
      var recChecked = 0
      stageTasks.asScala.foreach { case (stageId, q) =>
        val ts = q.asScala.toSeq
        val name = stageNames.getOrDefault(stageId, "?")
        if (ts.size >= 4) {
          val rs = ts.map(_._2).sorted
          val medRec = rs(rs.size / 2)
          var recBalanced = false
          if (medRec >= 10000L) {
            recChecked += 1
            assert(rs.last <= 4 * medRec + 10000L,
              s"stage $stageId [$name]: max task read ${rs.last} records vs median " +
                s"$medRec over ${ts.size} tasks — $diagnosis")
            recBalanced = rs.last <= (1.5 * medRec).toLong + 10000L
          }
          val ds = ts.map(_._1).sorted
          val median = ds(ds.size / 2)
          if (median >= 50L) {
            // counted as checked either way: a stage covered by the
            // balanced-records witness is checked, not skipped
            timeChecked += 1
            if (!recBalanced)
              assert(ds.last <= 4 * median + 3000L,
                s"stage $stageId [$name]: max task ${ds.last}ms vs median ${median}ms " +
                  s"over ${ts.size} tasks — $diagnosis")
            else if (ds.last > 4 * median + 3000L)
              // the records witness superseded a tripping time gate —
              // record it VISIBLY so a recurring balanced-records time
              // outlier (value-dependent per-record cost: skewed string
              // lengths, match density) surfaces in the log instead of
              // being silently absorbed as co-tenant noise
              info(s"time gate suppressed by balanced records on stage $stageId " +
                s"[$name]: max ${ds.last}ms vs median ${median}ms over ${ts.size} " +
                s"tasks (records ratio ${"%.2f".format(rs.last.toDouble / math.max(1L, medRec))})")
          }
        }
      }
      (timeChecked, recChecked)
    }
  }

  /** `mult` word-salted replicas of the documents fixture, materialized
    * (eager localCheckpoint) so timings below measure the operator, not
    * the synthesis.
    */
  private def corpus(mult: Int): DataFrame = {
    val base = graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "source")
    base.crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        (col("doc_id") * mult + col("rep")).as("doc_id"),
        concat_ws(" ",
          transform(split(col("text"), " "),
            w => concat(w, lit("_"), col("rep")))).as("text"),
        col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .localCheckpoint(true)
  }

  private def timeRun(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def minhash(c: DataFrame) = Dedup.minhashPairs(c, minJaccard = 0.8)
  private def simhash(c: DataFrame) = Dedup.simhashPairs(c, maxHamming = 10)
  private def incremental(c: DataFrame) = Dedup.incrementalDedup(
    c.where(col("doc_id") % 7 === 0), c.where(col("doc_id") % 7 =!= 0),
    lenCol = "n_chars", tol = 16, minJaccard = 0.5)
  private def spans(c: DataFrame) = Dedup.duplicatedSpans(c, k = 8)
  private def spanDecon(c: DataFrame) = Dedup.spanDecontaminate(
    c.where(col("doc_id") % 10 =!= 0), c.where(col("doc_id") % 10 === 0), k = 8)
  private def collapse(c: DataFrame) = Dedup.collapseComponents(c,
    Dedup.ngramJaccardPairs(c, lenCol = "n_chars", tol = 16, minJaccard = 0.5))
  private def boiler(c: DataFrame) =
    graft.ext.TextStats.removeBoilerplate(c, k = 3, minDocs = 5)

  test("20x corpus: pair-operator plan shapes hold (no cartesian, blocking joins intact)") {
    val big = corpus(20)
    for ((name, q) <- Seq(("minhash", minhash(big)), ("simhash", simhash(big)),
                          ("incremental", incremental(big)), ("spans", spans(big)),
                          ("spanDecon", spanDecon(big)), ("collapse", collapse(big)),
                          ("boiler", boiler(big)))) {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name went all-pairs:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name lost its equi-join:\n$p")
    }
    assert(incremental(big).queryExecution.executedPlan.toString
      .contains("boundedjaccard"), "near tier lost the codegen'd verify kernel")
  }

  /** `mult` replicas of the embeddings fixture: distinct ids, vectors
    * reused verbatim (IVF cell geometry is what's under test — duplicate
    * vectors land in the same cell, which is the realistic near-dup shape).
    */
  private def embCorpus(mult: Int): DataFrame = {
    val base = graft.Tables.embeddings(spark, sf)
    base.crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("vec_id") * mult + col("rep")).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .localCheckpoint(true)
  }

  test("100x corpus: iterative operators scale sub-quadratically, no task retries, no spills",
      org.scalatest.tagobjects.Slow) {
    // The 20x tier pins plan SHAPES; this tier pins runtime GROWTH at the
    // scale claim's first decade: 100x rows vs a 10x baseline must cost
    // <= ~4x the linear ratio (a quadratic operator costs 10x linear =
    // 100x the baseline; the 40x bound rejects that with wide margin
    // against plan-compile noise, which inflates the BASELINE and so only
    // shrinks the measured ratio). Targets are the three iterative
    // operators the r9 verdict named: the curate composition (9 chained
    // stages incl. connected components), MinHash LSH pairs, and IVF ANN
    // (Lloyd-trained quantizer). A task retry or a spill at this scale
    // means the partition sizing claim is wrong — both are asserted zero.
    val spilled = new java.util.concurrent.atomic.AtomicLong()
    val retried = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (e.taskInfo != null && e.taskInfo.attemptNumber > 0) retried.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def curate(c: DataFrame) = graft.jobs.CurateJob.curate(
      c.where(col("doc_id") % 7 === 0), c.where(col("doc_id") % 7 =!= 0))
    def ivf(e: DataFrame) = graft.ext.SimSearch.ivfTopK(
      e.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
      e, k = 5)
    val timings = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
    // corpora built ONCE and shared (an in-loop unpersist would sever the
    // eager checkpoints the later measurements re-read); internal lazy
    // checkpoints from the operators stay cached until the suite's session
    // is torn down — bounded: <= ~50k-row frames per measurement
    val d10 = corpus(10); val d100 = corpus(100)
    val e10 = embCorpus(10); val e100 = embCorpus(100)
    spark.sparkContext.addSparkListener(listener)
    try {
      for ((name, q, c10, c100) <- Seq[(String, DataFrame => DataFrame, DataFrame, DataFrame)](
          ("curate", curate, d10, d100),
          ("minhash", minhash, d10, d100),
          ("ivf", ivf, e10, e100))) {
        // time CONSTRUCTION + execution: curate/ivf run eager actions at
        // build time (component fixpoint rounds, Lloyd iterations) — a
        // df-only timing would miss exactly the iterative work under test
        def timed(c: DataFrame): Double = {
          val t0 = System.nanoTime()
          q(c).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        q(c10).write.format("noop").mode("overwrite").save() // warm codegen/JIT
        var t10 = timed(c10)
        var t100 = timed(c100)
        if (t100 > 40 * t10 + 10.0) { // re-measure once: stalls don't reproduce
          t10 = math.max(t10, timed(c10))
          t100 = math.min(t100, timed(c100))
        }
        timings += ((name, t10, t100))
        assert(t100 <= 40 * t10 + 10.0,
          f"$name: 100x data took ${t100 / t10}%.1fx the 10x time " +
            f"($t10%.2fs -> $t100%.2fs) — super-linear blowup (reproduced twice)")
      }
    } finally {
      // the bus delivers onTaskEnd asynchronously — drain it BEFORE
      // detaching, or in-flight events from the last job are dropped and
      // the zero-retry/zero-spill assertions below pass vacuously on a run
      // that actually retried or spilled
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
    }
    info(timings.map { case (n, a, b) => f"$n: 10x=$a%.2fs 100x=$b%.2fs (${b / a}%.1fx)" }
      .mkString("; "))
    assert(retried.get == 0, s"${retried.get} task retries at 100x — partition sizing suspect")
    assert(spilled.get == 0, s"${spilled.get} bytes spilled at 100x — partitions exceed memory")
  }

  /** 8M-row event frame with zipf(s)-distributed user ids over `keys`
    * ranks: u uniform from a row hash, rank = floor(u^(-1/(s-1))) — the
    * inverse-CDF Pareto approximation of a zipfian frequency law —
    * truncated to `keys` ranks (tail mass collapses onto the last rank,
    * the standard truncated-zipf shape). At s = 1.2 / keys = 1000 the top
    * rank holds ~13% of ALL rows and the truncation rank ~25% — exactly
    * the key-concentration that motivated the skew-safe operators, which
    * the uniform 100x tier never exercises. Deterministic (hash-derived
    * u), so a failure reproduces.
    */
  private def zipfEvents(sess: org.apache.spark.sql.SparkSession,
                         n: Long, keys: Int, s: Double): DataFrame = {
    val u = (abs(xxhash64(col("id"))) % 1000000L + 1L) / lit(1000001.0)
    sess.range(n).select(
      (least(lit(keys.toLong - 1), floor(pow(u, lit(-1.0 / (s - 1.0)))))
        + 1L).cast("long").as("user_id"),
      timestamp_seconds(lit(1704067200L) + pmod(xxhash64(col("id"), lit(7)),
        lit(2592000L))).as("ts"),
      (col("id") % 100).cast("double").as("value"))
      .repartition(32)
      .localCheckpoint(true)
  }

  test("zipf(1.2) keys: skew-safe paths keep per-stage task skew bounded, zero retries, zero spills",
      org.scalatest.tagobjects.Slow) {
    // The named scale-killers under the skew that motivated them: the
    // two-phase sessionizer (w2b), the salted aggregation (a5), and the
    // per-group cap's map-side group limit (x41). Gate: within every
    // non-trivial stage, the slowest task stays within a small factor of
    // the stage median — a key-concentrated stage (a ~25%-of-rows key
    // landing in one of 32 partitions is ~8x the uniform share) breaches;
    // salting/bucketing/group-limit keep it low single digits. Plus the
    // same zero-retry / zero-spill claims as the uniform 100x tier.
    // Runs on an isolated child session at 32 shuffle partitions: the
    // shared test session's width-4 shuffles leave a hot key
    // indistinguishable from the uniform share (25% vs a 25% share), and
    // mutating the shared session's conf would race other suites.
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "32")
    val df = zipfEvents(sess, 8000000L, 1000, 1.2)
    val probe = new SkewProbe
    val docs = df.select(col("user_id"),
      concat(lit("s"), col("user_id")).as("source"),
      monotonically_increasing_id().as("doc_id")).localCheckpoint(true)
    spark.sparkContext.addSparkListener(probe.listener)
    try {
      graft.operators.Sessionize.sessionsSkewSafe(df, "user_id", "ts",
        gapSeconds = 1800L, bucketSeconds = 21600L)
        .write.format("noop").mode("overwrite").save()
      graft.operators.Skew.saltedCount(df, Seq("user_id"))
        .write.format("noop").mode("overwrite").save()
      graft.ext.Sampling.capPerGroup(docs, "source", cap = 40, key = "doc_id")
        .write.format("noop").mode("overwrite").save()
    } finally {
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(probe.listener)
    }
    info(probe.summary)
    val (timeChecked, recChecked) =
      probe.assertBounded("key concentration survived the skew-safe path")
    assert(timeChecked >= 1 && recChecked >= 1,
      s"gates measured too few stages (time=$timeChecked, records=$recChecked) — grow the corpus")
    assert(probe.retried.get == 0, s"${probe.retried.get} task retries under zipf skew")
    assert(probe.spilled.get == 0, s"${probe.spilled.get} bytes spilled under zipf skew")
  }

  test("zipf(1.2) keys: scd2 history, rolling features, and resample fill keep " +
    "task skew bounded", org.scalatest.tagobjects.Slow) {
    // The round-12 additions' skew exposure: Scd2.history and
    // Rolling.trailing sort EVERY observation of a key in one task, so the
    // zipf head key (~13% of all rows vs a ~3% uniform share at 32
    // partitions) is exactly their failure shape. Same gate as the w2b/a5/
    // x41 tier: within every wide+slow stage, max task <= 4x median.
    // Measured split (recorded in PLANS.md round 13): plain Scd2.history
    // PASSES — its per-row work (lag compare, filter, lead) is linear, so
    // AQE's byte-balancing absorbs the hot key (max 4.8s vs median 4.2s
    // here) — and stays on the plain path; plain Rolling.trailing FAILED
    // 5x (61.7s vs 12.3s median: Spark recomputes sliding-frame aggregates
    // per row, so the hot key pays rows x frame_size in one task), so the
    // gate runs its bucketed skew-safe face (output-identity pinned in
    // RollingSpec).
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "32")
    val df = zipfEvents(sess, 8000000L, 1000, 1.2)
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("event_type",
        (abs(xxhash64(col("ts"), col("user_id"))) % 4).cast("string"))
      .localCheckpoint(true)
    val probe = new SkewProbe
    spark.sparkContext.addSparkListener(probe.listener)
    try {
      graft.operators.Scd2.history(df, "user_id", Seq("ts", "event_id"),
          Seq("event_type"))
        .write.format("noop").mode("overwrite").save()
      graft.operators.Rolling.trailingSkewSafe(df, "user_id", "ts", "event_id",
          "value", windowSeconds = 3600L, lastN = 5)
        .write.format("noop").mode("overwrite").save()
      // resample's running last(ignoreNulls) is the incremental frame —
      // linear per row like scd2's lag/lead, so the hot key must stay
      // AQE-absorbable on the plain path (unlike the sliding frames above)
      graft.operators.Resample.toGrid(df, "user_id", "ts", "event_id",
          "value", stepSeconds = 21600L)
        .write.format("noop").mode("overwrite").save()
    } finally {
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(probe.listener)
    }
    info(probe.summary)
    val (timeChecked, recChecked) =
      probe.assertBounded("the hot key serialized into one window task")
    assert(timeChecked >= 1 && recChecked >= 1,
      s"gates measured too few stages (time=$timeChecked, records=$recChecked) — grow the corpus")
    assert(probe.retried.get == 0, s"${probe.retried.get} task retries under zipf skew")
  }

  test("zipf(1.2) keys: a non-broadcastable dim join stays balanced via AQE skew split",
      org.scalatest.tagobjects.Slow) {
    // The join-family skew witness the window gates don't cover: at
    // 100 TB a fact-dim join whose dim EXCEEDS the broadcast threshold
    // shuffles both sides on the key, and the zipf head key (~13% of the
    // fact side) concentrates into one sort-merge partition. The engine's
    // answer here is NOT salting (that's for aggregates — a5): AQE's
    // OptimizeSkewedJoin splits the oversized partition and replicates
    // the matching dim rows. Fixture bytes sit far below the production
    // 256 MB default threshold, so the session scales the knobs to the
    // fixture (factor 2, threshold/advisory 4 MB) — the gate pins the
    // MECHANISM (split fires, tasks stay bounded), not the constant.
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "32")
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sess.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    sess.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    sess.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    val fact = zipfEvents(sess, 8000000L, 1000, 1.2)
    val dim = sess.range(1, 1001).select(col("id").as("user_id"),
      (col("id") % 7).cast("string").as("tier"))
    val joined = fact.join(dim, "user_id")
    val probe = new SkewProbe
    spark.sparkContext.addSparkListener(probe.listener)
    // hold ONE QueryExecution and execute through it (a sink write — or
    // even Dataset.foreach, which rides a separate deserializing QE —
    // would leave this one's adaptive plan un-finalized)
    val qe = joined.queryExecution
    try {
      qe.toRdd.foreach(_ => ())
    } finally {
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(probe.listener)
    }
    // the split actually fired: the final adaptive plan marks the SMJ
    val finalPlan = qe.executedPlan.toString
    assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
    info(probe.summary)
    val (timeChecked, recChecked) =
      probe.assertBounded("the hot key's partition was not split")
    assert(timeChecked >= 1 && recChecked >= 1,
      s"gates measured too few stages (time=$timeChecked, records=$recChecked) — grow the corpus")
    assert(probe.retried.get == 0, s"${probe.retried.get} task retries under zipf skew")
  }

  test("20x corpus: dedup runtime grows ~linearly, never pairwise",
      org.scalatest.tagobjects.Slow) {
    val small = corpus(1)
    val big = corpus(20)
    for ((name, q) <- Seq[(String, DataFrame => DataFrame)](
        ("minhash", minhash), ("simhash", simhash), ("incremental", incremental),
        ("spans", spans), ("spanDecon", spanDecon))) {
      q(small).write.format("noop").mode("overwrite").save() // warm codegen/JIT
      var t1 = timeRun(q(small))
      var t20 = timeRun(q(big))
      if (t20 > 80 * t1 + 5.0) {
        // The sandbox hypervisor stalls single measurements 2-10x
        // (BASELINE.md "Round-5 measurements"); a genuine quadratic
        // blowup reproduces, a stall doesn't — so re-measure once and
        // judge the favorable pair before declaring a regression.
        t1 = math.max(t1, timeRun(q(small)))
        t20 = math.min(t20, timeRun(q(big)))
      }
      assert(t20 <= 80 * t1 + 5.0,
        f"$name: 20x data took ${t20 / t1}%.1fx the 1x time ($t1%.2fs -> $t20%.2fs) " +
          "— quadratic blowup suspected (reproduced across two measurements)")
    }
  }
}
