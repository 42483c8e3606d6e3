package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Fixed-work single-thread CPU spin — the JVM twin of
    * `scripts/spin_calibrate.py`. The sandbox hypervisor starves guest CPU
    * unpredictably (BASELINE.md: identical binaries 78 s .. 187 s), so the
    * bench certifies its own window: the same fixed loop runs BEFORE the
    * session is built and AFTER it stops, and both wall times land in the
    * JSON line. Quiet reference ~4.0 s (1e9 iterations, measured alongside
    * python-spin 4.6 s in a load-avg<1 window); a spin >= 2x reference
    * means the window — and therefore the totals — is untrustworthy, and
    * the JSON now says so itself instead of relying on out-of-band spin
    * runs. Returns (seconds, acc) — acc is printed so the loop cannot be
    * dead-code-eliminated.
    */
  private def spin(): (Double, Long) = {
    val t0 = System.nanoTime()
    var acc = 0L
    var i = 0L
    while (i < 1000000000L) { acc = (acc + i * i) % 1000003L; i += 1 }
    ((System.nanoTime() - t0) / 1e9, acc)
  }

  /** Full-WIDTH spin: the 1-thread spin certifies per-core speed but not
    * machine width — on an oversubscribed host a lone spin thread still
    * gets a whole core while 32-thread throughput collapses (observed:
    * spin 3.7 s "quiet" windows bracketing totals of 94..168 s on an
    * identical binary). `nThreads` concurrent fixed-work loops measure
    * the width the bench actually uses; each loop is 1/4 the 1-thread
    * work, so quiet wall is ~1 s on 32 real cores (~2 s if the 32 are
    * hyperthread pairs). A multi-thread spin >= 2x its own reference
    * marks the window contended even when the 1-thread spin looks clean.
    */
  private def spinMt(nThreads: Int): (Double, Long) = {
    val t0 = System.nanoTime()
    val acc = new java.util.concurrent.atomic.AtomicLong()
    val ts = (0 until nThreads).map { _ =>
      new Thread(() => {
        var a = 0L
        var i = 0L
        while (i < 250000000L) { a = (a + i * i) % 1000003L; i += 1 }
        acc.addAndGet(a)
      })
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    ((System.nanoTime() - t0) / 1e9, acc.get)
  }

  /** Memory-bandwidth probe — the dimension both spins are blind to: the
    * spin loops live in registers, so a co-tenant saturating the memory
    * controller leaves them untouched while every Spark stage (scans,
    * hash tables, shuffles) slows uniformly. Observed exactly that:
    * windows with 1-thread spin ~3.8 s AND 32-thread spin ~1.2 s bracketing
    * totals 92..168 s vs the certified-quiet 64 s — a ~1.4x uniform
    * inflation with no CPU signal. `nThreads` threads stream-sum disjoint
    * slices of one 256 MiB long array; reported as GB/s touched. Quiet
    * reference is recorded next to the spin refs in BASELINE.md.
    */
  private def memBw(nThreads: Int): (Double, Double) = {
    val n = 32 * 1024 * 1024 // 32M longs = 256 MiB
    val a = new Array[Long](n)
    java.util.Arrays.fill(a, 3L)
    val passes = 4
    def sweep(): Double = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      // Time ONLY the streaming span: in a fresh JVM (the "before" probe)
      // creating+starting 32 threads costs tens of ms of classloading/JIT
      // while the measured stream itself is ~10 ms — quiet windows read
      // 10-12 GB/s "before" vs ~110 "after" purely from that overhead,
      // which broke the "< 50% of ref => contended" rule (round-9 verdict
      // item 2). Threads are created and started first, park on a latch,
      // and the clock starts when the latch drops.
      val start = new java.util.concurrent.CountDownLatch(1)
      val ts = (0 until nThreads).map { t =>
        new Thread(() => {
          val lo = (n.toLong * t / nThreads).toInt
          val hi = (n.toLong * (t + 1) / nThreads).toInt
          start.await()
          var s = 0L
          var p = 0
          while (p < passes) {
            var i = lo
            while (i < hi) { s += a(i); i += 1 }
            p += 1
          }
          acc.addAndGet(s)
        })
      }
      ts.foreach(_.start())
      val t0 = System.nanoTime()
      start.countDown()
      ts.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      require(acc.get == 3L * n * passes) // defeat dead-code elimination
      (8.0 * n * passes / secs) / 1e9
    }
    // Two untimed warmup sweeps (the first faults pages / compiles the
    // loop; one was measurably not enough cold), then 3 timed sweeps
    // reported as (max, min). The max is the CAPACITY reading (a co-tenant
    // burst can only lower a sweep, never raise it); the min is the
    // CONTENTION reading the quiet gate must use — gating on the max would
    // let a window where 2 of 3 sweeps were contended self-certify quiet
    // via the one clean sweep, a weaker claim than the gate's name.
    sweep(); sweep()
    val sweeps = (0 until 3).map(_ => sweep())
    (sweeps.max, sweeps.min)
  }

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Spin calibration is ON for official (full-surface) runs and OFF for
    // positional-arg subset profiling (where ~8 s of spin would dominate
    // the feedback loop); SPARK_GRAFT_SPIN=1/0 overrides either way.
    val doSpin = sys.env.get("SPARK_GRAFT_SPIN")
      .map(_ == "1").getOrElse(args.isEmpty)
    val loadBefore = loadAvg()
    // Probes measure the MACHINE, so they always run at full machine
    // width — tying them to SPARK_GRAFT_CPUS (default "4") would make a
    // 4-thread bandwidth probe read far below the 32-thread-calibrated
    // reference on a perfectly quiet host and brand the window contended.
    val probeThreads = Runtime.getRuntime.availableProcessors()
    val spinBefore = if (doSpin) Some(spin()) else None
    val spinMtBefore = if (doSpin) Some(spinMt(probeThreads)) else None
    val memBwBefore = if (doSpin) Some(memBw(probeThreads)) else None
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // see Verify: keep CPU-heavy tiny-byte shuffles parallel under AQE
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Contention-robust secondary metric: accumulate ON-CPU nanoseconds
    // across all tasks. Wall totals inflate under mid-run co-tenant bursts
    // that the before/after probes cannot see (observed: all probes green,
    // total 92 s vs certified 64 s); task CPU time does NOT count
    // involuntary preemption, so two runs of the same binary should agree
    // on cpu_total_sec even when their walls disagree — if cpu_total_sec
    // itself moved, the ENGINE changed (or memory got slower host-wide).
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong()
    val runNanos = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            cpuNanos.addAndGet(m.executorCpuTime)
            runNanos.addAndGet(m.executorRunTime * 1000000L)
          }
        }
      })
    // Register the graft extensions (SQL functions + BandJoinRewrite) UP
    // FRONT so every query plans in the same optimizer environment.
    // (Since r10 j6_band_sql builds on its own isolated child session, so
    // nothing mutates this session mid-run either way — this registration
    // now only pins the environment the OTHER 92 queries plan under, and
    // the rule is semantics-preserving and skips joins that already have
    // an equality conjunct, so no plan differs from stock.)
    GraftExtensions.register(spark)
    // Timings materialize EVERY output row through the zero-IO `noop` sink:
    // under a bare count() Catalyst prunes computed projections, so map-only
    // queries would be billed for scan+count instead of their expressions.
    def run(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      // Queries are timed as INDEPENDENT workloads, but several pin eager
      // localCheckpoint blocks (iterative dedup, Lloyd rounds, curate
      // stages) that would otherwise accumulate across the run and squeeze
      // later queries' execution memory — measured: x29 17.8 s standalone
      // vs 285 s after the curate/IVF queries' blocks piled up. Release
      // them once the query's rows have been materialized.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    // one unmeasured action to absorb session/codegen/JIT warmup so the
    // first measured query isn't charged for it
    try SparkEntry.queries.headOption.foreach(q => run(q._2(spark, sfDir)))
    catch { case _: Throwable => () }
    // A failing query must be LOUD: it gets a timing entry (so totals stay
    // comparable) AND lands in "errors", and the process exits nonzero.
    // JSON string escape covers backslash, quote, and ALL control chars —
    // exception messages can embed anything.
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // Quality-gate queries recompute exact truth (all-pairs Jaccard,
    // brute-force ANN, curate replay) purely to VERIFY a sketch/production
    // query that is itself benched — they are correctness instruments, not
    // engine paths, and they dominated the r7 bench tail (~84 s of 187 s).
    // The bench should measure the engine, so they are skipped by default
    // and reported in "skipped" (no silent caps); Verify still runs all of
    // them every round, so correctness coverage is unchanged. Set
    // SPARK_GRAFT_BENCH_FULL=1 (or name them as args) to time them too.
    val verifyOnlyGates = Set(
      "x2b_minhash_recall", "x4b_simhash_recall", "x5b_neardup_cell_recall",
      "x7c_ann_recall", "x20b_incremental_probe", "x24b_quantized_recall",
      "x11b_fingerprint_inv", "x27b_curate_report", "x38b_ann_filtered_recall",
      "x39b_bloom_audit", "x47b_pq_recall", "x50_ivfpq_recall")
    val full = sys.env.get("SPARK_GRAFT_BENCH_FULL").contains("1")
    // SPARK_GRAFT_BENCH_CORE=1: the §2-parity tier only (every query not
    // in the x-extension namespace) — a cheap, fingerprinted surface for
    // per-round comparisons while the default surface keeps growing with
    // engine-side operators. Certification still runs the default
    // surface; totals remain comparable only within one (surface, n, fp)
    // triple, so the tiers can never be cross-diffed by accident.
    val core = sys.env.get("SPARK_GRAFT_BENCH_CORE").contains("1")
    // optional positional args = run only these queries (local profiling;
    // the driver passes none and gets the full surface)
    val subset = args.toSet
    val selected =
      if (subset.nonEmpty) SparkEntry.queries.filter { case (n, _) => subset(n) }
      else if (full) SparkEntry.queries
      else if (core) SparkEntry.queries.filter { case (n, _) =>
        !n.startsWith("x") && !verifyOnlyGates(n) }
      else SparkEntry.queries.filter { case (n, _) => !verifyOnlyGates(n) }
    // skipped = EVERYTHING declared but not timed this run (no silent
    // caps): under CORE mode that includes the whole x-extension tier,
    // not just the verify-only gates. An explicit positional subset is
    // the operator's own selection — nothing is "skipped" from it.
    val skipped =
      if (subset.nonEmpty) Nil
      else (SparkEntry.queries.keySet -- selected.keySet).toSeq.sorted
    val errors = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // Per-query ON-CPU attribution: wall timings inflate under mid-run
    // co-tenant bursts the before/after probes cannot see, so the
    // run-level cpu_total_sec became the decisive cross-window field —
    // but per-query regressions still rode wall only. Snapshot the
    // listener-fed CPU counter around each query; the bus delivers
    // onTaskEnd asynchronously, so each query's tail events must be
    // DRAINED before the after-snapshot or they'd be billed to the next
    // query. Drains are bounded (5 s) and best-effort: a timeout smears
    // attribution between two adjacent queries without stalling the run,
    // and is counted loudly in queries_cpu_drain_timeouts (nonzero =>
    // treat queries_cpu as approximate; cpu_total_sec is unaffected).
    var drainTimeouts = 0
    def drainBus(): Unit =
      try org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext, 5000L)
      catch { case _: java.util.concurrent.TimeoutException => drainTimeouts += 1 }
    val results = selected.map { case (name, fn) =>
      val cpu0 = { drainBus(); cpuNanos.get }
      val t0 = System.nanoTime()
      try { run(fn(spark, sfDir)) }
      catch { case t: Throwable => errors += name -> esc(t.toString.take(200)) }
      val wall = (System.nanoTime() - t0) / 1e9
      drainBus()
      name -> (wall, (cpuNanos.get - cpu0) / 1e9)
    }
    val qs = results.map { case (k, (w, _)) => s"\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    // Locale.ROOT everywhere a decimal is formatted: the default-locale
    // f"" interpolator emits "1,234" under comma-decimal locales, which
    // silently corrupts the JSON line judge.sh parses.
    def dec(d: Double, places: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(d))
    val qsCpu = results.map { case (k, (_, c)) => s"\"" + k + "\":" + dec(c, 3) }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, m) => s"""{"query":"$k","error":"$m"}""" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val skip = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
    // stop the session BEFORE the closing spin so Spark's own shutdown
    // (executor threads, cleaner) can't pollute the after-window reading
    spark.stop()
    val spinAfter = if (doSpin) Some(spin()) else None
    val spinMtAfter = if (doSpin) Some(spinMt(probeThreads)) else None
    val memBwAfter = if (doSpin) Some(memBw(probeThreads)) else None
    val loadAfter = loadAvg()
    def num(d: Double): String = if (d.isNaN || d.isInfinite) "null" else dec(d, 2)
    val spinJson = (spinBefore, spinAfter) match {
      case (Some((sb, accB)), Some((sa, accA))) =>
        s""""spin_before_sec":${num(sb)},"spin_after_sec":${num(sa)},""" +
        s""""spin_ref_sec":4.0,"spin_acc":${accB + accA},"""
      case _ => ""
    }
    val spinMtJson = (spinMtBefore, spinMtAfter) match {
      case (Some((mb, accB)), Some((ma, accA))) =>
        s""""spin_mt_before_sec":${num(mb)},"spin_mt_after_sec":${num(ma)},""" +
        s""""spin_mt_threads":$probeThreads,"spin_mt_ref_sec":2.0,"spin_mt_acc":${accB + accA},"""
      case _ => ""
    }
    val memBwJson = (memBwBefore, memBwAfter) match {
      case (Some((bbMax, bbMin)), Some((baMax, baMin))) =>
        s""""mem_bw_gbps_before":${num(bbMax)},"mem_bw_gbps_after":${num(baMax)},""" +
        s""""mem_bw_min_gbps_before":${num(bbMin)},"mem_bw_min_gbps_after":${num(baMin)},""" +
        s""""mem_bw_ref_gbps":100.0,"""
      case _ => ""
    }
    // "bench_surface" versions what "total" measures (the r8 verify-gate
    // split changed it): cross-surface totals must not be compared. The
    // era label alone proved insufficient — the default surface grew
    // 84 -> 93 queries across r8 -> r9 under the same tag — so the surface
    // is now fingerprinted by its actual INVENTORY: query count + md5 of
    // the sorted query names. Two totals are comparable iff (surface,
    // surface_n, surface_fp) all match; a tool diffing totals can refuse
    // mechanically instead of trusting the label.
    val surface =
      if (subset.nonEmpty) "subset"
      else if (full) "full"
      else if (core) "core"
      else "default"
    val surfaceNames = selected.keys.toSeq.sorted
    val surfaceFp = java.security.MessageDigest.getInstance("MD5")
      .digest(surfaceNames.mkString(",").getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cpu":$qsCpu,"queries_cpu_drain_timeouts":$drainTimeouts,"errors":$errs,"skipped_verify_gates":$skip,$spinJson$spinMtJson$memBwJson"cpu_total_sec":${num(cpuNanos.get / 1e9)},"task_time_total_sec":${num(runNanos.get / 1e9)},"load_avg_before":${num(loadBefore)},"load_avg_after":${num(loadAfter)},"bench_surface":"$surface","bench_surface_n":${surfaceNames.size},"bench_surface_fp":"$surfaceFp","sf":"$sfDir"}"""
    println(line)
    // Stdout is shared with Spark/log4j noise, so tail-parsing the process
    // output is fragile; always also drop the line into a file — an sbt-forked
    // driver run then still yields machine-readable JSON even if the stdout
    // line is wrapped in log noise. The default target is the UNCOMMITTED
    // BENCH_RUN.json (gitignored): the committed BENCH_LAST.json is the
    // curated best-of-N quiet snapshot and must only be touched when named
    // explicitly via SPARK_GRAFT_BENCH_OUT — a casual full run used to
    // overwrite it silently, shadowing the official artifact (r11 verdict).
    // Subset profiling runs write nothing unless an output is named.
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .orElse(if (subset.isEmpty) Some("BENCH_RUN.json") else None)
    outPath.foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case t: Throwable =>
        System.err.println(s"bench: could not write $p: $t") }
    }
    if (errors.nonEmpty) sys.exit(1)
  }
}
