package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("epoch-changelog stream over a manifest store: one batch per epoch, " +
    "batch-identical to the epoch deltas, rewrite epochs refuse loudly") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_st5").toString
    val store = new graft.io.Store(spark, base)
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") % 17).as("v"))
    store.writeZordered(mk(0, 1000), "tbl", Seq("k", "v"), files = 2)   // epoch 0
    spark.conf.set("spark.sql.catalog.graft_st5t", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_st5t.base", base)

    val q = spark.readStream.table("graft_st5t.tbl")
      .writeStream.format("memory").queryName("st5_sink")
      .option("checkpointLocation", Files.createTempDirectory("graft_st5_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      // first batch = the full epoch-0 file set
      assert(spark.table("st5_sink").count() == 1000)
      // each committed append epoch arrives as ITS OWN delta — no re-reads
      // of old files, no misses
      store.appendZordered(mk(1000, 1200), "tbl", Seq("k", "v"), files = 1) // epoch 1
      q.processAllAvailable()
      assert(spark.table("st5_sink").count() == 1200)
      store.appendZordered(mk(1200, 1250), "tbl", Seq("k", "v"), files = 1) // epoch 2
      q.processAllAvailable()
      val got = spark.table("st5_sink").select("k", "v").as[(Long, Long)]
        .collect().sorted.toSeq
      val want = mk(0, 1250).as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, "stream must deliver exactly the table, once")

      // a REWRITE epoch (recluster drops epoch-2 files) must fail the
      // stream loudly — replaying rewritten rows as inserts would
      // duplicate downstream
      store.recluster("tbl", Seq("k", "v"), files = 2)                   // epoch 3
      val err = intercept[Exception] { q.processAllAvailable() }
      def chain(e: Throwable): Seq[String] =
        if (e == null) Nil else Option(e.getMessage).toSeq ++ chain(e.getCause)
      assert(chain(err).exists(_.contains("REWRITE")), chain(err).mkString(" | "))
    } finally q.stop()

    // offset json round-trips (checkpoint durability shape)
    val off = graft.sql.GraftEpochOffset(7L)
    assert(graft.sql.GraftEpochOffset.fromJson(off.json()) == off)
    intercept[IllegalArgumentException] {
      graft.sql.GraftEpochOffset.fromJson("""{"foo":1}""")
    }

  }

  test("epoch stream over a MANAGED PARTITIONED store: new-day upserts are " +
    "append epochs with dt reconstructed; re-upserting a day refuses; " +
    "maxEpochsPerTrigger paces catch-up") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_st5p").toString
    val store = new graft.io.Store(spark, base)
    def day(d: String, lo: Long, hi: Long) = spark.range(lo, hi).select(
      to_timestamp(lit(s"$d 10:00:00")).as("datetime"),
      col("id").as("k"), (col("id") % 5).cast("double").as("v"))
    store.writePartitionedManaged(day("2024-09-01", 0, 100), "ptbl") // epoch 0
    spark.conf.set("spark.sql.catalog.graft_st5p", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_st5p.base", base)

    val q = spark.readStream.table("graft_st5p.ptbl")
      .writeStream.format("memory").queryName("st5p_sink")
      .option("checkpointLocation", Files.createTempDirectory("graft_st5p_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      val first = spark.table("st5p_sink")
      assert(first.columns.contains("dt"), first.columns.mkString(","))
      assert(first.count() == 100)
      // the daily ingest shape: each NEW day is an append epoch
      store.upsertPartitionsManaged(day("2024-09-02", 100, 150), "ptbl") // epoch 1
      q.processAllAvailable()
      val sunk = spark.table("st5p_sink")
      assert(sunk.count() == 150)
      assert(sunk.where(col("dt") === lit("2024-09-02").cast("date")).count() == 50,
        "the delta batch must carry its reconstructed partition value")
      // RE-upserting an existing day retires its files — a rewrite epoch,
      // refused loudly
      store.upsertPartitionsManaged(day("2024-09-02", 200, 210), "ptbl") // epoch 2
      val err = intercept[Exception] { q.processAllAvailable() }
      def chain(e: Throwable): Seq[String] =
        if (e == null) Nil else Option(e.getMessage).toSeq ++ chain(e.getCause)
      assert(chain(err).exists(_.contains("REWRITE")), chain(err).mkString(" | "))
    } finally q.stop()

    // pacing: a stream starting against a 3-epoch history with
    // maxEpochsPerTrigger=1 advances one epoch per micro-batch instead of
    // one giant first batch — and still delivers everything
    val base2 = Files.createTempDirectory("graft_st5q").toString
    val store2 = new graft.io.Store(spark, base2)
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") % 17).as("v"))
    store2.writeZordered(mk(0, 300), "tbl", Seq("k", "v"), files = 2)    // epoch 0
    store2.appendZordered(mk(300, 400), "tbl", Seq("k", "v"), files = 1) // epoch 1
    store2.appendZordered(mk(400, 450), "tbl", Seq("k", "v"), files = 1) // epoch 2
    spark.conf.set("spark.sql.catalog.graft_st5q", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_st5q.base", base2)
    val q2 = spark.readStream
      .option("maxEpochsPerTrigger", "1")
      .table("graft_st5q.tbl")
      .writeStream.format("memory").queryName("st5q_sink")
      .option("checkpointLocation", Files.createTempDirectory("graft_st5q_ck").toString)
      .start()
    try {
      q2.processAllAvailable()
      assert(spark.table("st5q_sink").count() == 450)
      val batches = q2.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3,
        s"expected one micro-batch per epoch, got ${batches.length}")
      assert(batches.map(_.numInputRows).toSeq == Seq(300L, 100L, 50L),
        batches.map(_.numInputRows).mkString(","))
    } finally q2.stop()

    // file-count pacing: epoch 0 carries 2 files, epochs 1/2 one each.
    // maxFilesPerTrigger=2 admits whole epochs while the delta-file
    // budget lasts (epoch 0 alone exhausts it; epochs 1+2 fit together),
    // and a first epoch larger than the budget still advances the stream
    val q3 = spark.readStream
      .option("maxFilesPerTrigger", "2")
      .table("graft_st5q.tbl")
      .writeStream.format("memory").queryName("st5r_sink")
      .option("checkpointLocation", Files.createTempDirectory("graft_st5r_ck").toString)
      .start()
    try {
      q3.processAllAvailable()
      assert(spark.table("st5r_sink").count() == 450)
      val batches = q3.recentProgress.filter(_.numInputRows > 0)
      assert(batches.map(_.numInputRows).toSeq == Seq(300L, 150L),
        batches.map(_.numInputRows).mkString(","))
    } finally q3.stop()
    // an explicit ReadAllAvailable limit (Trigger.Once's contract)
    // OVERRIDES the pacing: capping it would strand the epochs past the
    // cap when the single-batch query terminates
    val allStream = new graft.sql.GraftEpochStream(spark, base2, "tbl",
      spark.read.parquet(s"$base2/tbl").schema,
      spark.read.parquet(s"$base2/tbl").schema,
      basePath = None, maxEpochsPerTrigger = Some(1))
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val cur = allStream.latestOffset().asInstanceOf[graft.sql.GraftEpochOffset].epoch
    assert(allStream.latestOffset(graft.sql.GraftEpochOffset(-1L),
      ReadLimit.allAvailable()).asInstanceOf[graft.sql.GraftEpochOffset].epoch == cur,
      "Trigger.Once (allAvailable) must deliver everything despite pacing options")
    assert(allStream.latestOffset(graft.sql.GraftEpochOffset(-1L),
      allStream.getDefaultReadLimit()).asInstanceOf[graft.sql.GraftEpochOffset].epoch == 0L,
      "the default (paced) limit steps one epoch")

    // a paced FRESH stream over a table whose early history was vacuumed
    // anchors its first batch at the oldest still-readable epoch instead
    // of crashing on the vacuumed one
    store2.deleteWhere("tbl", col("k") < 5)                             // epoch 3
    store2.vacuum("tbl", keepLast = 2)                                  // keeps 2, 3
    val q4 = spark.readStream
      .option("maxEpochsPerTrigger", "1")
      .option("maxFilesPerTrigger", "100")
      .table("graft_st5q.tbl")
      .writeStream.format("memory").queryName("st5s_sink")
      .option("checkpointLocation", Files.createTempDirectory("graft_st5s_ck").toString)
      .start()
    try {
      // batch 1 anchors at epoch 2 (the oldest readable) and delivers its
      // full 450-row file set; batch 2 (epoch 3, a COW-delete REWRITE)
      // then refuses loudly — the documented append-only line. What must
      // NOT appear anywhere is "not readable": that is the vacuumed-epoch
      // startup crash this law exists to prevent.
      val e4 = intercept[Exception] { q4.processAllAvailable() }
      def c(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ c(x.getCause)
      assert(c(e4).exists(_.contains("REWRITE")) &&
        !c(e4).exists(_.contains("not readable")), c(e4).mkString(" | "))
      assert(spark.table("st5s_sink").count() == 450,
        "the paced fresh start must anchor at the oldest readable epoch")
    } finally q4.stop()

    // a zero/negative cap is loud, not a silent freeze (same law as
    // maxEpochsPerTrigger)
    val eBad = intercept[Exception] {
      spark.readStream.option("maxFilesPerTrigger", "0")
        .table("graft_st5q.tbl")
        .writeStream.format("memory").queryName("st5r_bad")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_st5r_bk").toString)
        .start().processAllAvailable()
    }
    def chain2(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ chain2(e.getCause)
    assert(chain2(eBad).exists(_.contains("maxFilesPerTrigger")),
      chain2(eBad).mkString(" | "))

    // startingEpoch anchors a NEW checkpoint (Delta's startingVersion
    // shape): "2" delivers epochs 2.. only; "latest" delivers only what
    // commits after the stream starts. Fresh table — anchors need their
    // predecessor snapshots readable.
    val base3 = Files.createTempDirectory("graft_st5t").toString
    val store3 = new graft.io.Store(spark, base3)
    store3.writeZordered(mk(0, 300), "tbl", Seq("k", "v"), files = 2)    // epoch 0
    store3.appendZordered(mk(300, 400), "tbl", Seq("k", "v"), files = 1) // epoch 1
    store3.appendZordered(mk(400, 450), "tbl", Seq("k", "v"), files = 1) // epoch 2
    spark.conf.set("spark.sql.catalog.graft_st5se", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_st5se.base", base3)
    val q5 = spark.readStream
      .option("startingEpoch", "2")
      .table("graft_st5se.tbl")
      .writeStream.format("memory").queryName("st5t_sink")
      .option("checkpointLocation", Files.createTempDirectory("graft_st5t_ck").toString)
      .start()
    try {
      q5.processAllAvailable()
      assert(spark.table("st5t_sink").select("k").as[Long].collect().sorted.toSeq ==
        (400L until 450L).toSeq, "startingEpoch=2 must deliver exactly epoch 2's delta")
    } finally q5.stop()
    val q6 = spark.readStream
      .option("startingEpoch", "latest")
      .table("graft_st5se.tbl")
      .writeStream.format("memory").queryName("st5u_sink")
      .option("checkpointLocation", Files.createTempDirectory("graft_st5u_ck").toString)
      .start()
    try {
      q6.processAllAvailable()
      assert(spark.table("st5u_sink").count() == 0,
        "startingEpoch=latest must skip the existing table")
      store3.appendZordered(mk(450, 460), "tbl", Seq("k", "v"), files = 1) // epoch 3
      q6.processAllAvailable()
      assert(spark.table("st5u_sink").select("k").as[Long].collect().sorted.toSeq ==
        (450L until 460L).toSeq, "only the post-start epoch arrives")
    } finally q6.stop()
    val eSe = intercept[Exception] {
      spark.readStream.option("startingEpoch", "nope").table("graft_st5se.tbl")
        .writeStream.format("memory").queryName("st5v_sink")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_st5v_ck").toString)
        .start().processAllAvailable()
    }
    assert(chain2(eSe).exists(_.contains("startingEpoch")),
      chain2(eSe).mkString(" | "))
    // an anchor BEYOND current+1 fails at stream start with a
    // startingEpoch-named message (r19 ADVICE: before the guard it
    // surfaced as an unrelated "epoch N-1 not readable" later on)
    val eAhead = intercept[Exception] {
      spark.readStream.option("startingEpoch", "99").table("graft_st5se.tbl")
        .writeStream.format("memory").queryName("st5w_sink")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_st5w_ck").toString)
        .start().processAllAvailable()
    }
    assert(chain2(eAhead).exists(m =>
      m.contains("startingEpoch") && m.contains("beyond")),
      chain2(eAhead).mkString(" | "))
  }

  test("hourly windowed aggregate over a file stream matches the batch result") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_in").toString
    val events = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 3.0),
      (ts("2024-01-01 10:20:00"), "error", 7.0),
      (ts("2024-01-01 11:10:00"), "click", 5.0))
    events.toDF("ts", "event_type", "value").write.parquet(s"$dir/batch1")

    val schema = spark.read.parquet(s"$dir/batch1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
    val agg = EventStreams.hourlyAggregate(stream)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("hourly_out")
      .option("checkpointLocation", Files.createTempDirectory("graft_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      // append mode only emits closed windows; push the watermark past 11:00
      Seq((ts("2024-01-01 14:00:00"), "click", 0.0)).toDF("ts", "event_type", "value")
        .write.parquet(s"$dir/batch2")
      q.processAllAvailable()
      val out = spark.table("hourly_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(out(("2024-01-01 10:00:00.0", "click")) == (2L, 2.0))
      assert(out(("2024-01-01 10:00:00.0", "error")) == (1L, 7.0))
      assert(out(("2024-01-01 11:00:00.0", "click")) == (1L, 5.0))
      // and the same plan over the same data as a BATCH frame agrees
      val batch = EventStreams.hourlyAggregate(spark.read.parquet(s"$dir/batch1"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(batch(("2024-01-01 10:00:00.0", "click")) == (2L, 2.0))
    } finally q.stop()
  }

  test("streaming windowed quantile sketch: closed windows hold the rank bound") {
    // Quantiles.approxByGroups' scaladoc claims the sketch aggregate runs
    // unchanged inside a watermarked streaming window (mergeable state —
    // the exact percentile_disc surface cannot). Prove it: stream values
    // 1..100 into one hour window, close it, and require the emitted p50
    // to satisfy the GK rank bound vs the exact multiset (rank 50 +-
    // n/accuracy + 1 ~= +-1.1 -> an element in [49, 51]). The bound — not
    // value equality vs a batch run — is the right assertion: GK answers
    // may legally differ with merge order, the guarantee is what's stable.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val df = input.toDF().toDF("ts", "v").withWatermark("ts", "30 minutes")
    val agg = graft.operators.Quantiles.approxByGroups(df,
        Seq(window(col("ts"), "1 hour").as("w")), col("v"), Seq(0.5), 1000)
      .select(col("w.start").as("hour"), col("p50_approx"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("quantile_out").start()
    try {
      input.addData((1 to 60).map(i => (ts("2024-01-01 10:05:00"), i.toDouble)): _*)
      q.processAllAvailable()
      input.addData((61 to 100).map(i => (ts("2024-01-01 10:40:00"), i.toDouble)): _*)
      q.processAllAvailable()
      input.addData((ts("2024-01-01 14:00:00"), 0.0)) // push the watermark
      q.processAllAvailable()
      val out = spark.table("quantile_out").collect()
        .map(r => r.getTimestamp(0).toString -> r.getDouble(1)).toMap
      val p50 = out("2024-01-01 10:00:00.0")
      assert(p50 == math.rint(p50) && p50 >= 49.0 && p50 <= 51.0,
        s"streamed p50=$p50 violates the rank bound on 1..100")
    } finally q.stop()
  }

  test("streaming dedup keeps first arrival per key within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupByKey(df)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), 1.0), (2L, ts("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:02:00"), 99.0)) // duplicate key, later arrival
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(out == Map(1L -> 1.0, 2L -> 2.0)) // first arrival won
    } finally q.stop()
  }

  test("streaming upsert sink: newest replaces on key collision across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_upsert_sink").toString
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.upsertSink(input.toDF().toDF("k", "v"),
      s"$dir/table", Seq("k"), s"$dir/ckpt")
    try {
      input.addData((1L, "a1"), (2L, "b1"))
      q.processAllAvailable()
      // batch 2 collides on key 2 and inserts key 3
      input.addData((2L, "b2"), (3L, "c1"))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/table").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == Map(1L -> "a1", 2L -> "b2", 3L -> "c1"))
      // the merge is a table-state operation: re-upserting the same rows
      // (a checkpoint-recovery replay) must change nothing
      input.addData((2L, "b2"), (3L, "c1"))
      q.processAllAvailable()
      val again = spark.read.parquet(s"$dir/table").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(again == out)
    } finally q.stop()
  }

  test("partition-scoped upsert sink: merges like full-table keep-newest, never touches other days' files") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_upsert_part").toString
    val table = s"$dir/table"
    def fileAudit(day: String): Set[(String, Long, Long)] = {
      val d = new java.io.File(s"$table/dt=$day")
      d.listFiles().filter(_.isFile).filterNot(_.getName.startsWith("."))
        .map(f => (f.getName, f.length(), f.lastModified())).toSet
    }
    val input = MemoryStream[(Timestamp, String)]
    val q = EventStreams.upsertSinkPartitioned(input.toDF().toDF("ts", "v"),
      table, keys = Seq("ts"), tsCol = "ts", checkpointDir = s"$dir/ckpt")
    try {
      val b1 = Seq((ts("2024-01-01 10:00:00"), "a1"), (ts("2024-01-02 11:00:00"), "b1"))
      val b2 = Seq((ts("2024-01-02 11:00:00"), "b2"), (ts("2024-01-02 12:00:00"), "c1"))
      input.addData(b1: _*)
      q.processAllAvailable()
      val day1Before = fileAudit("2024-01-01")
      assert(day1Before.nonEmpty)
      // batch 2 lands entirely in dt=2024-01-02: collides on 11:00, inserts 12:00
      input.addData(b2: _*)
      q.processAllAvailable()
      // LAW 1 (the point of the face): the untouched partition's files are
      // byte-identical — same names, sizes, and mtimes; nothing rewrote them
      assert(fileAudit("2024-01-01") == day1Before,
        s"untouched dt=2024-01-01 was rewritten:\nbefore=$day1Before\nafter=${fileAudit("2024-01-01")}")
      // LAW 2: table content equals the full-table keep-newest over the
      // same batch sequence
      val expected = graft.operators.Upsert.keepNewest(
          b1.toDF("ts", "v"), b2.toDF("ts", "v"), Seq("ts"))
        .collect().map(r => r.getTimestamp(0) -> r.getString(1)).toMap
      def tableNow() = spark.read.parquet(table).drop("dt").collect()
        .map(r => r.getTimestamp(0) -> r.getString(1)).toMap
      assert(tableNow() == expected)
      assert(expected(ts("2024-01-02 11:00:00")) == "b2") // newest won
      // LAW 3: a checkpoint-recovery replay of batch 2 changes nothing —
      // including, again, the untouched partition's files
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(tableNow() == expected)
      assert(fileAudit("2024-01-01") == day1Before)
    } finally q.stop()
  }

  test("partition-scoped upsert refuses a key set the partition is not a function of") {
    import spark.implicits._
    val err = intercept[IllegalArgumentException] {
      EventStreams.upsertPartitions(
        Seq((ts("2024-01-01 10:00:00"), 1L, "a")).toDF("ts", "k", "v"),
        "/tmp/unused", keys = Seq("k"), tsCol = "ts")
    }
    assert(err.getMessage.contains("function of the merge key"))
  }

  test("stream-stream interval join: in-window pairs emit, out-of-window don't, batch agrees") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val reads = MemoryStream[(Long, Timestamp, Double)]
    val lDf = clicks.toDF().toDF("user_id", "ts")
    val rDf = reads.toDF().toDF("r_user", "rts", "r_value")
    val joined = EventStreams.intervalJoin(lDf, rDf,
      leftKey = "user_id", rightKey = "r_user", leftTs = "ts", rightTs = "rts",
      beforeSeconds = 60, afterSeconds = 120)
      .select("user_id", "ts", "rts", "r_value")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ivj_out").start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:10:00")), (2L, ts("2024-01-01 10:30:00")))
      reads.addData(
        (1L, ts("2024-01-01 10:09:30"), 5.0),  // 30s before  -> in  (before=60)
        (1L, ts("2024-01-01 10:11:30"), 6.0),  // 90s after   -> in  (after=120)
        (1L, ts("2024-01-01 10:07:00"), 7.0),  // 180s before -> out
        (2L, ts("2024-01-01 10:29:00"), 8.0),  // same window, other key -> in for 2 only
        (3L, ts("2024-01-01 10:10:00"), 9.0))  // key with no left event -> out
      q.processAllAvailable()
      val out = spark.table("ivj_out").collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSet
      assert(out == Set((1L, 5.0), (1L, 6.0), (2L, 8.0)))
      // the same plan over the same data as BATCH frames agrees
      val lb = Seq((1L, ts("2024-01-01 10:10:00")), (2L, ts("2024-01-01 10:30:00")))
        .toDF("user_id", "ts")
      val rb = Seq(
        (1L, ts("2024-01-01 10:09:30"), 5.0), (1L, ts("2024-01-01 10:11:30"), 6.0),
        (1L, ts("2024-01-01 10:07:00"), 7.0), (2L, ts("2024-01-01 10:29:00"), 8.0),
        (3L, ts("2024-01-01 10:10:00"), 9.0)).toDF("r_user", "rts", "r_value")
      val batch = EventStreams.intervalJoin(lb, rb,
        "user_id", "r_user", "ts", "rts", 60, 120)
        .select("user_id", "ts", "rts", "r_value")
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
      assert(batch == out)
    } finally q.stop()
  }

  test("streaming incremental dedup: corpus hits and within-stream repeats both drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, "existing corpus document text")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.dedupAgainstCorpus(
        input.toDF().toDF("doc_id", "ts", "text"), corpus)
      .writeStream.outputMode("append").format("memory").queryName("inc_dedup_out").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "existing corpus document text"), // corpus hit
        (2L, ts("2024-01-01 10:01:00"), "a brand new document"))          // kept
      q.processAllAvailable()
      input.addData(
        (3L, ts("2024-01-01 10:02:00"), "a brand new document"))          // stream repeat
      q.processAllAvailable()
      val out = spark.table("inc_dedup_out").collect().map(_.getLong(0)).toSet
      assert(out == Set(2L)) // corpus duplicate and stream duplicate both dropped
    } finally q.stop()
  }

  test("streaming sketch dedup: bloom corpus hits and within-stream repeats both drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, "existing corpus document text")).toDF("doc_id", "text")
    val bloom = graft.ext.Dedup.corpusBloom(corpus)
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.dedupAgainstCorpusSketch(
        input.toDF().toDF("doc_id", "ts", "text"), bloom)
      .writeStream.outputMode("append").format("memory").queryName("sketch_dedup_out").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "existing corpus document text"), // bloom hit
        (2L, ts("2024-01-01 10:01:00"), "a brand new document"))          // kept
      q.processAllAvailable()
      input.addData(
        (3L, ts("2024-01-01 10:02:00"), "a brand new document"))          // stream repeat
      q.processAllAvailable()
      val out = spark.table("sketch_dedup_out").collect().map(_.getLong(0)).toSet
      assert(out == Set(2L))
    } finally q.stop()
  }

  test("streaming curation: repetitive, corpus-dup, and cleaned-repeat docs drop; fresh prose keeps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, "an existing corpus document about energy markets"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.curateStream(input.toDF().toDF("doc_id", "ts", "text"), corpus)
      .writeStream.outputMode("append").format("memory").queryName("curate_out").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "a fresh document with http://x.io/a links and unique prose here"),
        (2L, ts("2024-01-01 10:01:00"), "an existing corpus document about energy markets"), // corpus dup
        (3L, ts("2024-01-01 10:02:00"), "spam spam spam spam spam spam spam spam spam spam")) // repetitive
      q.processAllAvailable()
      // doc 4 differs from doc 1 only by URL — the dedup tier keys on the
      // CLEANED text, so it drops as a within-stream repeat
      input.addData(
        (4L, ts("2024-01-01 10:03:00"), "a fresh document with http://y.io/b links and unique prose here"))
      q.processAllAvailable()
      val rows = spark.table("curate_out").collect()
      assert(rows.map(r => r.getLong(r.fieldIndex("doc_id"))).toSet == Set(1L))
      val kept = rows.head
      assert(kept.getString(kept.fieldIndex("clean_text"))
        == "a fresh document with <URL> links and unique prose here")
      assert(kept.getLong(kept.fieldIndex("n_urls")) == 1L)
      // the stateless stage is the SAME function on a batch frame
      val batch = EventStreams.repetitionFiltered(Seq(
        (1L, "a fresh document with http://x.io/a links and unique prose here"),
        (3L, "spam spam spam spam spam spam spam spam spam spam")).toDF("doc_id", "text"))
      assert(batch.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    } finally q.stop()
  }

  test("streaming quality gate: rule-failing docs drop mid-stream, batch-identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox jumps over a lazy dog near the old stone " +
      "bridge while birds sing in the warm morning light and children play for " +
      "hours on the green grass by the river bank today"
    val bad = "too short to pass the word count rule"
    val rows = Seq((1L, ts("2024-01-01 10:00:00"), good),
      (2L, ts("2024-01-01 10:01:00"), bad))
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.qualityFiltered(input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.outputMode("append").format("memory").queryName("qual_out").start()
    val streamed = try {
      input.addData(rows: _*)
      q.processAllAvailable()
      spark.table("qual_out").collect()
        .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("keep"))))
    } finally q.stop()
    assert(streamed.toSeq == Seq((1L, 1L)))
    // the same function on a batch frame selects the same rows
    val batch = EventStreams.qualityFiltered(
      rows.toDF("doc_id", "ts", "text")).select("doc_id").collect().map(_.getLong(0))
    assert(batch.toSeq == Seq(1L))
  }

  test("streaming diversity gate: low-TTR spam drops mid-stream, batch-identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val diverse = (1 to 8).map(i => s"alpha$i beta$i").mkString(" ") // 16 words, all distinct
    val spam = (1 to 16).map(_ => "buy").mkString(" ")               // ttr 1/16, top 16
    val rows = Seq((1L, ts("2024-01-01 10:00:00"), diverse),
      (2L, ts("2024-01-01 10:01:00"), spam))
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.diversityFiltered(input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.outputMode("append").format("memory").queryName("div_out").start()
    val streamed = try {
      input.addData(rows: _*)
      q.processAllAvailable()
      spark.table("div_out").collect()
        .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("keep"))))
    } finally q.stop()
    assert(streamed.toSeq == Seq((1L, 1L)))
    val batch = EventStreams.diversityFiltered(
      rows.toDF("doc_id", "ts", "text")).select("doc_id").collect().map(_.getLong(0))
    assert(batch.toSeq == Seq(1L))
  }

  test("streaming and batch sessionization agree on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (7L, ts("2024-01-01 09:00:00"), 1.0), (7L, ts("2024-01-01 09:10:00"), 2.0),
      (7L, ts("2024-01-01 11:00:00"), 5.0), // > 30 min gap -> second session
      (8L, ts("2024-01-01 09:05:00"), 4.0))

    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.sessionize(
        input.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_parity").start()
    val streamed = try {
      input.addData(events: _*)
      q.processAllAvailable()
      // far-future sentinel pushes the watermark past every gap deadline,
      // timing out (= closing) all real sessions
      input.addData((999L, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      spark.table("sess_parity").as[EventStreams.Session].collect()
        .filter(_.userId != 999L)
        .map(s => (s.userId, s.nEvents, s.startTs, s.endTs)).toSet
    } finally q.stop()

    val batch = graft.operators.Sessionize.sessions(
        events.toDF("user_id", "ts", "value"), "user_id", "ts", 1800L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(batch.size == 3) // u7 x2 sessions + u8 x1
  }

  test("sessionization: gap splits sessions, state emits closed ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.sessionize(
        input.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      // user 7: two bursts 2 hours apart -> first session closes when the
      // second burst arrives
      input.addData((7L, ts("2024-01-01 09:00:00"), 1.0), (7L, ts("2024-01-01 09:10:00"), 2.0))
      q.processAllAvailable()
      input.addData((7L, ts("2024-01-01 11:00:00"), 5.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").as[EventStreams.Session].collect()
      assert(out.length == 1)
      assert(out(0).userId == 7L && out(0).nEvents == 2 && out(0).totalValue == 3.0)
      assert(out(0).startTs == ts("2024-01-01 09:00:00") && out(0).endTs == ts("2024-01-01 09:10:00"))
    } finally q.stop()
  }

  test("sessionization: a stray late event beyond the gap becomes its own session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.sessionize(
        input.toDF().toDF("user_id", "ts", "value"),
        gapMinutes = 30, watermarkDelay = "2 hours")
      .writeStream.outputMode("append").format("memory").queryName("sess_stray").start()
    try {
      input.addData((7L, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // 45 minutes BEFORE the open session's start (> gap): batch
      // semantics put it in its own session — the old min/max merge would
      // weld one session spanning a 45-minute internal gap
      input.addData((7L, ts("2024-01-01 11:15:00"), 2.0))
      q.processAllAvailable()
      input.addData((7L, ts("2024-01-01 12:10:00"), 4.0))
      q.processAllAvailable()
      input.addData((999L, ts("2024-01-03 00:00:00"), 0.0)) // close via timeout
      q.processAllAvailable()
      val out = spark.table("sess_stray").as[EventStreams.Session].collect()
        .filter(_.userId == 7L).sortBy(_.startTs.getTime)
      assert(out.length == 2, s"expected stray singleton + main session: ${out.toSeq}")
      assert(out(0).nEvents == 1 && out(0).startTs == ts("2024-01-01 11:15:00"))
      assert(out(1).nEvents == 2 &&
        out(1).startTs == ts("2024-01-01 12:00:00") &&
        out(1).endTs == ts("2024-01-01 12:10:00"))
      // batch agreement on the same event multiset
      val batch = graft.operators.Sessionize.sessions(
        Seq((7L, ts("2024-01-01 12:00:00"), 1.0), (7L, ts("2024-01-01 11:15:00"), 2.0),
            (7L, ts("2024-01-01 12:10:00"), 4.0)).toDF("user_id", "ts", "value"),
        "user_id", "ts", 1800L)
      assert(batch.count() == 2)
    } finally q.stop()
  }

  test("sessionization: a cross-batch late event extends the session, never rewinds it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    // generous watermark so the late event is admitted, not dropped
    val q = EventStreams.sessionize(
        input.toDF().toDF("user_id", "ts", "value"),
        gapMinutes = 30, watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("sess_late").start()
    try {
      input.addData((7L, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // a LATE event, older than the session's last event but inside the
      // watermark: with the old blind lastMs assignment this rewound the
      // session end to 11:55, so the 12:27 event (true gap 27 min) read a
      // 32-minute gap and wrongly split the session in two
      input.addData((7L, ts("2024-01-01 11:55:00"), 2.0))
      q.processAllAvailable()
      input.addData((7L, ts("2024-01-01 12:27:00"), 4.0))
      q.processAllAvailable()
      input.addData((999L, ts("2024-01-03 00:00:00"), 0.0)) // close via timeout
      q.processAllAvailable()
      val out = spark.table("sess_late").as[EventStreams.Session].collect()
        .filter(_.userId == 7L)
      assert(out.length == 1, s"late event split the session: ${out.toSeq}")
      assert(out(0).nEvents == 3 && out(0).totalValue == 7.0)
      assert(out(0).startTs == ts("2024-01-01 11:55:00") &&
        out(0).endTs == ts("2024-01-01 12:27:00"))
    } finally q.stop()
  }

  test("st3 stream bloom probe keeps exactly x39's keep decisions on its feed") {
    // st3's feed is x39's re-crawl batch MINUS the mod-35 copies (those
    // duplicate batch-side docs, which the stream face dedups
    // nondeterministically in batch — see the query's scaladoc). On the
    // shared remainder the sketch probe must agree with x39's verdicts
    // row-for-row: same sketch, same corpus, different operator face.
    val sf = "/root/testdata/sf0.001"
    val kept = graft.SparkEntry.queries("st3_stream_bloom_probe")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val x39Keep = graft.SparkEntry.queries("x39_dedup_bloom")(spark, sf)
      .where(col("action") === "keep")
      .collect().map(_.getLong(0)).toSet
    val mod35Copies = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 35 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept == (x39Keep -- mod35Copies))
  }

  test("streaming as-of enrichment: closed groups equal the batch AsofJoin.nearest, " +
    "ties break earlier, unmatched events survive with nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val static = Seq((ts("2024-01-01 10:00:00"), 1.0), (ts("2024-01-01 10:30:00"), 2.0),
      (ts("2024-01-01 11:00:00"), 3.0)).toDF("t", "rate")
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = Seq( // third column = non-key payload carried via first()
      (1L, ts("2024-01-01 10:05:00"), "p1"), // nearest 10:00 -> 1.0
      (2L, ts("2024-01-01 10:15:00"), "p2"), // equidistant 10:00/10:30 -> earlier -> 1.0
      (3L, ts("2024-01-01 10:50:00"), "p3"), // nearest 11:00 -> 3.0
      (4L, ts("2024-01-01 12:30:00"), "p4")) // no reference within 15 min -> null
    val q = EventStreams.asofEnrich(input.toDF().toDF("event_id", "t", "payload"), static,
        "t", 900L, Seq("event_id", "t"), "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("asof_out").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData((99L, ts("2024-01-01 20:00:00"), "p99")) // advance the watermark
      q.processAllAvailable()
      // output order: keyCols (event_id, t), carried (payload), then rate
      val rows = spark.table("asof_out").collect().filter(_.getLong(0) != 99L)
      val got = rows
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
      assert(got == Map(1L -> 1.0, 2L -> 1.0, 3L -> 3.0, 4L -> -1.0), got.toString)
      // the event's own payload rides through the streaming aggregation
      assert(rows.map(r => r.getLong(0) -> r.getString(2)).toMap ==
        Map(1L -> "p1", 2L -> "p2", 3L -> "p3", 4L -> "p4"))
      // law: identical to the batch as-of join on the same frames
      val batch = graft.operators.AsofJoin.nearest(
          events.toDF("event_id", "t", "payload"), static, "t", 900L, Seq("event_id"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
      assert(batch == got, s"stream face diverged from batch: $batch vs $got")
    } finally q.stop()
  }

  test("asofEnrich accepts TIMESTAMP_NTZ inputs and matches the batch as-of, like AsofJoin does") {
    import spark.implicits._
    // the driver's testdata flipped events.ts between physical timestamp
    // flavors once (round 7); the batch AsofJoin normalizes NTZ through
    // TimeCols.ltz, so the stream face claiming row-for-row identity must
    // accept the same inputs — before the fix this failed analysis at
    // unix_micros
    val ntz = org.apache.spark.sql.types.TimestampNTZType
    val static = Seq((ts("2024-01-01 10:00:00"), 1.0), (ts("2024-01-01 10:30:00"), 2.0))
      .toDF("t", "rate").withColumn("t", col("t").cast(ntz))
    val events = Seq((1L, ts("2024-01-01 10:05:00")), (2L, ts("2024-01-01 10:40:00")),
        (3L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "t").withColumn("t", col("t").cast(ntz))
    val got = EventStreams.asofEnrich(events, static, "t", 900L, Seq("event_id", "t"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toMap
    assert(got == Map(1L -> 1.0, 2L -> 2.0, 3L -> -1.0), got.toString)
    val batch = graft.operators.AsofJoin.nearest(events, static, "t", 900L, Seq("event_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toMap
    assert(batch == got, s"NTZ stream face diverged from batch: $batch vs $got")
  }

  test("zordered append sink: stream content equals batch appends, replay is a no-op, " +
    "periodic scoped recluster bounds the layer count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_zsink").toString
    val table = s"$dir/table"
    val input = MemoryStream[(Long, Long)]
    val q = EventStreams.zorderedAppendSink(
      input.toDF().toDF("k", "v"), table, Seq("k", "v"),
      checkpointDir = s"$dir/ckpt", files = 2, bits = 4, reclusterEvery = 2)
    var viewRegistered = false
    try {
      // 4 batches -> scoped recluster fires after batch ids 1 and 3
      (0 until 4).foreach { i =>
        input.addData((0L until 500L).map(j => (i * 500L + j, j % 97)): _*)
        q.processAllAvailable()
        if (i == 0) {
          // a snapshot view pinned after the FIRST committed batch must
          // follow every later batch's epoch (each exactly-once commit
          // re-pins it) — streaming ingest composes with the SQL face
          new graft.io.Store(spark, dir).registerSnapshotView("graft_zsink_v", "table")
          viewRegistered = true
          assert(spark.table("graft_zsink_v").count() == 500)
        }
      }
      assert(spark.table("graft_zsink_v").count() == 2000,
        "snapshot view fell behind the streaming commits")
    } finally {
      q.stop()
      if (viewRegistered) spark.catalog.dropTempView("graft_zsink_v")
    }
    val got = spark.read.parquet(table)
    assert(got.count() == 2000)
    assert(got.agg(sum("k")).head.getLong(0) == (0L until 2000L).sum,
      "stream content diverged from the equivalent batch appends")
    // after the batch-3 recluster no append layers remain: bounded files
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = graft.io.LayoutManifest.read(fs, new org.apache.hadoop.fs.Path(table)).get
    assert(m.appends.isEmpty && m.lastBatch.contains(3L), m.toString)
    // a checkpoint-recovery re-delivery of a committed batch is a no-op
    val store = new graft.io.Store(spark, dir)
    val dup = (0L until 500L).map(j => (j, j % 97)).toDF("k", "v")
    assert(!store.appendZorderedExactlyOnce(dup, "table", Seq("k", "v"), batchId = 3L,
      files = 2, bits = 4))
    assert(spark.read.parquet(table).count() == 2000, "replayed batch duplicated rows")
    // ...and the watermark survives a later full recluster too
    store.recluster("table", Seq("k", "v"), files = 2, bits = 4)
    assert(!store.appendZorderedExactlyOnce(dup, "table", Seq("k", "v"), batchId = 3L,
      files = 2, bits = 4))
    assert(spark.read.parquet(table).count() == 2000)
    // but the NEXT batch id lands
    assert(store.appendZorderedExactlyOnce(dup, "table", Seq("k", "v"), batchId = 4L,
      files = 2, bits = 4))
    assert(spark.read.parquet(table).count() == 2500)
  }

  test("upsert replay after a crash mid-swap restores the parked table instead of losing it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upsert_crash").toString
    val table = s"$dir/table"
    val b1 = Seq((ts("2024-01-01 10:00:00"), "a1"), (ts("2024-01-01 11:00:00"), "b1"),
      (ts("2024-01-02 09:00:00"), "c1")).toDF("ts", "v")
    EventStreams.upsertPartitions(b1, table, keys = Seq("ts"), tsCol = "ts")
    // simulate a hard crash between swapInto's two renames on day 1: the
    // day is parked under the dot prefix and its dt= directory is missing
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val day1 = new org.apache.hadoop.fs.Path(table, "dt=2024-01-01")
    val parked = new org.apache.hadoop.fs.Path(table, ".old_dt=2024-01-01")
    assert(fs.rename(day1, parked) && !fs.exists(day1))
    // the replaying batch touches day 1 with ONE of its two keys: before
    // the recovery fix this merge read the missing day as empty and the
    // swap's park cleanup destroyed 11:00's row for good
    val b2 = Seq((ts("2024-01-01 10:00:00"), "a2")).toDF("ts", "v")
    EventStreams.upsertPartitions(b2, table, keys = Seq("ts"), tsCol = "ts")
    val out = spark.read.parquet(table).drop("dt").collect()
      .map(r => r.getTimestamp(0) -> r.getString(1)).toMap
    assert(out == Map(ts("2024-01-01 10:00:00") -> "a2",
      ts("2024-01-01 11:00:00") -> "b1", ts("2024-01-02 09:00:00") -> "c1"),
      s"rows lost across crash replay: $out")
    assert(!fs.exists(parked))
  }

  test("upsert against an existing-but-empty table dir (crash before first swap) proceeds as first write") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upsert_emptydir").toString
    val table = s"$dir/table"
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(table)) // the mkdirs-then-crash leftover
    val b = Seq((ts("2024-01-01 10:00:00"), "a1")).toDF("ts", "v")
    EventStreams.upsertPartitions(b, table, keys = Seq("ts"), tsCol = "ts")
    val out = spark.read.parquet(table).drop("dt").collect()
      .map(r => r.getTimestamp(0) -> r.getString(1)).toMap
    assert(out == Map(ts("2024-01-01 10:00:00") -> "a1"))
  }

  test("streaming scd2 sink: micro-batches fold into the history store like a full " +
    "rebuild; replay is a no-op; untouched buckets never move") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_scd2_sink").toString
    val table = s"$dir/hist"
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = EventStreams.scd2Sink(input.toDF().toDF("k", "t", "id", "v"),
      table, "k", Seq("t", "id"), Seq("v"), s"$dir/ckpt", buckets = 16)
    def bucketFiles(): Map[String, Set[(String, Long, Long)]] =
      new java.io.File(table).listFiles().filter(_.isDirectory)
        .filterNot(_.getName.startsWith("."))
        .map(d => d.getName -> d.listFiles().filter(_.isFile)
          .filterNot(_.getName.startsWith("."))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet).toMap
    try {
      val b1 = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (2L, 10L, 3L, "x"))
      val b2 = Seq((1L, 30L, 4L, "b"), (3L, 30L, 5L, "z")) // k=2 untouched
      input.addData(b1: _*)
      q.processAllAvailable()
      val before = bucketFiles()
      input.addData(b2: _*)
      q.processAllAvailable()
      val after = bucketFiles()
      // k=2's bucket is untouched by batch 2 — byte-identical files
      // (k=2 must hash apart from 1 and 3 at 16 buckets: asserted, not assumed)
      def kb(k: Long) = Seq(k).toDF("k")
        .select(pmod(xxhash64(col("k")), lit(16L)).cast("int")).head.getInt(0)
      assert(kb(2L) != kb(1L) && kb(2L) != kb(3L), "fixture keys collide; pick others")
      val touched = after.keySet.filterNot(b => before.get(b).contains(after(b)))
      assert(!touched.contains(s"kb=${kb(2L)}"),
        s"untouched key's bucket was rewritten: $touched")
      val expect = graft.operators.Scd2.history(
        (b1 ++ b2).toDF("k", "t", "id", "v"), "k", Seq("t", "id"), Seq("v"))
        .collect().map(_.toString).sorted.toSeq
      def stored() = graft.operators.Scd2.readStore(spark, table)
        .select("k", "v", "valid_from", "valid_to", "is_current")
        .collect().map(_.toString).sorted.toSeq
      assert(stored() == expect)
      // replay: the same micro-batch again (checkpoint recovery) — history
      // unchanged even though b2 spans k=1's change point
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(stored() == expect)
    } finally q.stop()
  }

  test("partition-day assignment is pinned to the UTC calendar, not the session timezone") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upsert_tz").toString
    val table = s"$dir/table"
    // 2024-01-01T23:30Z — a near-midnight instant whose LOCAL date under a
    // +14 session zone is already 2024-01-02
    val nearMidnight = Timestamp.from(java.time.Instant.parse("2024-01-01T23:30:00Z"))
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      EventStreams.upsertPartitions(Seq((nearMidnight, "a1")).toDF("ts", "v"),
        table, keys = Seq("ts"), tsCol = "ts")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(table, "dt=2024-01-01")),
      "key stored under its session-local day — a TZ-drifted replay would leave a stale twin")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(table, "dt=2024-01-02")))
    // a replay under a DIFFERENT session zone maps the same key to the
    // same partition — the run-invariance the merge depends on
    EventStreams.upsertPartitions(Seq((nearMidnight, "a2")).toDF("ts", "v"),
      table, keys = Seq("ts"), tsCol = "ts")
    val out = spark.read.parquet(table).drop("dt").collect()
      .map(r => r.getTimestamp(0) -> r.getString(1)).toMap
    assert(out == Map(nearMidnight -> "a2"), s"stale twin survived: $out")
  }
}
