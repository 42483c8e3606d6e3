package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftExtensions, TestSpark}
import graft.io.Store

/** The SQL statement face of the copy-on-write ops: `DELETE FROM` /
  * `UPDATE` over cataloged path-addressed parquet tables must route
  * through the journaled Store machinery (stock Spark rejects both at
  * planning), behave exactly like the API face, keep the scoped-file
  * witness (untouched files never move), and NEVER silently widen — plans
  * outside the preconditions still fail with Spark's own error.
  */
class SqlDmlSpec extends AnyFunSuite {
  lazy val spark = { val s = TestSpark.spark; GraftExtensions.register(s); s }

  private def fileTriples(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(st => st.isFile &&
        !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime)).toSet
  }

  test("DELETE FROM routes through the scoped COW delete: stats row, " +
    "untouched files byte/mtime-identical, SQL null semantics") {
    val base = Files.createTempDirectory("graft_sqldel").toString
    val store = new Store(spark, base)
    val df = spark.range(20000).select(col("id").as("k"),
      when(col("id") % 97 === 0, lit(null).cast("long"))
        .otherwise(pmod(col("id") * 37, lit(20000))).as("v"))
    store.writeZordered(df, "tbl", Seq("k", "v"), files = 8)
    store.registerCatalog("graft_sqldel_t", "tbl")
    val before = fileTriples(s"$base/tbl")

    val q = spark.sql("DELETE FROM graft_sqldel_t WHERE k >= 18000 AND v >= 50")
    // the executed plan IS the graft command — the plan-level witness
    // (commands execute eagerly; the CommandResult wraps what ran)
    assert(q.queryExecution.commandExecuted.toString.contains("GraftCowDelete"),
      s"expected GraftCowDeleteCommand in:\n${q.queryExecution.commandExecuted}")
    // null-v rows in the range are NOT deleted (SQL: NULL predicate keeps)
    val expectGone = df.where(col("k") >= 18000 && col("v") >= 50).count()
    assert(expectGone > 0)
    assert(spark.read.parquet(s"$base/tbl").count() == 20000 - expectGone)
    // scoped-file witness: the delete was k-range-local on a k-clustered
    // layout, so SOME files were rewritten and the rest kept
    // byte/mtime-identical
    val after = fileTriples(s"$base/tbl")
    val kept = before.intersect(after)
    assert(kept.nonEmpty, "a k-range delete must keep the out-of-range files untouched")
    assert((before -- after).nonEmpty, "the match-bearing files must have been rewritten")
    // content == the API face's semantics, via the refreshed catalog too
    val want = df.where(!(col("k") >= 18000 && coalesce(col("v") >= 50, lit(false))))
      .collect().map(_.toString).sorted.toSeq
    assert(spark.table("graft_sqldel_t").collect().map(_.toString).sorted.toSeq == want)
    // and prior epochs survive the SQL-driven mutation (time travel holds)
    assert(store.readVersion("tbl", 0L).count() == 20000)
  }

  test("UPDATE SET routes through the scoped COW update; row-referencing " +
    "SET expressions work; catalog read sees the new values") {
    val base = Files.createTempDirectory("graft_squpd").toString
    val store = new Store(spark, base)
    val df = spark.range(10000).select(col("id").as("k"),
      pmod(col("id") * 13, lit(10000)).as("v"))
    store.writeZordered(df, "tbl", Seq("k", "v"), files = 8)
    store.registerCatalog("graft_squpd_t", "tbl")
    val before = fileTriples(s"$base/tbl")

    val q = spark.sql("UPDATE graft_squpd_t SET v = v + k WHERE k < 1500")
    assert(q.queryExecution.commandExecuted.toString.contains("GraftCowUpdate"),
      s"expected GraftCowUpdateCommand in:\n${q.queryExecution.commandExecuted}")
    val after = fileTriples(s"$base/tbl")
    assert(before.intersect(after).nonEmpty,
      "a k-range update must keep the out-of-range files byte/mtime-identical")
    assert((before -- after).nonEmpty, "the match-bearing files must have been rewritten")
    val want = df.select(col("k"),
      when(col("k") < 1500, col("v") + col("k")).otherwise(col("v")).as("v"))
      .collect().map(_.toString).sorted.toSeq
    assert(spark.table("graft_squpd_t").collect().map(_.toString).sorted.toSeq == want)
  }

  private def deepTriples(dir: String) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visible(n: String) = !n.startsWith(".") && !n.startsWith("_")
    def walk(p: org.apache.hadoop.fs.Path, prefix: String):
        Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (!visible(n)) Nil
        else if (st.isFile) Seq((prefix + n, st.getLen, st.getModificationTime))
        else walk(st.getPath, s"$prefix$n/")
      }
    walk(root, "").toSet
  }

  test("partitioned tables: SQL DELETE/UPDATE re-stage per partition dir; " +
    "untouched partitions byte/mtime-identical; the locate scan partition-prunes") {
    val base = Files.createTempDirectory("graft_sqlpart").toString
    val store = new Store(spark, base)
    val df = spark.range(20000).select(
      to_timestamp(concat(lit("2024-01-0"), (col("id") % 5 + 1), lit(" 10:00:00")))
        .as("datetime"),
      col("id").as("k"),
      (col("id") % 100).cast("double").as("v"))
    store.writePartitioned(df, "part_tbl")
    spark.sql("DROP TABLE IF EXISTS graft_sqlpart_t")
    spark.catalog.createTable("graft_sqlpart_t", s"$base/part_tbl", "parquet")
    spark.catalog.recoverPartitions("graft_sqlpart_t")
    val before = deepTriples(s"$base/part_tbl")
    assert(before.map(_._1).exists(_.startsWith("dt=")), "layout must be partitioned")

    // the pruning witness: the COW locate scan is a pushed-predicate read
    // of the table root — with a dt predicate it must prune to the one
    // partition directory, not list-and-filter every file
    val locate = spark.read.parquet(s"$base/part_tbl")
      .where(col("dt") === lit("2024-01-03").cast("date") && col("v") >= 50)
      .select(input_file_name())
    val scan = locate.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("dt"),
      s"dt predicate must be a partition filter:\n$scan")

    val q = spark.sql(
      "DELETE FROM graft_sqlpart_t WHERE dt = DATE'2024-01-03' AND v >= 50")
    assert(q.queryExecution.commandExecuted.toString.contains("GraftCowDelete"),
      s"expected GraftCowDeleteCommand in:\n${q.queryExecution.commandExecuted}")
    val afterDel = deepTriples(s"$base/part_tbl")
    // every file outside dt=2024-01-03 kept name/bytes/mtime; the touched
    // partition's files were replaced in place under their directory
    assert(before.filterNot(_._1.startsWith("dt=2024-01-03/")) ==
      afterDel.filterNot(_._1.startsWith("dt=2024-01-03/")),
      "untouched partitions must not move")
    assert(afterDel.filter(_._1.startsWith("dt=2024-01-03/")) !=
      before.filter(_._1.startsWith("dt=2024-01-03/")))
    val expected = df.where(!(to_date(col("datetime")) === lit("2024-01-03").cast("date")
        && col("v") >= 50)).count()
    assert(spark.read.parquet(s"$base/part_tbl").count() == expected)

    // UPDATE on another partition: SET references row columns; only that
    // partition's files move; content matches the CASE WHEN law
    val q2 = spark.sql(
      "UPDATE graft_sqlpart_t SET v = v + 1000 WHERE dt = DATE'2024-01-02' AND v < 10")
    assert(q2.queryExecution.commandExecuted.toString.contains("GraftCowUpdate"))
    val afterUpd = deepTriples(s"$base/part_tbl")
    assert(afterDel.filterNot(_._1.startsWith("dt=2024-01-02/")) ==
      afterUpd.filterNot(_._1.startsWith("dt=2024-01-02/")),
      "an update scoped to dt=2024-01-02 must leave every other partition untouched")
    val got = spark.read.parquet(s"$base/part_tbl")
      .where(col("dt") === lit("2024-01-02").cast("date"))
      .agg(sum(col("v"))).head.getDouble(0)
    val want = df.where(to_date(col("datetime")) === lit("2024-01-02").cast("date"))
      .select(when(col("v") < 10, col("v") + 1000).otherwise(col("v")).as("v"))
      .agg(sum(col("v"))).head.getDouble(0)
    assert(math.abs(got - want) < 1e-6, s"got $got want $want")

    // an UPDATE that MOVES rows to a NEW partition value: the catalog
    // tracks partitions, so the mutation must register the new directory
    // — a refresh-only path would leave the moved rows invisible to
    // `spark.table` until a manual MSCK
    val total = spark.table("graft_sqlpart_t").count()
    val q3 = spark.sql(
      "UPDATE graft_sqlpart_t SET dt = DATE'2024-02-01' WHERE dt = DATE'2024-01-04' AND v < 5")
    assert(q3.queryExecution.commandExecuted.toString.contains("GraftCowUpdate"))
    val movedRows = spark.read.parquet(s"$base/part_tbl")
      .where(col("dt") === lit("2024-02-01").cast("date")).count()
    assert(movedRows > 0, "rows must land under the new partition dir")
    assert(spark.table("graft_sqlpart_t").count() == total,
      "catalog read must see the moved rows (new partition registered)")
    assert(spark.table("graft_sqlpart_t")
      .where(col("dt") === lit("2024-02-01").cast("date")).count() == movedRows)
  }

  test("a DELETE matching every row of a partitioned table keeps it readable: " +
    "the empty stage promotes a schema-only carrier instead of zero files") {
    val base = Files.createTempDirectory("graft_sqlwipe").toString
    val store = new Store(spark, base)
    val df = spark.range(300).select(
      to_timestamp(concat(lit("2024-03-0"), (col("id") % 3 + 1), lit(" 08:00:00")))
        .as("datetime"),
      col("id").as("k"), (col("id") % 10).cast("double").as("v"))
    store.writePartitioned(df, "wipe_tbl")
    // partitionBy writes files lazily — an all-rows-deleted stage creates
    // NONE, so without the carrier guard this delete would leave a file-less
    // table whose every later read fails schema inference
    val stats = store.deleteWhere("wipe_tbl", col("k") >= 0)
    assert(stats.rowsDeleted == 300)
    val back = spark.read.parquet(s"$base/wipe_tbl")
    assert(back.count() == 0, "table must read back empty, not fail")
    // the carrier keeps the FULL read-back schema, partition column included
    assert(back.columns.sorted.toSeq == Seq("datetime", "dt", "k", "v"))
    // a PARTIAL delete that merely empties one partition needs no carrier:
    // remaining partitions carry the schema (and the layout stays partitioned)
    val base2 = Files.createTempDirectory("graft_sqlwipe2").toString
    val store2 = new Store(spark, base2)
    store2.writePartitioned(df, "part_tbl")
    store2.deleteWhere("part_tbl", to_date(col("datetime")) === lit("2024-03-02").cast("date"))
    val back2 = spark.read.parquet(s"$base2/part_tbl")
    assert(back2.count() == 200)
    assert(back2.select("dt").distinct().count() == 2)
  }

  test("a catalog partition with a custom LOCATION outside the table root " +
    "refuses the COW rewrite — Spark's own unsupported error, rows never missed") {
    val base = Files.createTempDirectory("graft_sqlext").toString
    val store = new Store(spark, base)
    val df = spark.range(600).select(
      to_timestamp(concat(lit("2024-04-0"), (col("id") % 3 + 1), lit(" 09:00:00")))
        .as("datetime"),
      col("id").as("k"), (col("id") % 10).cast("double").as("v"))
    store.writePartitioned(df, "ext_tbl")
    spark.sql("DROP TABLE IF EXISTS graft_sqlext_t")
    spark.catalog.createTable("graft_sqlext_t", s"$base/ext_tbl", "parquet")
    spark.catalog.recoverPartitions("graft_sqlext_t")
    // under-root partitions only: the rewrite admits the table
    val q = spark.sql("DELETE FROM graft_sqlext_t WHERE dt = DATE'2024-04-03' AND v < 2")
    assert(q.queryExecution.commandExecuted.toString.contains("GraftCowDelete"))
    // register a partition whose data lives OUTSIDE the table root: the
    // root-scanning COW locate could never see its rows, so a DELETE that
    // names them would silently miss — the rewrite must refuse and fall
    // through to Spark's own loud unsupported-DML error
    val elsewhere = Files.createTempDirectory("graft_sqlext_away").toString
    df.where(col("k") < 50).drop("datetime")
      .write.mode("overwrite").parquet(s"$elsewhere/away")
    spark.sql(s"ALTER TABLE graft_sqlext_t ADD PARTITION (dt=DATE'2024-05-01') " +
      s"LOCATION '$elsewhere/away'")
    val before = spark.table("graft_sqlext_t").count()
    val e = intercept[Exception] {
      spark.sql("DELETE FROM graft_sqlext_t WHERE v < 5")
    }
    assert(e.getMessage.contains("DELETE"), e.getMessage)
    assert(spark.table("graft_sqlext_t").count() == before, "refusal must not mutate")
    // and an API mutation's catalog refresh must NOT silently deregister
    // the external partition (MSCK SYNC's drop pass is root-listing-based,
    // so tables with out-of-root partitions get the add-only refresh)
    store.deleteWhere("ext_tbl",
      to_date(col("datetime")) === lit("2024-04-01").cast("date") && col("v") >= 9)
    assert(spark.table("graft_sqlext_t")
      .where(col("dt") === lit("2024-05-01").cast("date")).count() == 50,
      "external-location partition rows must survive the refresh")
  }

  test("a replace that flattens a partitioned store SYNCs stale catalog " +
    "partitions away — catalog reads survive instead of chasing missing dirs") {
    val base = Files.createTempDirectory("graft_sqlsync").toString
    val store = new Store(spark, base)
    val df = spark.range(400).select(
      to_timestamp(concat(lit("2024-06-0"), (col("id") % 4 + 1), lit(" 07:00:00")))
        .as("datetime"),
      col("id").as("k"), (col("id") % 10).cast("double").as("v"))
    store.writePartitioned(df, "sync_tbl")
    spark.sql("DROP TABLE IF EXISTS graft_sqlsync_t")
    spark.catalog.createTable("graft_sqlsync_t", s"$base/sync_tbl", "parquet")
    spark.catalog.recoverPartitions("graft_sqlsync_t")
    assert(spark.table("graft_sqlsync_t").count() == 400)
    // replace the table with a FLAT z-layout: every dt= directory is
    // rewritten away; an add-only partition refresh would leave the stale
    // catalog entries pointing at pruned dirs and break `spark.table`
    store.writeZordered(df.select(col("k"), col("v")), "sync_tbl", Seq("k", "v"),
      files = 2)
    val cat = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier("graft_sqlsync_t")
    assert(cat.listPartitions(ident).isEmpty,
      "stale partitions of the flattened layout must be dropped")
    // the catalog read no longer matches the flat layout (re-registration
    // is the documented contract after a reshape) but it must FAIL SOFT —
    // zero partitions, zero rows — never a missing-path crash
    assert(spark.table("graft_sqlsync_t").count() == 0)
    store.registerCatalog("graft_sqlsync_t", "sync_tbl")
    assert(spark.table("graft_sqlsync_t").count() == 400)
  }

  test("MERGE INTO routes through the journaled COW merge: matched rows " +
    "update, unmatched source rows insert, untouched files never move, " +
    "prior epochs stay readable; the cardinality law is loud") {
    val base = Files.createTempDirectory("graft_sqlmerge").toString
    val store = new Store(spark, base)
    val df = spark.range(10000).select(col("id").as("k"),
      pmod(col("id") * 37, lit(10000)).as("v"))
    store.writeZordered(df, "tbl", Seq("k", "v"), files = 8)
    store.registerCatalog("graft_merge_t", "tbl")
    spark.range(9000, 11000).select(col("id").as("k"), (col("id") * 10).as("v"))
      .createOrReplaceTempView("graft_merge_src")
    val before = fileTriples(s"$base/tbl")

    val q = spark.sql(
      """MERGE INTO graft_merge_t t USING graft_merge_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v + t.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, -s.v)""".stripMargin)
    assert(q.queryExecution.commandExecuted.toString.contains("GraftCowMerge"),
      s"expected GraftCowMergeCommand in:\n${q.queryExecution.commandExecuted}")
    // content law: k<9000 untouched, 9000..9999 updated (s.v + t.v),
    // 10000..10999 inserted with -s.v
    val want = df.where(col("k") < 9000)
      .unionByName(df.where(col("k") >= 9000)
        .select(col("k"), (col("k") * 10 + col("v")).as("v")))
      .unionByName(spark.range(10000, 11000)
        .select(col("id").as("k"), (-col("id") * 10).as("v")))
      .collect().map(_.toString).sorted.toSeq
    assert(spark.table("graft_merge_t").collect().map(_.toString).sorted.toSeq == want)
    // scoped: the k-range merge keeps low-k files byte/mtime-identical
    val after = fileTriples(s"$base/tbl")
    assert(before.intersect(after).nonEmpty, "out-of-range files must not move")
    assert((before -- after).nonEmpty)
    // the merge RETIRED its touched files: epoch 0 reads back in full
    assert(store.readVersion("tbl", 0L).count() == 10000)

    // gated DELETE action: WHEN MATCHED AND <cond> THEN DELETE removes
    // exactly the gated matches
    val preDel = spark.table("graft_merge_t").count()
    val delGone = spark.table("graft_merge_t")
      .where(col("k") >= 10500 && col("v") < 0).count()
    assert(delGone > 0)
    spark.sql(
      """MERGE INTO graft_merge_t t USING graft_merge_src s ON t.k = s.k
        |WHEN MATCHED AND t.k >= 10500 THEN DELETE""".stripMargin)
    assert(spark.table("graft_merge_t").count() == preDel - delGone)

    // cardinality law: two source rows hitting one target row fail loudly
    // with the table untouched
    spark.range(2).select(lit(5L).as("k"), col("id").as("v"))
      .createOrReplaceTempView("graft_merge_dup")
    val cnt = spark.table("graft_merge_t").count()
    val eDup = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_merge_t t USING graft_merge_dup s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(eDup.getMessage.contains("more than one source row"), eDup.getMessage)
    assert(spark.table("graft_merge_t").count() == cnt)

    // shapes outside the translation fall through to Spark's own error:
    // NOT MATCHED BY SOURCE is not translated
    val eBySrc = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_merge_t t USING graft_merge_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }
    assert(eBySrc.getMessage.contains("MERGE"), eBySrc.getMessage)
  }

  test("MERGE CDC apply: ordered matched clauses, FIRST match wins — " +
    "tombstones delete, the rest upsert, ghost tombstones never insert") {
    val base = Files.createTempDirectory("graft_sqlcdc").toString
    val store = new Store(spark, base)
    val df = spark.range(1000).select(col("id").as("k"),
      (col("id") % 100).as("v"))
    store.writeZordered(df, "tbl", Seq("k", "v"), files = 4)
    store.registerCatalog("graft_cdc_t", "tbl")
    // CDC feed: tombstones for k 0..99 (every one ALSO satisfies the
    // catch-all update clause — the delete must win by ORDER), updates
    // for 500..799, upsert-inserts for 1000..1099, ghost tombstones for
    // 2000..2049 (unmatched + op=D: must NOT insert)
    spark.range(0, 100).select(col("id").as("k"), lit(-1L).as("v"), lit("D").as("op"))
      .unionByName(spark.range(500, 800)
        .select(col("id").as("k"), (col("id") + 100000).as("v"), lit("U").as("op")))
      .unionByName(spark.range(1000, 1100)
        .select(col("id").as("k"), (col("id") + 100000).as("v"), lit("U").as("op")))
      .unionByName(spark.range(2000, 2050)
        .select(col("id").as("k"), lit(0L).as("v"), lit("D").as("op")))
      .createOrReplaceTempView("graft_cdc_src")
    val q = spark.sql(
      """MERGE INTO graft_cdc_t t USING graft_cdc_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED AND s.op != 'D' THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    assert(q.queryExecution.commandExecuted.toString.contains("GraftCowMerge"))
    val want = df.where(col("k") >= 100 && col("k") < 500)
      .unionByName(spark.range(500, 800).select(col("id").as("k"), (col("id") + 100000).as("v")))
      .unionByName(df.where(col("k") >= 800))
      .unionByName(spark.range(1000, 1100).select(col("id").as("k"), (col("id") + 100000).as("v")))
      .collect().map(_.toString).sorted.toSeq
    val got = spark.table("graft_cdc_t").collect().map(_.toString).sorted.toSeq
    assert(got == want)
    // first-match-wins witness: the tombstoned keys are GONE, not updated
    // to the tombstone's v=-1 by the catch-all clause
    assert(spark.table("graft_cdc_t").where(col("v") === -1L).count() == 0)
    assert(spark.table("graft_cdc_t").where(col("k") < 100).count() == 0)
    // ghost tombstones never inserted
    assert(spark.table("graft_cdc_t").where(col("k") >= 2000).count() == 0)
    // one epoch, recoverable
    assert(store.readVersion("tbl", 0L).count() == 1000)
    assert(store.listVersions("tbl") == Seq(0L, 1L))
  }

  test("MERGE INTO a managed PARTITIONED store: updates stay in their day, " +
    "inserts create and register a NEW partition, the epoch retires") {
    val base = Files.createTempDirectory("graft_sqlmergep").toString
    val store = new Store(spark, base)
    val df = spark.range(600).select(
      to_timestamp(concat(lit("2024-10-0"), (col("id") % 3 + 1), lit(" 06:00:00")))
        .as("datetime"),
      col("id").as("k"), (col("id") % 50).cast("double").as("v"))
    store.writePartitionedManaged(df, "ptbl")                      // epoch 0
    store.registerCatalog("graft_mergep_t", "ptbl")
    spark.catalog.recoverPartitions("graft_mergep_t")
    // source: updates for half of day 2, inserts landing on a NEW day
    spark.range(0, 700).select(
      when(col("id") < 600, to_timestamp(lit("2024-10-02 06:00:00")))
        .otherwise(to_timestamp(lit("2024-10-09 06:00:00"))).as("datetime"),
      col("id").as("k"), lit(777.0).as("v"))
      .where(col("id") % 2 === 1) // odd ks only
      .createOrReplaceTempView("graft_mergep_src")
    val q = spark.sql(
      """MERGE INTO graft_mergep_t t USING graft_mergep_src s ON t.k = s.k
        |WHEN MATCHED AND t.dt = DATE'2024-10-02' THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (datetime, k, v, dt)
        |  VALUES (s.datetime, s.k, s.v, CAST(s.datetime AS DATE))""".stripMargin)
    assert(q.queryExecution.commandExecuted.toString.contains("GraftCowMerge"))
    val back = spark.read.parquet(s"$base/ptbl")
    // odd ks of day 2 updated; day 1/3 untouched; odd ks 600..699 inserted
    // under the new day
    val updated = back.where(col("dt") === lit("2024-10-02").cast("date")
      && col("v") === 777.0).count()
    assert(updated == df.where(to_date(col("datetime")) === lit("2024-10-02").cast("date")
      && col("k") % 2 === 1).count())
    assert(back.where(col("dt") === lit("2024-10-09").cast("date")).count() == 50)
    assert(back.count() == 650)
    // the new partition is registered for catalog reads too
    assert(spark.table("graft_mergep_t")
      .where(col("dt") === lit("2024-10-09").cast("date")).count() == 50)
    // recoverable: epoch 0 is the pre-merge table
    assert(store.readVersion("ptbl", 0L).count() == 600)
    assert(store.readVersion("ptbl", 0L)
      .where(col("v") === 777.0).count() == 0)
  }

  test("MERGE whose matched rows fire NO clause rewrites nothing: gated-out " +
    "tombstones leave match-bearing files byte/mtime-identical; zero inserts " +
    "burn no epoch") {
    val base = Files.createTempDirectory("graft_sqlmergegate").toString
    val store = new Store(spark, base)
    store.writeZordered(
      spark.range(2000).select(col("id").as("k"), (col("id") % 100).as("v")),
      "tbl", Seq("k", "v"), files = 4)                              // epoch 0
    val dir = new org.apache.hadoop.fs.Path(s"$base/tbl")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def triples() = fs.listStatus(dir).filter(st => st.isFile &&
        !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime)).toSet
    val before = triples()
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.GraftBridge
    def s(c: String) = GraftBridge.toColumn(UnresolvedAttribute(Seq("__s", c)))
    def t(c: String) = GraftBridge.toColumn(UnresolvedAttribute(Seq("__t", c)))
    // every source row MATCHES (keys exist) but the only clause is gated
    // out for all of them — nothing may move, no epoch may burn
    val src = spark.range(100, 140).select(col("id").as("mk"), lit(-1L).as("mv"))
    val st1 = store.mergeInto("tbl", src, t("k") === s("mk"),
      matched = Seq(Store.MergeDelete(Some(s("mv") > 0))), insert = None)
    assert(st1.filesTouched == 0 && st1.rowsDeleted == 0L && st1.rowsInserted == 0L)
    assert(triples() == before, "gated-out merge must move nothing")
    assert(store.listVersions("tbl") == Seq(0L), "gated-out merge must not burn an epoch")
    // with an insert that fires, ONLY the insert layer lands: the
    // match-bearing files still never move
    val src2 = spark.range(100, 140).select(col("id").as("mk"), lit(-1L).as("mv"))
      .union(spark.range(9000, 9010).select(col("id").as("mk"), col("id").as("mv")))
    val st2 = store.mergeInto("tbl", src2, t("k") === s("mk"),
      matched = Seq(Store.MergeDelete(Some(s("mv") > 0))),
      insert = Some((Map("k" -> s("mk"), "v" -> s("mv")), None)))
    assert(st2.filesTouched == 0 && st2.rowsDeleted == 0L && st2.rowsInserted == 10L)
    assert(before.subsetOf(triples()), "insert-only merge must keep every existing file")
    assert(spark.read.parquet(dir.toString).count() == 2010)
    assert(store.listVersions("tbl") == Seq(0L, 1L))

    // the merge materializes an UNCACHED source internally but must not
    // evict a cache the CALLER created on the same frame (persist would
    // no-op; the paired unpersist would drop the caller's entry)
    val cachedSrc = spark.range(9500, 9510).select(col("id").as("mk"),
      col("id").as("mv")).cache()
    cachedSrc.count()
    assert(cachedSrc.storageLevel.useMemory)
    store.mergeInto("tbl", cachedSrc, t("k") === s("mk"),
      matched = Seq(Store.MergeUpdate(Map("v" -> s("mv")))),
      insert = Some((Map("k" -> s("mk"), "v" -> s("mv")), None)))
    assert(cachedSrc.storageLevel.useMemory,
      "merge must not unpersist a caller-cached source")
    cachedSrc.unpersist()
  }

  test("MERGE with a partition-key equality in ON prunes the insert anti-join " +
    "and the locate scan to the source's days (PartitionFilters in the plan)") {
    val base = Files.createTempDirectory("graft_sqlmergeprune").toString
    val store = new Store(spark, base)
    val df = spark.range(900).select(
      to_timestamp(concat(lit("2024-11-0"), (col("id") % 3 + 1), lit(" 06:00:00")))
        .as("datetime"),
      col("id").as("k"), (col("id") % 50).cast("double").as("v"))
    store.writePartitionedManaged(df, "ptbl")                       // epoch 0
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.GraftBridge
    def s(c: String) = GraftBridge.toColumn(UnresolvedAttribute(Seq("__s", c)))
    def t(c: String) = GraftBridge.toColumn(UnresolvedAttribute(Seq("__t", c)))
    // the ON equates the target's dt with the source's day column — the
    // daily-ingest CDC shape; day 2 rows update, one new-day row inserts
    val src = spark.range(300).select(col("id").as("mk"),
        lit("2024-11-02").cast("date").as("sdt"), lit(888.0).as("mv"))
      .where(col("mk") % 3 === 1) // day-2 keys under the %3+1 layout
      .union(spark.range(9000, 9001).select(col("id").as("mk"),
        lit("2024-11-09").cast("date").as("sdt"), lit(999.0).as("mv")))
    // capture every action's executed plan during the merge: the locate
    // and anti-join scans must carry PartitionFilters over dt (the
    // match surface is pruned to the source's days, never the table)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val stats =
      try {
        val r = store.mergeInto("ptbl", src,
          t("k") === s("mk") && t("dt") === s("sdt"),
          matched = Seq(Store.MergeUpdate(Map("v" -> s("mv")))),
          insert = Some((Map(
            "datetime" -> s("sdt").cast("timestamp"), "k" -> s("mk"),
            "v" -> s("mv"), "dt" -> s("sdt")), None)))
        // listener delivery is async: wait for the captured plans to show
        // the pruned scan (bounded poll, no private listener-bus access)
        val deadline = System.nanoTime + 15L * 1000 * 1000 * 1000
        def seen = {
          import scala.jdk.CollectionConverters._
          plans.asScala.exists(_.contains("PartitionFilters:"))
        }
        while (!seen && System.nanoTime < deadline) Thread.sleep(100)
        r
      } finally spark.listenerManager.unregister(listener)
    // semantics first: day-2 updates applied, the new-day row inserted
    val back = spark.read.parquet(s"$base/ptbl")
    assert(back.where(col("v") === 888.0).count() ==
      df.where(to_date(col("datetime")) === lit("2024-11-02").cast("date"))
        .where(col("k") % 3 === 1 && col("k") < 300).count())
    assert(back.where(col("dt") === lit("2024-11-09").cast("date")).count() == 1)
    assert(stats.rowsInserted == 1L)
    // the plan pin: some captured scan over the target carries a dt
    // PartitionFilter (the pruned match surface); and NO captured scan of
    // the target read day 1/3 files for the anti-join (file-level check:
    // day-1 files' names never appear in a scan alongside the anti-join)
    import scala.jdk.CollectionConverters._
    val pruned = plans.asScala.exists(p =>
      p.contains("PartitionFilters:") && p.contains("dt") &&
        (p.contains("isin") || p.contains("IN (") || p.contains("In(dt") ||
          p.contains("dt IN")))
    assert(pruned, s"no captured plan shows a dt PartitionFilter:\n" +
      plans.asScala.filter(_.contains("PartitionFilters")).take(3).mkString("\n---\n"))
  }

  test("preconditions hold: DML outside them still fails with Spark's own error") {
    val base = Files.createTempDirectory("graft_sqlpre").toString
    // a subquery condition cannot be re-expressed inside the command
    val store = new Store(spark, base)
    store.writeZordered(spark.range(100).select(col("id").as("k"), col("id").as("v")),
      "flat", Seq("k", "v"), files = 2)
    store.registerCatalog("graft_sqlpre_flat", "flat")
    val e2 = intercept[Exception] {
      spark.sql("DELETE FROM graft_sqlpre_flat WHERE k IN " +
        "(SELECT k FROM graft_sqlpre_flat WHERE v < 5)")
    }
    assert(e2.getMessage.contains("DELETE"), e2.getMessage)
    // and the table is intact after both refusals
    assert(spark.table("graft_sqlpre_flat").count() == 100)
  }
}
