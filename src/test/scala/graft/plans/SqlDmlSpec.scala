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
