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

  test("preconditions hold: DML outside them still fails with Spark's own error") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sqlpre").toString
    // a dt=-partitioned table must NOT be intercepted (the COW rewrite
    // would lose the partition-directory values)
    Seq((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
        (java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 2.0))
      .toDF("datetime", "v").withColumn("dt", to_date(col("datetime")))
      .write.partitionBy("dt").parquet(s"$base/part_tbl")
    spark.sql("DROP TABLE IF EXISTS graft_sqlpre_part")
    spark.catalog.createTable("graft_sqlpre_part", s"$base/part_tbl", "parquet")
    spark.catalog.recoverPartitions("graft_sqlpre_part")
    val e1 = intercept[Exception] {
      spark.sql("DELETE FROM graft_sqlpre_part WHERE v = 1.0")
    }
    assert(e1.getMessage.contains("does not support DELETE"), e1.getMessage)
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
