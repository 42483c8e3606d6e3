package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `SparkSessionExtensions` injection path of [[GraftExtensions]] —
  * the class a cluster user names in `spark.sql.extensions` to activate
  * the SQL functions and the band-join optimizer rule without touching
  * code. (`spark.sql.extensions` itself is a static conf read from the
  * SparkContext at session build, so with the suite's shared context this
  * exercises the identical injection via `builder.withExtensions`; the
  * conf-to-class instantiation above it is Spark's own code.) The
  * imperative `GraftExtensions.register` twin is covered by
  * BandJoinRewriteSpec and the function specs.
  */
class ExtensionsConfigSpec extends AnyFunSuite {
  test("class-injected extensions expose SQL functions and the band rewrite") {
    val base = TestSpark.spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      // the injected SQL functions resolve and compute
      val r = s.sql(
        "SELECT sorted_intersect_size(array(1L,2L,3L), array(2L,3L,4L)) AS a, " +
          "float_dot_product(array(cast(1.0 AS float), cast(2.0 AS float)), " +
          "array(cast(3.0 AS float), cast(4.0 AS float))) AS b").head()
      assert(r.get(0).toString == "2")
      assert(math.abs(r.getDouble(1) - 11.0) < 1e-9)
      // the optimizer rule is active in pure SQL: the naive band predicate
      // plans as a hash join, not a nested loop
      import s.implicits._
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x").createOrReplaceTempView("l_band")
      Seq((3L, 10.4), (4L, 99.0)).toDF("id", "y").createOrReplaceTempView("r_band")
      val q = s.sql(
        "SELECT l_band.id AS lid, r_band.id AS rid FROM l_band " +
          "JOIN r_band ON abs(x - y) <= 1.0")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(q.collect().map(row => (row.getLong(0), row.getLong(1))).toSet ==
        Set((1L, 3L)))
      s.catalog.dropTempView("l_band")
      s.catalog.dropTempView("r_band")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
