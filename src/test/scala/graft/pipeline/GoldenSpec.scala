package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Store
import graft.jobs.{CollectJob, FeatureEngineeringJob}
import graft.sources.FixtureApiClient

/** Full-frame golden test (SURVEY.md §5): EP1+EP2 over the fixture payloads
  * must reproduce the committed 55-column golden bit-for-bit — every value
  * of every row, not just the spot-checked cells in PipelineSpec. Catches
  * any semantic drift in the derivation chain across refactors.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("EP1+EP2 reproduce the committed engineered golden exactly") {
    val runDate = java.time.LocalDate.parse("2024-03-10")
    val storeDir = Files.createTempDirectory("graft_golden").toString
    val store = new Store(spark, storeDir)
    CollectJob.run(spark, new FixtureApiClient(Payloads.all(runDate)), runDate, store)
    val got = FeatureEngineeringJob.run(spark, store)

    // regen mode: GOLDEN_REGEN=1 sbt "testOnly graft.pipeline.GoldenSpec"
    // rewrites the committed golden from the current pipeline output
    if (sys.env.get("GOLDEN_REGEN").contains("1")) {
      val part = Files.list(java.nio.file.Paths.get(
          s"$storeDir/${FeatureEngineeringJob.engineeredFile}"))
        .filter(_.getFileName.toString.endsWith(".csv")).findFirst().get()
      Files.copy(part, java.nio.file.Paths.get(
        "src/test/resources/golden_engineered_2024-03-10.csv"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    val goldenPath = getClass.getResource("/golden_engineered_2024-03-10.csv").getPath
    val golden = spark.read.schema(Schemas.engineered)
      .option("header", "true").csv(goldenPath)

    assert(got.columns.toSeq == golden.columns.toSeq)
    val gotRows = got.orderBy("datetime").collect()
    val goldenRows = golden.orderBy("datetime").collect()
    assert(gotRows.length == goldenRows.length)
    gotRows.zip(goldenRows).foreach { case (a, b) =>
      (0 until a.length).foreach { i =>
        assert(a.get(i) == b.get(i),
          s"row ${a.get(0)}, column ${got.columns(i)}: got ${a.get(i)}, golden ${b.get(i)}")
      }
    }
  }
}
