package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.Monitoring
import graft.io.Store
import graft.sources.{ApiClient, FixtureApiClient, HttpApiClient}

/** spark-submit-able entry for the full daily pipeline (EP1 -> EP2 -> EP3's
  * monitoring epilogue — SURVEY.md §3).
  *
  * Usage: RunPipeline <storeDir> <runDate yyyy-MM-dd> [--fixtures <dir>]
  *
  * With `--fixtures`, API payloads come from JSON files named
  * `weather.json air_quality.json carbon_yesterday.json carbon_today.json
  * generation_mix.json octopus_products.json octopus_rates.json` in <dir>
  * (the zero-egress mode); otherwise the JDK HTTP client hits the live
  * endpoints. Scheduling (the reference's GitHub Actions cron) stays
  * out-of-engine; the FE job deliberately runs regardless of collection
  * problems, mirroring the reference's tolerate-upstream-failure trigger
  * (`data_engineering.yml:4-8`).
  */
object RunPipeline {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunPipeline <storeDir> <runDate> [--fixtures <dir>]")
    val storeDir = args(0)
    val runDate = LocalDate.parse(args(1))
    val client: ApiClient = args.toSeq match {
      case Seq(_, _, "--fixtures", dir) => fixtureClient(dir, runDate)
      case Seq(_, _) => new HttpApiClient
      // anything else is a malformed invocation — failing loudly beats
      // silently falling through to live HTTP (which a typo like
      // "--fixture" would otherwise do, hanging in a zero-egress sandbox)
      case other => throw new IllegalArgumentException(
        s"unrecognized arguments: ${other.drop(2).mkString(" ")} — usage: RunPipeline <storeDir> <runDate> [--fixtures <dir>]")
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = new Store(spark, storeDir)
    try {
      val raw = CollectJob.run(spark, client, runDate, store)
      println(s"[pipeline] raw store rows: ${raw.count()}")
    } catch {
      case e: Exception => System.err.println(s"[pipeline] collection failed: ${e.getMessage}")
    }
    // FE runs off whatever raw CSV exists, even after a failed collection
    val fe = FeatureEngineeringJob.run(spark, store)
    println(s"[pipeline] engineered rows: ${fe.count()}, cols: ${fe.columns.length}")

    val metrics = Monitoring.probe(client, java.time.Instant.now().toString)
    Monitoring.writeMetrics(s"$storeDir/monitoring/metrics.json", metrics)
    println(s"[pipeline] api_success_rate=${metrics.apiSuccessRate}")
    spark.stop()
  }

  private def fixtureClient(dir: String, runDate: LocalDate): ApiClient = {
    def read(name: String) =
      java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/$name.json"))
    new FixtureApiClient(Map(
      "archive-api.open-meteo.com" -> read("weather"),
      "air-quality-api.open-meteo.com" -> read("air_quality"),
      s"intensity/date/$runDate" -> read("carbon_yesterday"),
      s"intensity/date/${runDate.plusDays(1)}" -> read("carbon_today"),
      "carbonintensity.org.uk/generation" -> read("generation_mix"),
      "octopus.energy/v1/products/AGILE" -> read("octopus_rates"),
      "octopus.energy/v1/products/" -> read("octopus_products")))
  }
}
