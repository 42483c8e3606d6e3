package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.sources.ApiClient

/** Operational monitoring (`raw_data_collection/raw_data.py:360-426`):
  * HEAD-probe the five endpoints, compute success rate + mean latency, and
  * read-modify-write `monitoring/metrics.json` (tolerating a corrupt or
  * missing file). Pure driver-side control plane — five probes never
  * warrant a distributed job (SURVEY §2.4 A5).
  */
object Monitoring {

  val endpoints: Map[String, String] = Map(
    "weather" -> "https://archive-api.open-meteo.com/v1/archive",
    "air_quality" -> "https://air-quality-api.open-meteo.com/v1/air-quality",
    "carbon_intensity" -> "https://api.carbonintensity.org.uk/intensity/date",
    "generation_mix" -> "https://api.carbonintensity.org.uk/generation",
    "octopus_prices" -> "https://api.octopus.energy/v1/products/")

  case class Metrics(totalApis: Int, lastRun: String,
                     apiSuccessRate: Double, avgApiResponseTime: Option[Double])

  /** Probe all endpoints (`raw_data.py:379-394`): rate rounded to 2, mean
    * latency over SUCCESSFUL probes rounded to 3, None when all fail.
    */
  def probe(client: ApiClient, nowIso: String): Metrics = {
    val latencies = endpoints.values.toSeq.flatMap(u => client.head(u))
    val n = endpoints.size
    val rate = math.round(latencies.size.toDouble / n * 100).toDouble / 100
    val avg =
      if (latencies.isEmpty) None
      else Some(math.round(latencies.sum / latencies.size * 1000).toDouble / 1000)
    Metrics(n, nowIso, rate, avg)
  }

  /** Merge-write metrics.json (`raw_data.py:396-426`): preserve unknown keys
    * from an existing valid file; a corrupt file starts fresh.
    */
  def writeMetrics(path: String, m: Metrics): Unit = {
    val existing: Map[String, String] =
      if (Files.exists(Paths.get(path)))
        try parseFlatJson(Files.readString(Paths.get(path)))
        catch { case _: Exception => Map.empty } // corrupt -> start fresh (raw_data.py:405-407)
      else Map.empty
    val updated = existing ++ Map(
      "total_apis" -> m.totalApis.toString,
      "last_run" -> s"\"${m.lastRun}\"",
      "api_success_rate" -> m.apiSuccessRate.toString,
      "avg_api_response_time" -> m.avgApiResponseTime.map(_.toString).getOrElse("null"))
    val json = updated.toSeq.sortBy(_._1)
      .map { case (k, v) => s"  \"$k\": $v" }.mkString("{\n", ",\n", "\n}")
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(path), json,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Minimal flat-JSON object parser (string/number/null values) — enough
    * for metrics.json without a JSON dependency. Throws on malformed OR
    * NESTED input (caller treats that as corruption and starts fresh):
    * silently skipping a nested section would hoist its inner keys to top
    * level and the merge-write would then rewrite the file flattened,
    * destroying foreign structure the preserve-unknown-keys contract
    * promises to keep.
    */
  private[graft] def parseFlatJson(s: String): Map[String, String] = {
    val t = s.trim
    require(t.startsWith("{") && t.endsWith("}"), "not a JSON object")
    val body = t.substring(1, t.length - 1).trim
    if (body.isEmpty) return Map.empty
    // number: full JSON grammar incl. negative exponents — the old
    // [0-9.eE+]+ class stopped at the '-' of 1.5e-3 and truncated the
    // value, which a later merge-write would persist as invalid JSON
    val entry = ("\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*" +
      "(\"(?:[^\"\\\\]|\\\\.)*\"|-?[0-9]+(?:\\.[0-9]+)?(?:[eE][-+]?[0-9]+)?|null|true|false)").r
    // Nested-input rejection, AFTER matching: a nested section's braces /
    // brackets survive entry removal (its inner "k": v pairs match and
    // vanish, the enclosing "outer": { } skeleton doesn't), so structural
    // characters in the RESIDUE mean genuinely nested JSON — which must
    // fail loudly (silently hoisting inner keys would rewrite the file
    // flattened on merge-write). Checking the raw body instead (as r9
    // did) wrongly rejected flat objects whose STRING values contain a
    // brace or bracket character (ADVICE r9 #4) — those are consumed by
    // the entry match and never reach the residue.
    val residue = entry.replaceAllIn(body, "")
    require(residue.forall(c => c == ',' || c.isWhitespace),
      "nested or malformed JSON — this parser is flat-only")
    val found = entry.findAllMatchIn(body).map(m => m.group(1) -> m.group(2)).toMap
    require(found.nonEmpty, "no entries parsed")
    found
  }
}
