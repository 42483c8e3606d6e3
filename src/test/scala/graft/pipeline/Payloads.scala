package graft.pipeline

import java.time.LocalDate

/** Fixture API payloads shaped exactly like the live responses the
  * reference parses (FIXTURES.md A3), with planted edge cases:
  * half-hourly carbon rows, a carbon record missing `from`, one with a null
  * intensity, non-whitelisted + two-word fuels, a non-AGILE product, and
  * price gaps that exercise the as-of nearest/tie-break paths.
  */
object Payloads {

  /** Hour stamps `2024-03-10T00:00 .. 23:00` style (open-meteo format). */
  private def hours(d: LocalDate): Seq[String] =
    (0 until 24).map(h => f"${d}T$h%02d:00")

  def weather(d: LocalDate): String = {
    val t = hours(d).map(s => s"\"$s\"").mkString(",")
    val temp = (0 until 24).map(h => (5.0 + h * 0.5).toString).mkString(",")
    val hum = (0 until 24).map(h => (60.0 + h).toString).mkString(",")
    val wind = (0 until 24).map(h => (3.0 + h * 0.1).toString).mkString(",")
    val cloud = (0 until 24).map(h => (h * 4).toString).mkString(",")
    // planted nulls in the last two solar readings
    val solar = ((0 until 22).map(h => (h * 10.0).toString) ++ Seq("null", "null")).mkString(",")
    s"""{"hourly":{"time":[$t],"temperature_2m":[$temp],"relative_humidity_2m":[$hum],
       |"wind_speed_10m":[$wind],"cloudcover":[$cloud],"shortwave_radiation":[$solar]}}""".stripMargin
  }

  def airQuality(d: LocalDate): String = {
    val t = hours(d).map(s => s"\"$s\"").mkString(",")
    def series(base: Double) = (0 until 24).map(h => (base + h).toString).mkString(",")
    s"""{"hourly":{"time":[$t],"pm10":[${series(10)}],"pm2_5":[${series(5)}],
       |"carbon_monoxide":[${series(200)}],"nitrogen_dioxide":[${series(20)}],
       |"sulphur_dioxide":[${series(2)}],"ozone":[${series(40)}],"us_aqi":[${series(30)}]}}""".stripMargin
  }

  /** Half-hourly records for date `d` (the reference's "yesterday" URL).
    * Includes one record with no `from` (skipped) and a null actual at 02:00.
    */
  def carbonYesterday(d: LocalDate): String = {
    val recs = (0 until 48).flatMap { i =>
      val h = i / 2; val m = if (i % 2 == 0) "00" else "30"
      val actual = if (h == 2 && m == "00") "null" else (100 + i).toString
      Some(f"""{"from":"${d}T$h%02d:${m}Z","to":"x","intensity":{"actual":$actual,"forecast":${90 + i},"index":"moderate"}}""")
    } :+ """{"from":null,"to":"x","intensity":{"actual":1,"forecast":1,"index":"low"}}"""
    s"""{"data":[${recs.mkString(",")}]}"""
  }

  /** A couple of records on the day AFTER `d` (the "today" URL) — all must
    * be dropped by the runDate filter.
    */
  def carbonToday(d: LocalDate): String = {
    val n = d.plusDays(1)
    s"""{"data":[{"from":"${n}T00:00Z","to":"x","intensity":{"actual":999,"forecast":999,"index":"high"}}]}"""
  }

  /** Snapshot mix incl. non-whitelisted fuels and a two-word fuel name. */
  def generationMix(d: LocalDate): String =
    s"""{"data":{"from":"${d}T10:30Z","generationmix":[
       |{"fuel":"biomass","perc":5.2},{"fuel":"coal","perc":1.0},
       |{"fuel":"imports","perc":10.1},{"fuel":"gas","perc":30.5},
       |{"fuel":"nuclear","perc":15.0},{"fuel":"hydro","perc":2.0},
       |{"fuel":"solar","perc":8.3},{"fuel":"wind","perc":25.4},
       |{"fuel":"Open Cycle","perc":0.5}]}}""".stripMargin

  def octopusProducts: String =
    """{"results":[
      |{"code":"FIX-12M-24","links":[{"href":"https://api.octopus.energy/v1/products/FIX-12M-24/","method":"GET","rel":"self"}]},
      |{"code":"AGILE-24-10-01","links":[
      |  {"href":"https://api.octopus.energy/v1/products/AGILE-24-10-01/electricity-tariffs/E-1R-AGILE-24-10-01-C/standard-unit-rates/","method":"GET","rel":"standard_unit_rates"}]},
      |{"code":"AGILE-OLD","links":[]}
      |]}""".stripMargin

  /** Half-hourly rates for `d` with planted gaps (slot = 2h + m/30):
    *  - hours 05 and 07: the :00 rate missing, both +-30 min neighbors
    *    present -> equidistant tie, the EARLIER (:30 before) must win;
    *  - hour 09: 08:30/09:00/09:30 all missing -> no match within 30 min
    *    -> null price (left-preserving);
    *  - hour 10: only 10:30 within tolerance -> unique nearest-forward.
    * Price value encodes its slot: pence = 10 + slot*0.5 -> pounds = pence/100.
    */
  def octopusRates(d: LocalDate): String = {
    val slots = (0 until 48).filterNot { i =>
      val h = i / 2; val m = i % 2
      (h == 5 && m == 0) || (h == 7 && m == 0) || (h == 8 && m == 1) ||
        (h == 9) || (h == 10 && m == 0)
    }
    val recs = slots.map { i =>
      val h = i / 2; val m = if (i % 2 == 0) "00" else "30"
      f"""{"valid_from":"${d}T$h%02d:${m}:00Z","valid_to":"x","value_exc_vat":1.0,"value_inc_vat":${10 + i * 0.5}}"""
    }
    s"""{"results":[${recs.mkString(",")}]}"""
  }

  /** Full fixture map for a FixtureApiClient run on `d`. */
  def all(d: LocalDate): Map[String, String] = Map(
    "archive-api.open-meteo.com" -> weather(d),
    "air-quality-api.open-meteo.com" -> airQuality(d),
    s"intensity/date/$d" -> carbonYesterday(d),
    s"intensity/date/${d.plusDays(1)}" -> carbonToday(d),
    "carbonintensity.org.uk/generation" -> generationMix(d),
    "octopus.energy/v1/products/AGILE" -> octopusRates(d),
    "octopus.energy/v1/products/" -> octopusProducts)
}
