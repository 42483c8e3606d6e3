package graft.sources

/** Driver-side HTTP boundary for the five REST feeds
  * (`raw_data_collection/raw_data.py:22-206`). Swappable so the zero-egress
  * test environment runs entirely off JSON fixtures while production uses
  * the JDK HTTP client. Only payload STRINGS cross this trait — all parsing
  * happens in the Spark plan (`from_json`), executor-side.
  */
trait ApiClient {

  /** GET a JSON payload. Throws on failure (callers that tolerate partial
    * failure catch per-URL, like `raw_data.py:93-100`).
    */
  def get(url: String): String

  /** HEAD probe: Some(latency seconds) on success, None on failure
    * (`raw_data.py:379-388`, 5 s timeout).
    */
  def head(url: String, timeoutMs: Int = 5000): Option[Double]
}

/** Fixture-backed client: URL substring -> canned payload. */
class FixtureApiClient(fixtures: Map[String, String],
                       probeLatency: Double = 0.01,
                       failingUrls: Set[String] = Set.empty) extends ApiClient {

  override def get(url: String): String = {
    if (failingUrls.exists(url.contains)) sys.error(s"fixture failure for $url")
    // longest (most specific) matching key wins, so overlapping URL
    // prefixes (products list vs a product's rates) resolve predictably
    fixtures.filter { case (k, _) => url.contains(k) }
      .toSeq.sortBy(-_._1.length).headOption.map(_._2)
      .getOrElse(sys.error(s"no fixture for $url"))
  }

  override def head(url: String, timeoutMs: Int): Option[Double] =
    if (failingUrls.exists(url.contains)) None else Some(probeLatency)
}

/** JDK-based client for real deployments (not used in the zero-egress test
  * environment).
  */
class HttpApiClient extends ApiClient {
  private lazy val client = java.net.http.HttpClient.newHttpClient()

  override def get(url: String): String = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }

  override def head(url: String, timeoutMs: Int): Option[Double] =
    try {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .method("HEAD", java.net.http.HttpRequest.BodyPublishers.noBody())
        .timeout(java.time.Duration.ofMillis(timeoutMs)).build()
      val t0 = System.nanoTime()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
      // < 400, not == 2xx: the reference's requests.head does not follow
      // redirects and raise_for_status() only raises on 4xx/5xx, so a 3xx
      // answer counts as a SUCCESS there (raw_data.py:379-394) — matching
      // that keeps api_success_rate parity when an endpoint grows a redirect
      if (resp.statusCode() < 400) Some((System.nanoTime() - t0) / 1e9) else None
    } catch { case _: Exception => None }
}
