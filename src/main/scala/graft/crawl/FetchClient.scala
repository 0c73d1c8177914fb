package graft.crawl

import graft.model.{Doc, DiscoveredLink, FetchedPage, Span}

/** The production fetch seam (SURVEY §7.1(6)) — the one module a real
  * deployment swaps, mirroring the reference where every scraper routes
  * through a single network layer (toolbox.py:29-117 request envelope).
  *
  * Implementations must be Serializable and executor-pure: one instance is
  * captured in the crawl loop's `mapPartitions` closure and invoked
  * concurrently from many tasks; any heavyweight member (connection pool,
  * HTTP client) belongs in a `@transient lazy val` so each executor builds
  * its own after deserialization.
  */
trait FetchClient extends Serializable {

  /** One raw attempt, no retry. `attempt` is 1-based — deterministic test
    * doubles key retry behavior off it. */
  def fetchAttempt(url: String, attempt: Int): FetchedPage

  /** Retry bound of the envelope (reference default 3). */
  def maxAttempts: Int

  /** Pre-attempt pacing hook, called before EVERY attempt (1-based) — the
    * position of the reference's `time.sleep(delay_before_request +
    * (attempt-1)*10)` (toolbox.py:72-76). Default no-op: in the synthetic /
    * simulated-time path the politeness layer owns all pacing (SURVEY §4),
    * so sleeping here would double-count. [[HttpFetchClient]] overrides
    * this with the reference's linear-backoff schedule.
    */
  def beforeAttempt(url: String, attempt: Int): Unit = ()

  /** The reference's retry envelope (toolbox.py:29-117): retry any non-200
    * (404 to the bound, 202 "accepted but not ready" until ready) up to
    * [[maxAttempts]] tries, then give up — the caller records the give-up
    * as a null row. `attempts` on the result counts tries actually made.
    */
  final def fetch(url: String): FetchedPage = {
    var attempt = 1
    beforeAttempt(url, attempt)
    var page = fetchAttempt(url, attempt)
    while (page.status != 200 && attempt < maxAttempts) {
      attempt += 1
      beforeAttempt(url, attempt)
      page = fetchAttempt(url, attempt)
    }
    page.copy(attempts = attempt)
  }
}

/** The deterministic in-memory repository fleet — what every test, parity
  * check and bench crawls (no egress in the sandbox, and determinism is
  * what makes crawl-order/seen-set equality assertable at all).
  */
final case class SyntheticFetchClient(repo: RepoConfig) extends FetchClient {
  override def fetchAttempt(url: String, attempt: Int): FetchedPage =
    SyntheticRepo.fetchAttempt(repo, url, attempt)
  override def maxAttempts: Int = repo.maxAttempts
}

/** Skeletal real-network client over the JDK's `java.net.http.HttpClient`:
  * GET with timeout + UA + size cap, 5xx/429/202 retryable, IO errors
  * retryable as status 0, 2xx bodies wrapped as a one-span text Doc with
  * href-extracted outlinks. Unused by the sandbox crawl (zero egress) but
  * compiled + unit-tested against a loopback server so the seam is real:
  * a deployment swaps `CrawlConfig.client` and touches nothing else.
  * Production would replace [[parseBody]] with per-repository JSON→span
  * mapping (the synthetic twin of which is SyntheticRepo's span builders).
  */
final case class HttpFetchClient(
    maxAttempts: Int = 3,
    connectTimeoutMs: Int = 10000,
    requestTimeoutMs: Int = 30000,
    maxBodyBytes: Int = 8 << 20,
    userAgent: String = "graft-crawl/0.4 (research; contact in repo)",
    delayBeforeRequestMs: Long = 1000L,
    retryStepMs: Long = 10000L,
    sleeper: Long => Unit = HttpFetchClient.wallClockSleeper)
    extends FetchClient {

  /** The reference's pre-attempt pacing (toolbox.py:72-76): attempt 1 waits
    * `delay_before_request`, attempt 2 waits `delay + 10 s`, attempt 3
    * `delay + 20 s`, … — a 5xx-ing server is backed off from, not
    * hammered. */
  def backoffMs(attempt: Int): Long =
    delayBeforeRequestMs + (attempt - 1).toLong * retryStepMs

  override def beforeAttempt(url: String, attempt: Int): Unit =
    sleeper(backoffMs(attempt))

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs.toLong))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

  private val HrefRe =
    """(?i)href\s*=\s*["']([^"'<>\s]+)["']""".r

  /** Body → interleaved-span Doc + outlinks. Media links (by extension)
    * become media spans with a `media_ref`; everything else is one text
    * span. */
  private[crawl] def parseBody(url: String, body: String): FetchedPage = {
    val links = HrefRe.findAllMatchIn(body).map(_.group(1)).zipWithIndex
      .map { case (u, i) =>
        val abs = try java.net.URI.create(url).resolve(u).toString
                  catch { case _: Throwable => u }
        DiscoveredLink(abs, kind = "href", ordinal = i, score = 0.0)
      }.toSeq
    val host = try java.net.URI.create(url).getHost
               catch { case _: Throwable => null }
    FetchedPage(url, if (host == null) "" else host, 0, 200,
      Doc(url, Seq(Span("text", body, null, 0))), links)
  }

  override def fetchAttempt(url: String, attempt: Int): FetchedPage = {
    val empty = Doc(url, Seq.empty)
    val host = try {
      val h = java.net.URI.create(url).getHost
      if (h == null) "" else h
    } catch { case _: Throwable => "" }
    try {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs.toLong))
        .header("User-Agent", userAgent)
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      val status = resp.statusCode()
      if (status >= 200 && status < 300 && status != 202) {
        val bytes = resp.body()
        val capped = if (bytes.length > maxBodyBytes)
          java.util.Arrays.copyOf(bytes, maxBodyBytes) else bytes
        parseBody(url,
          new String(capped, java.nio.charset.StandardCharsets.UTF_8))
      } else FetchedPage(url, host, 0, status, empty, Seq.empty)
    } catch {
      // transport failure = retryable status 0 (the envelope retries it;
      // give-up surfaces as a null row, same as the reference's except-arm)
      case _: java.io.IOException =>
        FetchedPage(url, host, 0, 0, empty, Seq.empty)
      // task cancellation is NOT retryable: restore the flag and propagate
      // so Spark can kill the task instead of the envelope spinning on it
      case ie: InterruptedException =>
        Thread.currentThread().interrupt()
        throw ie
    }
  }
}

object HttpFetchClient {
  /** Real wall-clock pacing. Interruption restores the flag and
    * propagates (Spark task kill isn't swallowed even by a broad
    * catch-and-continue caller polling isInterrupted). */
  val wallClockSleeper: Long => Unit = ms =>
    if (ms > 0) {
      try Thread.sleep(ms)
      catch {
        case ie: InterruptedException =>
          Thread.currentThread().interrupt()
          throw ie
      }
    }

  /** No-pacing sleeper for tests / callers that own pacing elsewhere. */
  val noPacing: Long => Unit = _ => ()
}
