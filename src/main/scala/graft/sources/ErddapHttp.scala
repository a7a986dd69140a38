package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Live ERDDAP/REST HTTP layer — the reference's network half. The
  * reference fetches every catalog/search/dataset response over HTTP
  * with `pd.read_csv(url)` and returns an EMPTY frame when the server
  * answers an error (/root/reference/gdutils/__init__.py:403-417 catalog
  * fetch, 483-507 search fetch); ERDDAP itself answers 404 for a
  * constraint that matches nothing, so "404 = empty result" is protocol
  * semantics, not failure. This layer reproduces that contract and adds
  * the hardening a 1000-executor deployment needs and serial pandas
  * didn't: bounded retries with exponential backoff on transient
  * failures (connect errors, 429, 5xx), separate connect/request
  * timeouts, and loud typed errors for non-transient statuses.
  *
  * Scale shape: catalog/search paging is driver-side (catalog rows are
  * thousands, not billions); DATA fetches are executor-side — each
  * `ErddapTableProvider` input partition is one tabledap request URL, so
  * a 1000-dataset read fans out as 1000 independent HTTP fetches across
  * the cluster with per-partition retry, and pushed filters/limits
  * shrink each response server-side via the URL constraint grammar
  * (io.ErddapUrl). Offline here by necessity (zero egress): every path
  * is exercised against an in-process HTTP server in ErddapHttpSpec.
  */
object ErddapHttp {

  /** All knobs serializable — the config rides into executor-side
    * partition readers. */
  final case class HttpConfig(connectTimeoutMs: Int = 10000,
                              requestTimeoutMs: Int = 60000,
                              retries: Int = 3,
                              backoffMs: Long = 500,
                              emptyOn404: Boolean = true)

  final class ErddapHttpException(val url: String, val status: Int,
                                  cause: Throwable = null)
      extends RuntimeException(
        s"ERDDAP request failed with HTTP $status: $url", cause)

  private def transient(status: Int): Boolean =
    status == 429 || (status >= 500 && status <= 599)

  /** GET `url`, retrying transient failures (connect/IO errors, 429,
    * 5xx) up to `cfg.retries` times with exponential backoff. Returns
    * None for 404 when `cfg.emptyOn404` (the reference's empty-frame
    * contract); throws ErddapHttpException otherwise. */
  def fetchBytes(url: String, cfg: HttpConfig = HttpConfig()): Option[Array[Byte]] = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(cfg.connectTimeoutMs.toLong))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(cfg.requestTimeoutMs.toLong))
      .GET().build()
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= cfg.retries) {
      if (attempt > 0) Thread.sleep(cfg.backoffMs << (attempt - 1))
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
        resp.statusCode() match {
          case ok if ok >= 200 && ok < 300 => return Some(resp.body())
          case 404 if cfg.emptyOn404 => return None
          case s if transient(s) =>
            lastErr = new ErddapHttpException(url, s)
          case s => throw new ErddapHttpException(url, s)
        }
      } catch {
        case e: java.io.IOException => lastErr = e
        case e: InterruptedException => throw e
      }
      attempt += 1
    }
    throw new ErddapHttpException(url, -1, lastErr)
  }

  /** GET `url` as decoded text lines; 404 → Nil under the reference's
    * empty contract. */
  def fetchLines(url: String, cfg: HttpConfig = HttpConfig()): Seq[String] =
    fetchBytes(url, cfg) match {
      case None => Nil
      case Some(b) =>
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
          .linesIterator.toSeq
    }

  /** Advanced-search catalog fetch with ERDDAP paging: requests
    * `page=1,2,…` of `itemsPerPage` rows until a short (or 404 = empty)
    * page, concatenates the data rows under the first header, and
    * returns the catalog with reference-normalized column names. The
    * paging loop is DRIVER-side — a catalog is small — but parsing goes
    * through the executor-distributed CSV reader so the result composes
    * with `ErddapCsv.cleanCatalog` / `operators.Catalog` like any other
    * catalog frame. A search matching nothing yields an EMPTY frame
    * (reference parity), never an error. */
  def pagedSearch(spark: SparkSession, server: String,
                  params: Map[String, String], itemsPerPage: Long = 1000000L,
                  cfg: HttpConfig = HttpConfig(),
                  maxPages: Int = 100000): DataFrame = {
    require(itemsPerPage > 0, s"itemsPerPage must be positive: $itemsPerPage")
    val pages = Iterator.from(1)
      .map { p =>
        // loud cap, not silent truncation: a server that keeps answering
        // full pages (or ignores `page`) must not spin the driver forever
        if (p > maxPages)
          throw new IllegalStateException(
            s"paged search exceeded $maxPages pages of $itemsPerPage — " +
              s"server ignoring paging? ($server)")
        fetchLines(graft.io.ErddapUrl.advancedSearch(server,
          params + ("page" -> p.toString), itemsPerPage), cfg)
      }
      .map(ls => (ls.headOption, ls.drop(1)))
      .takeWhile(_._2.nonEmpty)
    var header: Option[String] = None
    val data = Seq.newBuilder[String]
    var last = Int.MaxValue
    while (last >= itemsPerPage && pages.hasNext) {
      val (h, rows) = pages.next()
      if (header.isEmpty) header = h
      data ++= rows
      last = rows.size
    }
    header match {
      case None => spark.emptyDataFrame
      case Some(h) =>
        import spark.implicits._
        val raw = spark.read.option("header", "true")
          .csv((h +: data.result()).toDS())
        raw.toDF(raw.columns.map(ErddapCsv.normalizeName).toIndexedSeq: _*)
    }
  }
}
