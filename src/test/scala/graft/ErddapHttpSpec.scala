package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ErddapHttp
import graft.sources.ErddapHttp.HttpConfig

/** Exercises the live-HTTP layer against an in-process server (zero
  * egress here, so the network half is tested end-to-end on loopback):
  * executor-side URL partitions in the DSv2 connector, retry/backoff on
  * transient failures, the reference's 404→empty contract, and
  * driver-side catalog paging. */
class ErddapHttpSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterAll {

  private val obsCsv =
    """time,latitude,longitude,Profile ID
      |UTC,degrees_north,degrees_east,1
      |2021-06-01T03:12:00Z,39.102,-73.514,1
      |2021-06-01T07:44:00Z,39.141,-73.488,2
      |2021-06-02T01:02:00Z,none,None,3
      |""".stripMargin
  private val obs2Csv =
    """time,latitude,longitude,Profile ID
      |UTC,degrees_north,degrees_east,1
      |2021-07-01T00:00:00Z,10.5,20.5,1
      |""".stripMargin

  // 21 catalog rows for the paging test (itemsPerPage=8 → pages of 8/8/5)
  private val catalogHeader = "Dataset ID,Institution"
  private val catalogRows =
    (1 to 21).map(i => f"ru$i%02d-20210601T0000,rutgers")

  private val flakyHits = new AtomicInteger(0)
  private val searchHits = new AtomicInteger(0)

  private var server: HttpServer = _
  private var base: String = _

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length.toLong)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/erddap/tabledap/ru29_obs.csv",
      (ex: HttpExchange) => respond(ex, 200, obsCsv))
    server.createContext("/erddap/tabledap/sp10_obs.csv",
      (ex: HttpExchange) => respond(ex, 200, obs2Csv))
    // first two requests fail with 503, then success — retry coverage
    server.createContext("/erddap/tabledap/flaky_obs.csv",
      (ex: HttpExchange) =>
        if (flakyHits.incrementAndGet() <= 2) respond(ex, 503, "busy")
        else respond(ex, 200, obs2Csv))
    // ERDDAP answers 404 when constraints match no rows
    server.createContext("/erddap/tabledap/nomatch_obs.csv",
      (ex: HttpExchange) => respond(ex, 404, "no rows"))
    // an endpoint that never recovers — retry-exhaustion coverage
    server.createContext("/erddap/tabledap/down_obs.csv",
      (ex: HttpExchange) => respond(ex, 503, "down"))
    // a "misbehaving" endpoint that streams a body far past any sane
    // response size (chunked, so no Content-Length to pre-check) — the
    // per-partition byte cap must fail loudly mid-stream, not buffer it
    server.createContext("/erddap/tabledap/huge_obs.csv",
      (ex: HttpExchange) => {
        ex.sendResponseHeaders(200, 0) // chunked
        val out = ex.getResponseBody
        val row = "2021-06-01T03:12:00Z,39.102,-73.514,1\n".getBytes("UTF-8")
        try {
          out.write("time,latitude,longitude,Profile ID\nUTC,d,d,1\n".getBytes("UTF-8"))
          (1 to 20000).foreach(_ => out.write(row)) // ~780 KB
        } catch { case _: java.io.IOException => () } // client hung up at cap
        ex.close()
      })
    // a slow-loris endpoint: headers arrive instantly, then the body
    // trickles one byte per 50 ms forever — the ofInputStream response
    // "completes" at the headers, so only the body-read deadline bounds
    // this. The write loop exits when the client hangs up.
    server.createContext("/erddap/tabledap/trickle_obs.csv",
      (ex: HttpExchange) => {
        ex.sendResponseHeaders(200, 0)
        val out = ex.getResponseBody
        try { while (true) { out.write('x'); out.flush(); Thread.sleep(50) } }
        catch { case _: java.io.IOException => () }
        ex.close()
      })
    // a fully-stalled endpoint: headers, then NO bytes at all — a plain
    // InputStream.read blocks forever here; only the watchdog close can
    // unblock it. Bounded server-side sleep so the dispatcher thread
    // frees itself shortly after the client has long since failed.
    server.createContext("/erddap/tabledap/stall_obs.csv",
      (ex: HttpExchange) => {
        ex.sendResponseHeaders(200, 0)
        Thread.sleep(1500)
        ex.close()
      })
    // a server that ignores `page` and always answers a full page — the
    // pagedSearch maxPages cap must fail loudly instead of spinning
    server.createContext("/loop/search/advanced.csv",
      (ex: HttpExchange) => respond(ex, 200,
        (catalogHeader +: catalogRows.take(8)).mkString("\n")))
    server.createContext("/erddap/search/advanced.csv",
      (ex: HttpExchange) => {
        searchHits.incrementAndGet()
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        val params = q.split("&").filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
        val page = params.getOrElse("page", "1").toInt
        val per = params.getOrElse("itemsPerPage", "1000000").toInt
        val slice =
          if (params.get("searchFor").contains("none")) Nil
          else catalogRows.slice((page - 1) * per, page * per)
        if (slice.isEmpty) respond(ex, 404, "past the end")
        else respond(ex, 200, (catalogHeader +: slice).mkString("\n"))
      })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}/erddap"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private val schema = StructType(Seq(
    StructField("time", TimestampType), StructField("latitude", DoubleType),
    StructField("longitude", DoubleType), StructField("profile_id", LongType)))

  private def readUrls(urls: String) =
    spark.read.format("graft.sources.v2.ErddapTableProvider")
      .schema(schema).option("path", urls).option("httpBackoffMs", "1").load()

  test("DSv2 over URL partitions: one request per partition, units row skipped") {
    val df = readUrls(s"$base/tabledap/ru29_obs.csv $base/tabledap/sp10_obs.csv")
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 4)
    assert(df.where(col("latitude").isNull).count() == 1)
  }

  test("pushed filter and limit still evaluate inside the URL reader") {
    val df = readUrls(s"$base/tabledap/ru29_obs.csv")
      .where(col("latitude") > 39.1).limit(1)
    assert(df.count() == 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(latitude"), s"filter not pushed:\n$plan")
  }

  test("transient 5xx is retried with backoff until success") {
    flakyHits.set(0)
    val df = readUrls(s"$base/tabledap/flaky_obs.csv")
    assert(df.count() == 1)
    assert(flakyHits.get() == 3, s"expected 2 failures + 1 success, saw ${flakyHits.get()}")
  }

  test("retries exhaust loudly on a persistent 5xx") {
    val e = intercept[ErddapHttp.ErddapHttpException] {
      ErddapHttp.fetchBytes(s"$base/tabledap/down_obs.csv",
        HttpConfig(retries = 2, backoffMs = 1))
    }
    assert(e.getCause.isInstanceOf[ErddapHttp.ErddapHttpException])
    assert(e.getCause.getMessage.contains("503"))
  }

  test("404 means empty result (reference parity), or loud when disabled") {
    val df = readUrls(s"$base/tabledap/nomatch_obs.csv $base/tabledap/sp10_obs.csv")
    assert(df.count() == 1) // 404 partition contributes zero rows silently
    val strict = spark.read.format("graft.sources.v2.ErddapTableProvider")
      .schema(schema).option("path", s"$base/tabledap/nomatch_obs.csv")
      .option("emptyOn404", "false").load()
    val err = intercept[Exception](strict.count())
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(err).exists(t => t.getMessage != null && t.getMessage.contains("404")),
      s"no 404 in error chain: $err")
  }

  test("pagedSearch output composes with the S2 search operator") {
    val cat = ErddapHttp.pagedSearch(spark, base,
      Map("searchFor" -> "ru"), itemsPerPage = 8, HttpConfig(backoffMs = 1))
    // normalized column names make the fetched catalog a drop-in input
    // for the offline operator surface
    val hit = graft.operators.Catalog.search(cat, searchFor = Some("ru07"))
    assert(hit.count() == 1)
    assert(hit.head().getAs[String]("dataset_id") == "ru07-20210601T0000")
  }

  test("schema inference skips a 404 first url and streams only the header") {
    // first URL 404s (constraints matched nothing): the schema must come
    // from the next URL, not collapse the whole read to zero columns
    val df = spark.read.format("graft.sources.v2.ErddapTableProvider")
      .option("path", s"$base/tabledap/nomatch_obs.csv $base/tabledap/sp10_obs.csv")
      .option("httpBackoffMs", "1").load()
    assert(df.columns.toSeq ==
      Seq("time", "latitude", "longitude", "profile_id"))
    assert(df.count() == 1) // sp10's units row skipped, 1 data row; 404 url empty
    // all sources 404 = genuinely empty result: reference empty-frame parity
    val empty = spark.read.format("graft.sources.v2.ErddapTableProvider")
      .option("path", s"$base/tabledap/nomatch_obs.csv")
      .option("httpBackoffMs", "1").load()
    assert(empty.schema.isEmpty)
    // fetchFirstLine returns just the header line of a multi-line body
    assert(ErddapHttp.fetchFirstLine(s"$base/tabledap/ru29_obs.csv",
      HttpConfig(backoffMs = 1)).contains("time,latitude,longitude,Profile ID"))
    assert(ErddapHttp.fetchFirstLine(s"$base/tabledap/nomatch_obs.csv",
      HttpConfig(backoffMs = 1)).isEmpty)
  }

  test("a response past maxResponseBytes fails loudly, direct and via DSv2") {
    // direct fetch: the cap names the knob and fires before buffering it all
    val e = intercept[ErddapHttp.ErddapResponseTooLarge] {
      ErddapHttp.fetchBytes(s"$base/tabledap/huge_obs.csv",
        HttpConfig(backoffMs = 1, maxResponseBytes = 64 * 1024))
    }
    assert(e.cap == 64 * 1024)
    assert(e.getMessage.contains("httpMaxResponseBytes"))
    // an executor-side URL partition honors the DSv2 option; the error
    // surfaces through the task instead of OOMing the executor
    val strict = spark.read.format("graft.sources.v2.ErddapTableProvider")
      .schema(schema).option("path", s"$base/tabledap/huge_obs.csv")
      .option("httpBackoffMs", "1")
      .option("httpMaxResponseBytes", (64 * 1024).toString).load()
    val err = intercept[Exception](strict.count())
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(err).exists(_.isInstanceOf[ErddapHttp.ErddapResponseTooLarge]),
      s"no ErddapResponseTooLarge in chain: $err")
    // under the default (256 MiB) cap the same endpoint reads fine
    assert(readUrls(s"$base/tabledap/huge_obs.csv").count() == 20000L)
  }

  test("requestTimeoutMs bounds the BODY download: trickle and full stall") {
    // headers arrive instantly in both cases, so only the body-read
    // deadline (copy-loop check + watchdog close) can bound these
    val cfg = HttpConfig(requestTimeoutMs = 300, retries = 0, backoffMs = 1)
    for (ep <- Seq("trickle_obs.csv", "stall_obs.csv")) {
      val t0 = System.nanoTime()
      val e = intercept[ErddapHttp.ErddapHttpException] {
        ErddapHttp.fetchBytes(s"$base/tabledap/$ep", cfg)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // stalled-body failures surface as IOException → retried like the
      // old ofByteArray timeout path → ErddapHttpException after retries
      assert(e.getCause.isInstanceOf[java.io.IOException], s"$ep: ${e.getCause}")
      assert(sec < 5.0, s"$ep took ${sec}s — deadline did not bound the body read")
    }
  }

  test("pagedSearch fails loudly past maxPages when a server ignores paging") {
    val loopBase = s"http://127.0.0.1:${server.getAddress.getPort}/loop"
    val e = intercept[IllegalStateException] {
      ErddapHttp.pagedSearch(spark, loopBase, Map("searchFor" -> "ru"),
        itemsPerPage = 8, HttpConfig(backoffMs = 1), maxPages = 5)
    }
    assert(e.getMessage.contains("5 pages"))
  }

  test("pagedSearch concatenates pages until the short page; 404 search is empty") {
    searchHits.set(0)
    val cat = ErddapHttp.pagedSearch(spark, base,
      Map("searchFor" -> "ru"), itemsPerPage = 8, HttpConfig(backoffMs = 1))
    assert(cat.columns.toSeq == Seq("dataset_id", "institution"))
    assert(cat.count() == 21)
    assert(searchHits.get() == 3, s"expected 3 pages, saw ${searchHits.get()}")
    // a search past the data: first page 404s → empty frame, no error
    val empty = ErddapHttp.pagedSearch(spark, base,
      Map("searchFor" -> "none", "page" -> "99"), itemsPerPage = 8,
      HttpConfig(backoffMs = 1))
    assert(empty.isEmpty)
  }
}
