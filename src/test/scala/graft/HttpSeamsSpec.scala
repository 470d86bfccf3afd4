package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import graft.alerts.{Alerts, WebhookSender}
import graft.sources.PriceSource

/** The two deployment HTTP seams driven over REAL loopback HTTP (this
  * build has no egress, so localhost is the strongest possible proof):
  * the webhook sender posts actual JSON through the JDK HttpClient and
  * honors status codes; the live CSV feed GETs a wide quote file and
  * lands byte-identical rows to the fixture path. */
class HttpSeamsSpec extends SparkSuite {

  private case class Recorded(method: String, path: String,
                              contentType: String, body: String)

  private def withServer[T](routes: Map[String, Int])
                           (f: (Int, () => Seq[Recorded]) => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Recorded]
    routes.foreach { case (path, status) =>
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          seen.synchronized {
            seen += Recorded(ex.getRequestMethod, path,
              String.valueOf(ex.getRequestHeaders.getFirst("Content-type")),
              body)
          }
          val resp = "ok".getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(status, resp.length)
          ex.getResponseBody.write(resp)
          ex.close()
        }
      })
    }
    server.start()
    try f(server.getAddress.getPort, () => seen.synchronized(seen.toSeq))
    finally server.stop(0)
  }

  private val ctx = Alerts.RunContext(pipelineId = "graft_daily",
    taskId = "enrich", executionDate = "2024-01-02", runId = "r1",
    tryNumber = 1, error = Some("boom"))

  test("WebhookSender.Http posts real JSON and honors status codes") {
    withServer(Map("/hook" -> 200, "/fail" -> 500)) { (port, seen) =>
      val sender = new WebhookSender.Http(timeoutSeconds = 5)
      val ok = sender.post(s"http://127.0.0.1:$port/hook",
        Alerts.slackFailure(ctx))
      val bad = sender.post(s"http://127.0.0.1:$port/fail",
        Alerts.slackFailure(ctx))
      assert(ok && !bad)
      val hits = seen()
      assert(hits.count(_.path == "/hook") == 1)
      val hit = hits.find(_.path == "/hook").get
      assert(hit.method == "POST")
      assert(hit.contentType.startsWith("application/json"))
      assert(hit.body.contains("graft_daily") && hit.body.contains("boom"))
    }
  }

  test("notifyFailure fans out through the live sender and reports " +
    "only the channels that accepted") {
    withServer(Map("/slack" -> 200, "/teams" -> 500)) { (port, seen) =>
      val cfg = Alerts.Config(
        slackUrl = Some(s"http://127.0.0.1:$port/slack"),
        pagerdutyRoutingKey = None,
        teamsUrl = Some(s"http://127.0.0.1:$port/teams"))
      val delivered = Alerts.notifyFailure(
        new WebhookSender.Http(timeoutSeconds = 5), cfg, ctx)
      assert(delivered == Seq("slack"))
      assert(seen().map(_.path).toSet == Set("/slack", "/teams"))
    }
  }

  test("HttpWideCsv GETs a live feed and equals the fixture parse; " +
    "non-2xx raises") {
    val csv =
      """date,AAA_open,AAA_high,AAA_low,AAA_close,AAA_volume
        |2024-01-02,10.0,12.0,9.5,11.0,100
        |2024-01-03,11.0,11.5,10.0,10.5,80
        |""".stripMargin
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed.csv", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val b = csv.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      }
    })
    server.createContext("/missing.csv", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(404, -1); ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val live = PriceSource.HttpWideCsv(
        s"http://127.0.0.1:$port/feed.csv", Seq("AAA"), 5)
        .fetch(spark).orderBy("date").collect().toSeq
      val tmp = java.nio.file.Files.createTempFile("feed", ".csv")
      java.nio.file.Files.writeString(tmp, csv)
      val fixture = PriceSource.WideCsv(tmp.toString, Seq("AAA"))
        .fetch(spark).orderBy("date").collect().toSeq
      assert(live == fixture && live.size == 2)
      intercept[java.io.IOException] {
        PriceSource.HttpWideCsv(
          s"http://127.0.0.1:$port/missing.csv", Seq("AAA"), 5)
          .fetch(spark).collect()
      }
    } finally server.stop(0)
  }
}
