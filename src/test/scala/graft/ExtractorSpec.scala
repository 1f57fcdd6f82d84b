package graft

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Extractor

/** Ingest utility (reference E1-E5): list parsing, date pruning, gzip,
  * record extraction, file layout — against an in-memory fetcher.
  */
class ExtractorSpec extends AnyFunSuite {

  private def gzip(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(s.getBytes("UTF-8")); gz.close()
    bos.toByteArray
  }

  private val listing =
    """list([{file:"scc20240101.log.gz",size:123},
      |{file:"scc20240102.log.gz",size:456},
      |{file:"scc20240215.log.gz",size:789}]);""".stripMargin

  test("archive list parsing strips the JS wrapper") {
    val refs = Extractor.parseArchiveList(listing)
    assert(refs.map(_.file) == Seq("scc20240101.log.gz",
      "scc20240102.log.gz", "scc20240215.log.gz"))
    assert(refs.map(_.size) == Seq(123L, 456L, 789L))
  }

  test("date-prefix pruning") {
    val refs = Extractor.parseArchiveList(listing)
    assert(Extractor.filterByDate(refs, Some("202401")).size == 2)
    assert(Extractor.filterByDate(refs, Some("20240215")).size == 1)
    assert(Extractor.filterByDate(refs, None).size == 3)
  }

  test("gzip round trip") {
    assert(new String(Extractor.gunzip(gzip("hello <xml/>")), "UTF-8") ==
      "hello <xml/>")
  }

  test("log-id extraction from index lines") {
    val idx = """<a href="log/?2024010100gm-x1">a</a>
                |<a href="log/?2024010101gm-x2">b</a>
                |<a href="other/?nope">c</a>""".stripMargin
    assert(Extractor.extractLogIds(idx) ==
      Seq("2024010100gm-x1", "2024010101gm-x2"))
  }

  test("end-to-end ingest writes date-partitioned xml files") {
    val out = Files.createTempDirectory("graft_ingest_").toString
    val idx1 = """<a href="log/?2024010100gm-a">x</a>"""
    val idx2 = """<a href="log/?2024010200gm-b">y</a>
                 |<a href="log/?2024010201gm-c">y</a>""".stripMargin
    val fetch: String => Array[Byte] = {
      case "scc20240101.log.gz" => gzip(idx1)
      case "scc20240102.log.gz" => gzip(idx2)
      case s if s.startsWith("log/?") =>
        s"<mjloggm ver='2.3'><!-- ${s.drop(5)} --></mjloggm>".getBytes("UTF-8")
      case other => fail(s"unexpected fetch: $other")
    }
    // the 20240215 archive is pruned before any fetch happens
    val written = Extractor.ingest(listing, fetch, out,
                                   datePrefix = Some("202401"))
    assert(written.size == 3)
    assert(Files.exists(java.nio.file.Paths.get(out, "20240101",
      "2024010100gm-a.xml")))
    assert(Files.exists(java.nio.file.Paths.get(out, "20240102",
      "2024010201gm-c.xml")))
  }

  test("live HTTP transport ingests from a loopback server") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seenUA = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def reply(ex: HttpExchange, body: Array[Byte]): Unit = {
      seenUA.add(ex.getRequestHeaders.getFirst("User-Agent"))
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    }
    val idx = """<a href="log/?2024010100gm-h">x</a>"""
    server.createContext("/list.cgi", new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        reply(ex, """list([{file:"scc20240101.log.gz",size:1}]);""".getBytes)
    })
    server.createContext("/dat/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = reply(ex, gzip(idx))
    })
    server.createContext("/0/log/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val id = ex.getRequestURI.getQuery
        reply(ex, s"<mjloggm ver='2.3'><!-- $id --></mjloggm>".getBytes)
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetch = Extractor.httpTransport(
        datBase = s"$base/dat/", logBase = s"$base/0/", userAgent = "graft-ua")
      val listing = Extractor.fetchList(s"$base/list.cgi", fetch)
      val out = Files.createTempDirectory("graft_http_").toString
      val written = Extractor.ingest(listing, fetch, out)
      assert(written.size == 1)
      val f = java.nio.file.Paths.get(out, "20240101", "2024010100gm-h.xml")
      assert(Files.exists(f))
      assert(Files.readString(f).contains("2024010100gm-h"))
      assert(seenUA.toArray.forall(_ == "graft-ua"))
    } finally server.stop(0)
  }
}
