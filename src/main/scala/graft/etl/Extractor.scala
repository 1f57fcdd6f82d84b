package graft.etl

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

import scala.util.matching.Regex

/** Log-archive ingest utility (reference E1–E5, extractor.py).
  *
  * Scraping is deliberately *not* a query-engine concern (SURVEY.md
  * §3.2): this is a thin driver-side utility whose contract ends at "a
  * directory tree of XML files" — exactly where Pipeline picks up. The
  * transport is pluggable (`fetch: String => Array[Byte]`) so tests run
  * against local fixtures and production supplies an HTTP client; the
  * parsing/filtering logic is what the reference implements:
  *
  *  - archive-list parsing: strip the JS `list([...])` wrapper and split
  *    entries (extractor.py:16-26);
  *  - date-prefix partition pruning on the 8-digit archive stem
  *    (extractor.py:33-40);
  *  - gzip decompress (extractor.py:47);
  *  - per-line `<a href="...">` record extraction via named regex
  *    (extractor.py:52-57);
  *  - write `<outDir>/<date>/<log_id>.xml` (extractor.py:58-67).
  */
object Extractor {

  /** One archive entry from the listing: file name + display size. */
  final case class ArchiveRef(file: String, size: Long)

  private val ListWrapper: Regex = "(?s)list\\(\\[(.*)\\]\\);?".r
  private val EntryPattern: Regex =
    "\\{file:\"([^\"]+)\",size:(\\d+)\\}".r
  private val HrefPattern: Regex =
    "<a href=\"log/\\?([A-Za-z0-9-]+)\"".r
  private val DateStem: Regex = "(\\d{8})".r

  /** Parse the `list([{file:"...",size:N},...]);` JS payload. */
  def parseArchiveList(js: String): Seq[ArchiveRef] =
    ListWrapper.findFirstMatchIn(js).toSeq.flatMap { m =>
      EntryPattern.findAllMatchIn(m.group(1)).map { e =>
        ArchiveRef(e.group(1), e.group(2).toLong)
      }.toSeq
    }

  /** Keep archives whose 8-digit stem starts with the date prefix —
    * source-level partition pruning (reference E4).
    */
  def filterByDate(refs: Seq[ArchiveRef], datePrefix: Option[String]): Seq[ArchiveRef] =
    datePrefix match {
      case None => refs
      case Some(p) =>
        refs.filter(r => DateStem.findFirstIn(r.file).exists(_.startsWith(p)))
    }

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** Extract log ids from an archive's index lines (reference E3). */
  def extractLogIds(indexText: String): Seq[String] =
    HrefPattern.findAllMatchIn(indexText).map(_.group(1)).toSeq

  /** Live HTTP transport (reference extractor.py:16,43,64 `requests.get`
    * with a browser User-Agent): a JDK HttpClient closed over the two
    * base URLs the reference hardcodes — archives resolve against
    * `datBase` (reference DOWNLOAD_PREFIX) and `log/?<id>` paths against
    * `logBase`. Returned function plugs straight into [[ingest]]'s
    * `fetch` parameter; unit-tested end-to-end against a loopback HTTP
    * server (ExtractorSpec).
    */
  def httpTransport(datBase: String, logBase: String,
                    userAgent: String = "Mozilla/5.0 (graft-etl)")
      : String => Array[Byte] = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    (path: String) => {
      val url =
        if (path.startsWith("http")) path
        else if (path.startsWith("log/?")) logBase + path
        else datBase + path
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("User-Agent", userAgent)
        .timeout(java.time.Duration.ofSeconds(60))
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      require(resp.statusCode() / 100 == 2,
              s"HTTP ${resp.statusCode()} for $url")
      resp.body()
    }
  }

  /** Fetch the archive listing itself (reference list.cgi GET) through
    * the same transport semantics.
    */
  def fetchList(listUrl: String, fetch: String => Array[Byte]): String =
    new String(fetch(listUrl), StandardCharsets.UTF_8)

  /** Full ingest: list → prune → fetch+gunzip each archive → extract log
    * ids → fetch each log → `<outDir>/<yyyymmdd>/<id>.xml`.
    * Returns the written file paths.
    */
  def ingest(listPayload: String,
             fetch: String => Array[Byte],
             outDir: String,
             datePrefix: Option[String] = None): Seq[String] = {
    val archives = filterByDate(parseArchiveList(listPayload), datePrefix)
    archives.flatMap { ref =>
      val date = DateStem.findFirstIn(ref.file).getOrElse("00000000")
      val raw = fetch(ref.file)
      val text = new String(
        if (ref.file.endsWith(".gz")) gunzip(raw) else raw,
        StandardCharsets.UTF_8)
      extractLogIds(text).map { id =>
        val dir = Paths.get(outDir, date)
        Files.createDirectories(dir)
        val path = dir.resolve(s"$id.xml")
        Files.write(path, fetch(s"log/?$id"))
        path.toString
      }
    }
  }
}
