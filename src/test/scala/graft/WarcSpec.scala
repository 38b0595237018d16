package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

/** WARC ingestion laws over hand-built ISO 28500 fixtures: plain and
  * per-record-gzip-member files (the Common Crawl layout), HTTP
  * envelope extraction, charset-aware text decode, the HTML text
  * approximation, damaged-tail tolerance, and the Spark row surface.
  */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // ---- fixture builders -----------------------------------------------------

  private def record(warcType: String, uri: String, block: Array[Byte],
                     contentType: String = "application/http;msgtype=response",
                     id: String = "<urn:uuid:0000>"): Array[Byte] = {
    val hdr = ("WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: $id\r\n" +
      "WARC-Date: 2026-08-16T00:00:00Z\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${block.length}\r\n" +
      "\r\n").getBytes("ISO-8859-1")
    hdr ++ block ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def httpResponse(body: Array[Byte], status: Int = 200,
                           contentType: String = "text/html; charset=utf-8"): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes("ISO-8859-1") ++ body

  private def gzMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private val html =
    """<html><head><style>body { color: red }</style>
      |<script>var x = "<evil>";</script></head>
      |<body><h1>Hello &amp; welcome</h1><!-- hidden -->
      |<p>caf&#233; &#x2603; day</p></body></html>""".stripMargin

  private def sampleWarc: Array[Byte] =
    record("warcinfo", "", "software: test\r\n".getBytes, "application/warc-fields") ++
      record("request", "https://example.com/",
        "GET / HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes,
        "application/http;msgtype=request") ++
      record("response", "https://example.com/",
        httpResponse(html.getBytes("UTF-8"))) ++
      record("response", "https://example.com/img.png",
        httpResponse(Array.fill(64)(7.toByte), contentType = "image/png")) ++
      record("response", "https://example.com/latin",
        httpResponse("café".getBytes("ISO-8859-1"),
          contentType = "text/plain; charset=iso-8859-1"))

  // ---- parse laws --------------------------------------------------------------

  test("plain WARC: every record parses with headers, HTTP envelope, and body") {
    val recs = Warc.parseAll(sampleWarc)
    assert(recs.map(_.warcType) == Seq("warcinfo", "request", "response", "response", "response"))
    val resp = recs(2)
    assert(resp.targetUri == "https://example.com/")
    assert(resp.httpStatus == 200)
    assert(resp.httpContentType.startsWith("text/html"))
    assert(new String(resp.body, "UTF-8") == html)
    assert(recs(3).body.length == 64) // binary payload intact
    assert(recs(0).httpStatus == -1) // non-http block: no envelope
    assert(recs(0).contentLength == "software: test\r\n".length)
  }

  test("warc.gz: concatenated per-record gzip members parse identically") {
    val members = Seq(
      record("warcinfo", "", "software: test\r\n".getBytes, "application/warc-fields"),
      record("response", "https://example.com/",
        httpResponse(html.getBytes("UTF-8"))))
    val gz = members.map(gzMember).reduce(_ ++ _)
    val recs = Warc.parseAll(gz)
    assert(recs.map(_.warcType) == Seq("warcinfo", "response"))
    assert(new String(recs(1).body, "UTF-8") == html)
  }

  test("damaged tails keep the good prefix; garbage and null yield Nil; fuzz never throws") {
    val good = sampleWarc
    // cut inside the last record's block
    val cut = good.take(good.length - 30)
    val recs = Warc.parseAll(cut)
    assert(recs.length == 4, "truncated final record must be dropped, prefix kept")
    assert(Warc.parseAll("HTTP/1.1 200 OK\r\n\r\n".getBytes).isEmpty)
    assert(Warc.parseAll(null).isEmpty)
    assert(Warc.parseAll(Array.emptyByteArray).isEmpty)
    val rnd = new scala.util.Random(53)
    for (_ <- 0 until 200) {
      val m = good.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      Warc.parseAll(m) // any prefix outcome; no escaped exception
    }
    for (sz <- Seq(0, 5, 100)) Warc.parseAll(Array.fill(sz)(rnd.nextInt(256).toByte))
  }

  test("bodyText honors the declared charset; htmlToText strips script/style/tags/entities") {
    assert(Warc.bodyText("café".getBytes("ISO-8859-1"),
      "text/plain; charset=iso-8859-1") == "café")
    // a bogus charset falls back to UTF-8 with replacement, never throws
    Warc.bodyText(Array[Byte](-1, -2, -3), "text/plain; charset=not-a-charset")
    val text = Warc.htmlToText(html)
    assert(text == "Hello & welcome café ☃ day",
      s"got: '$text'")
    assert(!text.contains("evil") && !text.contains("color"))
    assert(Warc.htmlToText(null) == "")
  }

  // ---- Spark surface --------------------------------------------------------------

  test("records()/responses(): per-file flatMap rows, text extraction, binary kept as bytes") {
    import spark.implicits._
    val files = Seq(
      ("f1.warc", sampleWarc),
      ("f2.warc.gz", gzMember(record("response", "https://b.example/",
        httpResponse("plain body".getBytes, contentType = "text/plain")))),
      ("junk.bin", "not a warc".getBytes))
      .toDF("path", "content")
    val recs = Warc.records(spark, files)
    assert(recs.count() == 6) // 5 from f1 + 1 from f2; junk contributes 0
    val resp = Warc.responses(spark, files).orderBy("target_uri").collect()
    assert(resp.length == 4)
    val byUri = resp.map(r => r.getAs[String]("target_uri") -> r).toMap
    assert(byUri("https://example.com/").getAs[String]("text") ==
      "Hello & welcome café ☃ day")
    assert(byUri("https://example.com/img.png").getAs[String]("text") == "")
    assert(byUri("https://example.com/img.png").getAs[Long]("n_bytes") == 64L)
    assert(byUri("https://example.com/latin").getAs[String]("text") == "café")
    assert(byUri("https://b.example/").getAs[String]("text") == "plain body")
    assert(resp.forall(_.getAs[Int]("http_status") == 200))
    // the no-shuffle claim: a narrow plan (no Exchange before the rows)
    val plan = Warc.responses(spark, files).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"responses() must stay shuffle-free:\n$plan")
  }

  test("curation integration: WARC responses flow into langid/quality/token filters unchanged") {
    import spark.implicits._
    import graft.functions.TextAnalysisFns
    // an English page, a Spanish page, and a binary asset in one archive
    val en = "<html><body>" +
      "<p>The quick brown fox jumps over the lazy dog and runs far away into the woods.</p>" +
      "<p>It was the best of times and it was the worst of times for the model corpus.</p>" +
      "</body></html>"
    val es = "<html><body>" +
      "<p>El rápido zorro marrón salta sobre el perro perezoso y corre hacia el bosque.</p>" +
      "<p>Era el mejor de los tiempos y era el peor de los tiempos para el corpus.</p>" +
      "</body></html>"
    val warc =
      record("response", "https://en.example/a", httpResponse(en.getBytes("UTF-8"))) ++
        record("response", "https://es.example/b", httpResponse(es.getBytes("UTF-8"))) ++
        record("response", "https://cdn.example/img",
          httpResponse(Array.fill(128)(9.toByte), contentType = "image/png"))
    val files = Seq(("crawl-0.warc", warc)).toDF("path", "content")
    val curated = Warc.responses(spark, files)
      .where(org.apache.spark.sql.functions.length($"text") > 0)
      .withColumn("lang", TextAnalysisFns.langId($"text"))
      .withColumn("quality", TextAnalysisFns.qualityScore($"text"))
      .withColumn("n_words", TextAnalysisFns.wordCount($"text"))
      .orderBy("target_uri")
      .collect()
    assert(curated.length == 2, "binary asset must drop out of the text leg")
    assert(curated(0).getAs[String]("lang") == "en")
    assert(curated(1).getAs[String]("lang") == "es")
    assert(curated.forall(_.getAs[Int]("n_words") > 20))
    assert(curated.forall(r => !r.getAs[String]("text").contains("<")))
  }
}
