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

  // ---- streaming path -------------------------------------------------------------

  test("parseStream parity: plain and gzip streams yield the byte-identical record walk") {
    for (payload <- Seq(sampleWarc, gzMember(sampleWarc))) {
      val streamed = Warc.parseStream(
        new java.io.ByteArrayInputStream(payload)).toSeq
      val inMem = Warc.parseAll(payload)
      assert(streamed.length == inMem.length)
      streamed.zip(inMem).foreach { case (a, b) =>
        assert(a.warcType == b.warcType && a.targetUri == b.targetUri &&
          a.httpStatus == b.httpStatus &&
          java.util.Arrays.equals(a.body, b.body))
      }
    }
    // damage contract parity: truncated tail keeps the prefix, junk is empty
    assert(Warc.parseStream(new java.io.ByteArrayInputStream(
      sampleWarc.take(sampleWarc.length - 30))).length == 4)
    assert(Warc.parseStream(new java.io.ByteArrayInputStream(
      "not a warc".getBytes)).isEmpty)
    assert(Warc.parseStream(new java.io.ByteArrayInputStream(
      Array.emptyByteArray)).isEmpty)
    // mutation fuzz: like parseAll's, no escaped exception on any bit flip
    val rnd = new scala.util.Random(71)
    for (_ <- 0 until 200) {
      val m = sampleWarc.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      Warc.parseStream(new java.io.ByteArrayInputStream(m)).foreach(_ => ())
      val gz = gzMember(m)
      Warc.parseStream(new java.io.ByteArrayInputStream(gz)).foreach(_ => ())
    }
  }

  test(">2 GiB archive: the streaming walk ingests it with bounded heap where byte[] parse degrades") {
    // ~2.3 GiB UNCOMPRESSED as a multi-member .warc.gz a few MB on disk:
    // 2400 response records with ~1 MiB repetitive bodies. Build the
    // compressed stream incrementally — the uncompressed whole never
    // exists in memory anywhere in this test.
    val bodyUnit = new Array[Byte](1 << 20)
    java.util.Arrays.fill(bodyUnit, 'a'.toByte)
    val nRecs = 2400
    val bos = new java.io.ByteArrayOutputStream(8 << 20)
    var i = 0
    while (i < nRecs) {
      bos.write(gzMember(record("response", s"https://big.example/$i",
        httpResponse(bodyUnit, contentType = "application/octet-stream"))))
      i += 1
    }
    val gz = bos.toByteArray
    assert(gz.length < (64 << 20), "fixture must stay small on disk")
    // byte[] path: over the 2 GiB inflate cap → degrades to Nil, no throw
    assert(Warc.parseAll(gz).isEmpty)
    // streaming path: every record walks through, one block in heap at a
    // time (total uncompressed ≈ 2.3 GiB ≫ any sane test heap)
    var seen = 0
    var bytes = 0L
    val it = Warc.parseStream(new java.io.ByteArrayInputStream(gz))
    while (it.hasNext) {
      val r = it.next()
      assert(r.warcType == "response" && r.body.length == (1 << 20))
      seen += 1
      bytes += r.contentLength
    }
    assert(seen == nRecs)
    assert(bytes > (2L << 30), s"walked $bytes uncompressed body bytes")
  }

  test("recordsFromPaths: per-path streaming rows match records(), bad paths degrade to zero rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc-paths")
    val f1 = dir.resolve("a.warc")
    val f2 = dir.resolve("b.warc.gz")
    java.nio.file.Files.write(f1, sampleWarc)
    java.nio.file.Files.write(f2, gzMember(record("response", "https://b.example/",
      httpResponse("plain body".getBytes, contentType = "text/plain"))))
    val paths = Seq(f1.toString, f2.toString, dir.resolve("missing.warc").toString)
      .toDF("path")
    val rows = Warc.recordsFromPaths(spark, paths)
    assert(rows.count() == 6) // 5 + 1; missing path contributes 0
    val viaContent = Warc.records(spark,
      Seq(("a.warc", sampleWarc)).toDF("path", "content"))
      .select("target_uri", "warc_type").collect().map(_.toSeq).toSet
    val viaPath = rows.where($"path".contains("a.warc"))
      .select("target_uri", "warc_type").collect().map(_.toSeq).toSet
    assert(viaPath == viaContent)
    // the curation tail binds to the path surface identically
    val respText = Warc.responsesFromPaths(spark, paths)
      .select("target_uri", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(respText("https://b.example/") == "plain body")
    assert(respText("https://example.com/latin") == "café")
    val plan = rows.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"path walk must stay shuffle-free:\n$plan")
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

  // ---- HTTP transfer/content codings ----------------------------------------------

  private def httpResponseWith(body: Array[Byte], headers: Seq[String],
                               contentType: String = "text/plain; charset=utf-8"): Array[Byte] =
    ("HTTP/1.1 200 OK\r\n" +
      s"Content-Type: $contentType\r\n" +
      headers.map(_ + "\r\n").mkString +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes("ISO-8859-1") ++ body

  private def chunkEncode(b: Array[Byte], at: Int): Array[Byte] =
    b.grouped(at).map(p =>
      (p.length.toHexString + "\r\n").getBytes("ISO-8859-1") ++ p ++
        "\r\n".getBytes("ISO-8859-1")).reduce(_ ++ _) ++
      "0\r\n\r\n".getBytes("ISO-8859-1")

  private def zlibDeflate(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(bos)
    d.write(b); d.close()
    bos.toByteArray
  }

  test("content/transfer codings: chunked dechunked, gzip/deflate inflated, layering honored") {
    val payload = "the decoded payload survives all codings intact".getBytes("UTF-8")
    val warc =
      record("response", "https://x.example/gz",
        httpResponseWith(gzMember(payload), Seq("Content-Encoding: gzip"))) ++
      record("response", "https://x.example/defl",
        httpResponseWith(zlibDeflate(payload), Seq("Content-Encoding: deflate"))) ++
      record("response", "https://x.example/chunk",
        httpResponseWith(chunkEncode(payload, 7), Seq("Transfer-Encoding: chunked"))) ++
      record("response", "https://x.example/both",
        httpResponseWith(chunkEncode(gzMember(payload), 11),
          Seq("Transfer-Encoding: chunked", "Content-Encoding: gzip")))
    val recs = Warc.parseAll(warc)
    assert(recs.length == 4)
    recs.foreach { r =>
      assert(new String(r.body, "UTF-8") == new String(payload, "UTF-8"),
        s"${r.targetUri}: body not decoded")
      assert(r.httpContentEncoding == "" && r.httpTransferEncoding == "",
        s"${r.targetUri}: codings not cleared")
    }
    import spark.implicits._
    val resp = Warc.responses(spark,
      Seq(("c.warc", warc)).toDF("path", "content")).collect()
    assert(resp.length == 4 &&
      resp.forall(_.getAs[String]("text") == new String(payload, "UTF-8")))
  }

  test("undecodable codings stay marked and degrade to binary, never mojibake") {
    val payload = "readable once, never twice".getBytes("UTF-8")
    val warc =
      record("response", "https://x.example/br",
        httpResponseWith(Array[Byte](27, 99, 0, -128), Seq("Content-Encoding: br"))) ++
      record("response", "https://x.example/badchunk",
        httpResponseWith("ZZZ\r\nnot chunked at all".getBytes("ISO-8859-1"),
          Seq("Transfer-Encoding: chunked"))) ++
      record("response", "https://x.example/badgz",
        httpResponseWith("not gzip".getBytes("ISO-8859-1"),
          Seq("Content-Encoding: gzip"))) ++
      record("response", "https://x.example/ok", httpResponseWith(payload, Nil))
    val recs = Warc.parseAll(warc)
    assert(recs.length == 4)
    assert(recs(0).httpContentEncoding == "br")
    assert(recs(1).httpTransferEncoding.toLowerCase.contains("chunked"))
    assert(recs(2).httpContentEncoding == "gzip") // corrupt member: kept raw
    import spark.implicits._
    val byUri = Warc.responses(spark,
      Seq(("u.warc", warc)).toDF("path", "content")).collect()
      .map(r => r.getAs[String]("target_uri") -> r.getAs[String]("text")).toMap
    assert(byUri("https://x.example/br") == "")
    assert(byUri("https://x.example/badchunk") == "")
    assert(byUri("https://x.example/badgz") == "")
    assert(byUri("https://x.example/ok") == "readable once, never twice")
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
