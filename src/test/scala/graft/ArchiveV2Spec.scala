package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.ArchiveScanMetrics

/** DSv2 archive connector laws (round-13 ask #5): per-file partitions,
  * filter pushdown reaching the parse walk (records skipped BEFORE their
  * payload is materialized — audited through ArchiveScanMetrics), column
  * pruning skipping payloads entirely, and plan visibility of both.
  */
class ArchiveV2Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // ---- fixtures -----------------------------------------------------------

  private def warcRecord(warcType: String, uri: String, body: Array[Byte],
                         ct: String = "text/plain"): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
    (s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Record-ID: <urn:uuid:7>\r\n" +
      "WARC-Date: 2026-08-16T00:00:00Z\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      http ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private lazy val warcDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-v2-warc")
    java.nio.file.Files.write(dir.resolve("seg-0.warc"),
      warcRecord("response", "https://en.example/a", "alpha page".getBytes) ++
        warcRecord("request", "https://en.example/a", "GET /".getBytes) ++
        warcRecord("response", "https://de.example/b", "beta seite".getBytes))
    java.nio.file.Files.write(dir.resolve("seg-1.warc"),
      warcRecord("response", "https://en.example/c", "gamma page".getBytes) ++
        warcRecord("response", "https://fr.example/d", "page delta".getBytes))
    dir.toString
  }

  private def tarOf(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      System.arraycopy(nb, 0, h, 0, nb.length)
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = s"%0${len - 1}o".format(v)
        System.arraycopy(s.getBytes, 0, h, off, s.length)
      }
      oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
      oct(data.length.toLong, 124, 12); oct(0, 136, 12)
      h(156) = '0'
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0; for (i <- 0 until 512) sum += h(i) & 0xFF
      val cs = s"%06o".format(sum).getBytes
      System.arraycopy(cs, 0, h, 148, cs.length); h(154) = 0; h(155) = ' '
      bos.write(h); bos.write(data)
      val pad = (512 - (data.length % 512)) % 512
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  private def zipOf(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      zo.putNextEntry(new java.util.zip.ZipEntry(name))
      zo.write(data); zo.closeEntry()
    }
    zo.close()
    bos.toByteArray
  }

  // ---- WARC ---------------------------------------------------------------

  test("warc v2: pushed type+prefix filters skip records at the walk; rows match the flatMap surface") {
    val df = spark.read.format("graft.sources.v2.WarcTableProvider")
      .load(warcDir)
      .where(col("warc_type") === "response" &&
        col("target_uri").startsWith("https://en."))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[") && plan.contains("EqualTo(warc_type,response)"),
      s"pushed filter must be plan-visible:\n$plan")
    assert(plan.contains("StringStartsWith(target_uri,https://en.)"), plan)
    ArchiveScanMetrics.reset()
    val rows = df.select("target_uri", "body").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("https://en.example/a", "https://en.example/c"))
    assert(new String(rows.map(r => r.getAs[Array[Byte]]("body"))
      .minBy(_.length), "UTF-8").nonEmpty)
    assert(ArchiveScanMetrics.materialized.sum() == 2,
      s"only matching records may materialize (got ${ArchiveScanMetrics.materialized.sum()})")
    assert(ArchiveScanMetrics.skipped.sum() == 3,
      s"non-matching records must be skipped at the walk (got ${ArchiveScanMetrics.skipped.sum()})")
  }

  test("warc v2: column pruning drops the block read; parity with records() on shared columns") {
    val pruned = spark.read.format("graft.sources.v2.WarcTableProvider")
      .load(warcDir).select("target_uri", "content_length", "warc_type")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("needBlock=false"),
      s"no block-derived column requested → the walk must skip blocks:\n$plan")
    // and the values still match the binaryFile+flatMap surface exactly
    import spark.implicits._
    val viaV2 = spark.read.format("graft.sources.v2.WarcTableProvider")
      .load(warcDir)
      .select("target_uri", "warc_type", "http_status", "content_length")
      .collect().map(_.toSeq).toSet
    val files = spark.read.format("binaryFile").load(warcDir)
      .select(col("path"), col("content"))
    val viaFlatMap = graft.sources.Warc.records(spark, files)
      .select("target_uri", "warc_type", "http_status", "content_length")
      .collect().map(_.toSeq).toSet
    assert(viaV2 == viaFlatMap)
  }

  // ---- tar / ZIP ----------------------------------------------------------

  test("tar/zip v2: entry_name pushdown skips payload copies/inflates; pruning skips data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-v2-arch")
    java.nio.file.Files.write(dir.resolve("c.tar"), tarOf(
      "docs/a.txt" -> "alpha text".getBytes,
      "img/b.png" -> Array.fill(32)(3.toByte),
      "docs/c.txt" -> "gamma text".getBytes))
    java.nio.file.Files.write(dir.resolve("c.zip"), zipOf(
      "docs/a.txt" -> "alpha text".getBytes,
      "img/b.png" -> Array.fill(32)(3.toByte),
      "docs/c.txt" -> "gamma text".getBytes))
    for ((fmt, file) <- Seq("Tar" -> "c.tar", "Zip" -> "c.zip")) {
      val df = spark.read.format(s"graft.sources.v2.${fmt}TableProvider")
        .load(s"$dir/$file")
        .where(col("entry_name").endsWith(".txt"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("StringEndsWith(entry_name,.txt)"), plan)
      ArchiveScanMetrics.reset()
      val rows = df.select("entry_name", "n_bytes", "data").collect()
      assert(rows.map(_.getString(0)).sorted.toSeq ==
        Seq("docs/a.txt", "docs/c.txt"), s"$fmt rows")
      assert(rows.forall(_.getLong(1) == 10L))
      assert(rows.forall(r => new String(r.getAs[Array[Byte]]("data"), "UTF-8")
        .endsWith("text")))
      assert(ArchiveScanMetrics.materialized.sum() == 2 &&
        ArchiveScanMetrics.skipped.sum() == 1, s"$fmt walk counts")
      // pruning: a name/size listing must not decode payloads
      val listing = spark.read.format(s"graft.sources.v2.${fmt}TableProvider")
        .load(s"$dir/$file").select("entry_name", "n_bytes")
      assert(listing.queryExecution.executedPlan.toString.contains("needData=false"))
      assert(listing.collect().length == 3)
    }
  }

  test("v2 providers: one partition per archive file") {
    val df = spark.read.format("graft.sources.v2.WarcTableProvider").load(warcDir)
    assert(df.rdd.getNumPartitions == 2, "two segment files → two partitions")
  }
}
