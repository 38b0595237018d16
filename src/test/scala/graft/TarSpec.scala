package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tar

/** Tar ingestion laws over hand-built ustar fixtures: checksum
  * verification, octal and base-256 sizes, GNU 'L' long names, pax
  * `path=` overrides, gzip transparency, damaged-tail tolerance, and
  * the Spark row surface.
  */
class TarSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // ---- fixture builder ---------------------------------------------------

  private def header(name: String, size: Long, typeflag: Char = '0',
                     corruptChecksum: Boolean = false,
                     base256: Boolean = false): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("UTF-8")
    System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
    def octal(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      System.arraycopy(padded.getBytes("ASCII"), 0, h, off, len - 1)
      h(off + len - 1) = 0
    }
    octal(420, 100, 8) // mode 0644
    octal(0, 108, 8); octal(0, 116, 8) // uid/gid
    if (base256) {
      h(124) = 0x80.toByte
      for (i <- 0 until 11) h(125 + i) = ((size >> (8 * (10 - i))) & 0xFF).toByte
    } else octal(size, 124, 12)
    octal(0, 136, 12) // mtime
    h(156) = typeflag.toByte
    System.arraycopy("ustar".getBytes("ASCII"), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0'
    // checksum: field as spaces during the sum
    for (i <- 148 until 156) h(i) = ' '
    var sum = 0L
    for (i <- 0 until 512) sum += h(i) & 0xFF
    if (corruptChecksum) sum += 7
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    System.arraycopy(padded.getBytes("ASCII"), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }

  private def entry(name: String, data: Array[Byte], typeflag: Char = '0',
                    corruptChecksum: Boolean = false,
                    base256: Boolean = false): Array[Byte] = {
    val pad = new Array[Byte]((512 - (data.length % 512)) % 512)
    header(name, data.length, typeflag, corruptChecksum, base256) ++ data ++ pad
  }

  private def tar(entries: Array[Byte]*): Array[Byte] =
    entries.flatten.toArray ++ new Array[Byte](1024) // two zero blocks

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  // ---- parse laws ----------------------------------------------------------

  test("regular entries parse with verified checksums; dirs and links skip") {
    val t = tar(
      entry("docs/a.txt", "hello tar".getBytes),
      entry("docs/", Array.emptyByteArray, typeflag = '5'), // directory
      entry("docs/b.jsonl", "{\"x\":1}\n{\"x\":2}".getBytes),
      entry("link", Array.emptyByteArray, typeflag = '2')) // symlink
    val es = Tar.entries(t)
    assert(es.map(_.name) == Seq("docs/a.txt", "docs/b.jsonl"))
    assert(new String(es(0).data) == "hello tar")
    // corrupt checksum ends the parse at the last good entry
    val bad = tar(entry("ok.txt", "x".getBytes),
      entry("bad.txt", "y".getBytes, corruptChecksum = true),
      entry("after.txt", "z".getBytes))
    assert(Tar.entries(bad).map(_.name) == Seq("ok.txt"))
  }

  test("GNU 'L' long names, pax path= overrides, base-256 sizes, gzip transparency") {
    val longName = "corpus/" + ("x" * 150) + "/part-00000.jsonl"
    val gnuLong = entry("././@LongLink", (longName + "\u0000").getBytes, typeflag = 'L') ++
      entry("truncated-name.jsonl", "long ok".getBytes)
    val paxName = "pax/dir/ünïcode-ñame.txt"
    val paxRec = {
      // pax record: "<len> <key>=<value>\n" where len counts the WHOLE
      // record including its own digits and the space — solve for width
      val kv = s"path=$paxName\n"
      val total = kv.getBytes("UTF-8").length
      var width = 1
      while ((total + width + 1).toString.length != width) width += 1
      s"${total + width + 1} $kv".getBytes("UTF-8")
    }
    val pax = entry("PaxHeader/x", paxRec, typeflag = 'x') ++
      entry("short-name.txt", "pax ok".getBytes)
    val big = entry("big.bin", Array.fill(600)(5.toByte), base256 = true)
    val t = tar(gnuLong, pax, big)
    val es = Tar.entries(t)
    assert(es.map(_.name) == Seq(longName, paxName, "big.bin"))
    assert(new String(es(0).data) == "long ok")
    assert(new String(es(1).data) == "pax ok")
    assert(es(2).data.length == 600)
    // same archive gzipped parses identically
    assert(Tar.entries(gz(t)).map(_.name) == es.map(_.name))
  }

  test("degrades: truncation, garbage, null, fuzz never throws") {
    val t = tar(entry("a.txt", "abc".getBytes))
    assert(Tar.entries(t).nonEmpty)
    assert(Tar.entries(t.take(700)).map(_.name) == Seq("a.txt"), "data present, trailer cut")
    assert(Tar.entries(t.take(300)).isEmpty)
    assert(Tar.entries(null).isEmpty)
    assert(Tar.entries("not a tar".getBytes).isEmpty)
    val rnd = new scala.util.Random(61)
    for (_ <- 0 until 200) {
      val m = t.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      Tar.entries(m)
    }
  }

  // ---- streaming path -------------------------------------------------------

  test("entriesStream parity: plain and gzip streams match the byte[] walk; keep/needData honored") {
    val longName = "corpus/" + ("x" * 150) + "/part-00000.jsonl"
    val t = tar(
      entry("docs/a.txt", "hello tar".getBytes),
      entry("docs/", Array.emptyByteArray, typeflag = '5'),
      entry("././@LongLink", (longName + "\u0000").getBytes, typeflag = 'L') ++
        entry("short.jsonl", "long ok".getBytes),
      entry("docs/b.jsonl", "{\"x\":1}".getBytes))
    for (payload <- Seq(t, gz(t))) {
      val streamed = Tar.entriesStream(
        new java.io.ByteArrayInputStream(payload)).toSeq
      val inMem = Tar.entries(payload)
      assert(streamed.map(_.name) == inMem.map(_.name))
      streamed.zip(inMem).foreach { case (a, b) =>
        assert(a.size == b.data.length &&
          java.util.Arrays.equals(a.data, b.data))
      }
    }
    // pushdown + pruning semantics match entriesFiltered
    val kept = Tar.entriesStream(new java.io.ByteArrayInputStream(t),
      keep = _.endsWith(".jsonl"), needData = false).toSeq
    assert(kept.map(_.name) == Seq(longName, "docs/b.jsonl"))
    assert(kept.forall(_.data.isEmpty) && kept.map(_.size) == Seq(7L, 7L))
    // damage parity: truncation keeps the prefix; fuzz never throws
    assert(Tar.entriesStream(new java.io.ByteArrayInputStream(
      t.take(t.length - 1200))).map(_.name).toSeq.head == "docs/a.txt")
    val rnd = new scala.util.Random(97)
    for (_ <- 0 until 150) {
      val m = t.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      Tar.entriesStream(new java.io.ByteArrayInputStream(m)).foreach(_ => ())
    }
  }

  test(">2 GiB tarball: the streaming walk ingests it with bounded heap; byte[] walk degrades") {
    // ~2.2 GiB uncompressed as a small .tar.gz: 2200 entries of 1 MiB
    // zeros, built incrementally — the inflated whole never exists
    val unit = new Array[Byte](1 << 20)
    val bos = new java.io.ByteArrayOutputStream(8 << 20)
    val gzo = new java.util.zip.GZIPOutputStream(bos, 1 << 16)
    var i = 0
    while (i < 2200) {
      gzo.write(entry(s"shard-$i.bin", unit))
      i += 1
    }
    gzo.write(new Array[Byte](1024))
    gzo.close()
    val payload = bos.toByteArray
    assert(payload.length < (64 << 20), "fixture must stay small on disk")
    assert(Tar.entries(payload).isEmpty) // over the inflate cap → degrade
    var seen = 0
    var bytes = 0L
    val it = Tar.entriesStream(new java.io.ByteArrayInputStream(payload))
    while (it.hasNext) {
      val e = it.next()
      assert(e.size == (1 << 20))
      seen += 1
      bytes += e.size
    }
    assert(seen == 2200)
    assert(bytes > (2L << 30))
  }

  test("filesFromPaths: per-path streaming rows match files(); bad paths degrade to zero rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tar-paths")
    val t = tar(entry("a.txt", "alpha".getBytes),
      entry("b.bin", Array.fill(16)(7.toByte)))
    java.nio.file.Files.write(dir.resolve("c.tar"), t)
    java.nio.file.Files.write(dir.resolve("c.tar.gz"), gz(t))
    val paths = Seq(dir.resolve("c.tar").toString,
      dir.resolve("c.tar.gz").toString,
      dir.resolve("missing.tar").toString).toDF("path")
    val rows = Tar.filesFromPaths(spark, paths)
    assert(rows.count() == 4)
    val viaContent = Tar.files(spark, Seq(("c.tar", t)).toDF("path", "content"))
      .select("entry_name", "n_bytes").collect().map(_.toSeq).toSet
    val viaPath = rows.where($"path".endsWith("c.tar"))
      .select("entry_name", "n_bytes").collect().map(_.toSeq).toSet
    assert(viaPath == viaContent)
    assert(!rows.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("Spark surface: files()/textFiles() rows; Exchange-free plan; jsonl ready for from_json") {
    import spark.implicits._
    val t = tar(
      entry("data/part-0.jsonl", "{\"doc\":\"alpha\"}\n{\"doc\":\"beta\"}".getBytes),
      entry("data/blob.bin", Array.fill(32)(1.toByte)),
      entry("README.md", "# corpus".getBytes))
    val archives = Seq(("c0.tar.gz", gz(t)), ("junk.bin", "nope".getBytes))
      .toDF("path", "content")
    val all = Tar.files(spark, archives)
    assert(all.count() == 3)
    val texts = Tar.textFiles(spark, archives).orderBy("entry_name").collect()
    assert(texts.map(_.getAs[String]("entry_name")).toSeq ==
      Seq("README.md", "data/part-0.jsonl"))
    val plan = Tar.textFiles(spark, archives).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"textFiles() must stay shuffle-free:\n$plan")
    // the jsonl row feeds straight into from_json
    val parsed = Tar.textFiles(spark, archives)
      .where($"entry_name".endsWith(".jsonl"))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", "\n")).as("line"))
      .select(org.apache.spark.sql.functions.from_json(
        $"line", org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc",
            org.apache.spark.sql.types.StringType)))).as("j"))
      .select("j.doc").as[String].collect().sorted
    assert(parsed.toSeq == Seq("alpha", "beta"))
  }
}
