package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Zip

/** ZIP ingestion laws. The JDK's own ZipOutputStream is a genuine
  * INDEPENDENT encoder (a third-party implementation of the format),
  * so round-trips here validate the engine's reader against real-world
  * output, not a mirror of itself — stored and deflated entries, UTF-8
  * names, directory skipping, CRC enforcement, truncation behavior,
  * and the Spark row surface.
  */
class ZipSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def zip(entries: Seq[(String, Array[Byte])],
                  stored: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    for ((name, data) <- entries) {
      val e = new java.util.zip.ZipEntry(name)
      if (stored) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(data.length)
        val c = new java.util.zip.CRC32; c.update(data)
        e.setCrc(c.getValue)
      }
      zo.putNextEntry(e)
      zo.write(data)
      zo.closeEntry()
    }
    zo.close()
    bos.toByteArray
  }

  test("deflated and stored entries from the JDK encoder decode with verified CRCs") {
    val rnd = new scala.util.Random(67)
    val doc = ("The quick brown fox. " * 50).getBytes("UTF-8")
    val bin = Array.fill(1000)(rnd.nextInt(256).toByte)
    for (stored <- Seq(false, true)) {
      val z = zip(Seq("a/doc.txt" -> doc, "b/blob.bin" -> bin), stored = stored)
      val es = Zip.entries(z)
      assert(es.map(_.name) == Seq("a/doc.txt", "b/blob.bin"), s"stored=$stored")
      assert(es(0).data.toSeq == doc.toSeq && es(1).data.toSeq == bin.toSeq)
    }
  }

  test("unicode names, directory entries skipped, empty files kept") {
    val z = {
      val bos = new java.io.ByteArrayOutputStream()
      val zo = new java.util.zip.ZipOutputStream(bos)
      zo.putNextEntry(new java.util.zip.ZipEntry("dir/"))
      zo.closeEntry()
      zo.putNextEntry(new java.util.zip.ZipEntry("dir/ünïcode-ñame.jsonl"))
      zo.write("{}".getBytes)
      zo.closeEntry()
      zo.putNextEntry(new java.util.zip.ZipEntry("empty.txt"))
      zo.closeEntry()
      zo.close()
      bos.toByteArray
    }
    val es = Zip.entries(z)
    assert(es.map(_.name) == Seq("dir/ünïcode-ñame.jsonl", "empty.txt"))
    assert(es(1).data.isEmpty)
  }

  test("integrity: corrupt data fails CRC and drops the entry; damage degrades, never throws") {
    val doc = ("corpus line " * 100).getBytes
    val z = zip(Seq("keep.txt" -> doc, "drop.txt" -> doc))
    // corrupt one byte inside the FIRST entry's deflate stream — the
    // central directory at the tail still lists both; CRC drops one
    val corrupted = z.clone()
    corrupted(40) = (corrupted(40) ^ 0x20).toByte
    val es = Zip.entries(corrupted)
    assert(es.map(_.name) == Seq("drop.txt"),
      "the CRC-failing entry must vanish, the intact one must survive")
    // truncation loses the central directory → Nil (how unzip treats it)
    assert(Zip.entries(z.take(z.length / 2)).isEmpty)
    assert(Zip.entries("PK but not really".getBytes).isEmpty)
    assert(Zip.entries(null).isEmpty)
    val rnd = new scala.util.Random(71)
    for (_ <- 0 until 300) {
      val m = z.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      Zip.entries(m) // no escaped exception
    }
  }

  test("ZIP64: a >65535-entry archive (JDK-written EOCD64 + locator) lists and decodes") {
    // the JDK switches to ZIP64 records at 65536 entries even though the
    // archive stays physically tiny — the dataset-bundle case
    val n = 70000
    val bos = new java.io.ByteArrayOutputStream(16 << 20)
    val zo = new java.util.zip.ZipOutputStream(bos)
    var i = 0
    while (i < n) {
      zo.putNextEntry(new java.util.zip.ZipEntry(f"shard/e$i%05d.txt"))
      zo.write(('a' + (i % 26)).toByte)
      zo.closeEntry()
      i += 1
    }
    zo.close()
    val payload = bos.toByteArray
    // EOCD count field must be the 0xFFFF marker for this to test ZIP64
    val names = Zip.entriesFiltered(payload, _ => true, needData = false)
    assert(names.length == n)
    assert(names.head.name == "shard/e00000.txt" && names.head.size == 1L)
    val some = Zip.entriesFiltered(payload,
      Set("shard/e00000.txt", "shard/e69999.txt"), needData = true)
    assert(some.map(e => new String(e.data)) ==
      Seq("a", ('a' + (69999 % 26)).toChar.toString))
  }

  test("Spark surface: files()/textFiles(), Exchange-free plan") {
    import spark.implicits._
    val z = zip(Seq(
      "data/p0.jsonl" -> "{\"doc\":\"gamma\"}".getBytes,
      "data/raw.bin" -> Array.fill(16)(3.toByte),
      "notes.md" -> "# zip corpus".getBytes))
    val archives = Seq(("c1.zip", z), ("junk", "xx".getBytes)).toDF("path", "content")
    assert(Zip.files(spark, archives).count() == 3)
    val texts = Zip.textFiles(spark, archives).orderBy("entry_name").collect()
    assert(texts.map(_.getAs[String]("entry_name")).toSeq ==
      Seq("data/p0.jsonl", "notes.md"))
    assert(texts(0).getAs[String]("text") == "{\"doc\":\"gamma\"}")
    val plan = Zip.textFiles(spark, archives).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"textFiles() must stay shuffle-free:\n$plan")
  }
}
