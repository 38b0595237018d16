package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{BpeCountTokens, BpeOps}

/** The tiktoken rank-file tokenizer family (the format the reference's
  * actual gpt-4o-mini/o200k_base encoding ships in,
  * `core/extract/ConvoDataExtract.py:74-82`): the base64 loader, the
  * rank-based byte-pair loop, the o200k pretokenizer's divergences from
  * GPT-2's, special-token handling with the REAL o200k ids, the committed
  * fixture's training provenance, and the rank-order-fold law the DuckDB
  * oracle of `text_tokens_bpe_o200k` rests on.
  */
class TiktokenSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fx = BpeOps.o200kFixture

  private def o200kPts(s: String): Seq[String] =
    BpeOps.pretokenize(BpeOps.Encodings.O200kPattern, s)
  private def gpt2Pts(s: String): Seq[String] =
    BpeOps.pretokenize(BpeOps.Gpt2Pattern, s)

  test("tiktoken loader: base64 rank lines round-trip; malformed rejected") {
    val entries = fx.entries
    assert(entries.size == 256 + graft.tools.GenBpeFixture.Rounds)
    val reparsed = BpeOps.parseTiktoken(
      BpeOps.renderTiktoken(entries).linesIterator)
    assert(reparsed.map { case (b, r) => (b.toSeq, r) } ==
      entries.map { case (b, r) => (b.toSeq, r) })
    intercept[IllegalArgumentException](
      BpeOps.parseTiktoken(Iterator("notbase64rankmissing")))
    intercept[IllegalArgumentException]( // duplicate rank
      BpeOps.parseTiktoken(Iterator("YQ== 1", "Yg== 1")))
    intercept[IllegalArgumentException]( // duplicate token bytes
      BpeOps.parseTiktoken(Iterator("YQ== 1", "YQ== 2")))
  }

  test("a table missing a single-byte token is rejected at construction") {
    val holey = fx.entries.filterNot { case (b, _) => b.length == 1 && b(0) == 'a'.toByte }
    intercept[IllegalArgumentException](
      new BpeOps.RankTokenizer(holey, BpeOps.Encodings.O200kPattern))
  }

  test("o200k pretokenizer: divergences from GPT-2 pinned") {
    // contraction suffixes attach to the word (GPT-2 splits them off)
    assert(o200kPts("don't") == Seq("don't"))
    assert(gpt2Pts("don't") == Seq("don", "'t"))
    // ... case-insensitively (GPT-2's are case-sensitive)
    assert(o200kPts("won'T go") == Seq("won'T", " go"))
    assert(gpt2Pts("won'T go") == Seq("won", "'", "T", " go"))
    // digit runs chunk at 3 (GPT-2 takes the whole run)
    assert(o200kPts("1234567") == Seq("123", "456", "7"))
    assert(gpt2Pts("1234567") == Seq("1234567"))
    // a word may absorb ONE leading non-letter (GPT-2 only a space)
    assert(o200kPts("\"quote") == Seq("\"quote"))
    assert(gpt2Pts("\"quote") == Seq("\"", "quote"))
    // case transition starts a new word token in o200k branch order
    assert(o200kPts("helloWORLD ok") == Seq("hello", "WORLD", " ok"))
    // punct runs absorb trailing slashes/newlines
    assert(o200kPts("a://b\n") == Seq("a", "://", "b", "\n"))
    // multi-whitespace lookahead branch (matters beyond the corpus)
    assert(o200kPts("a  b") == Seq("a", " ", " b"))
  }

  test("rank-based byte-pair loop: hand-computed fixtures") {
    // " customer": Ġ,c,u,s,t,o,m,e,r → er(257) → mer(261) → Ġc(264) →
    // st(278) → omer(287) → stomer(288) → ustomer(289) → [Ġc, ustomer]
    assert(fx.encodePretoken(" customer") == Vector("Ġc", "ustomer"))
    // the GPT-2-format 32-merge table stops at [Ġc,u,st,omer] — the two
    // shipped tables genuinely pin different encodings
    assert(BpeOps.default.encodePretoken(" customer") ==
      Vector("Ġc", "u", "st", "omer"))
    // " small": Ġs(256) → al(294) → all(295) → mall(296) → Ġsmall(303)
    assert(fx.encodePretoken(" small") == Vector("Ġsmall"))
    assert(fx.encodeIds(" small").toSeq == Seq(303))
    // multi-byte falls back to byte tokens whose ids ARE the byte values
    assert(fx.encodePretoken("é").size == 2)
    assert(fx.encodeIds("é").toSeq == Seq(0xC3, 0xA9))
    assert(fx.encodeIds("👍").toSeq == Seq(0xF0, 0x9F, 0x91, 0x8D))
    // contraction pretoken runs through the loop whole (no table hits)
    assert(fx.countTokens("don't") == 5L)
    assert(fx.countTokens("") == 0L && fx.countTokens(null) == 0L)
  }

  test("o200k special tokens: real ids, atomic, disjointness enforced") {
    assert(fx.specialTokens("<|endoftext|>") == 199999)
    assert(fx.specialTokens("<|endofprompt|>") == 200018)
    assert(fx.encodeIds("a<|endoftext|>b").toSeq == Seq('a'.toInt, 199999, 'b'.toInt))
    assert(fx.encodeIds("<|endoftext|><|endofprompt|>").toSeq ==
      Seq(199999, 200018))
    // counting treats specials as plain text (tokenizer-family contract)
    assert(fx.countTokens("<|endoftext|>") ==
      fx.pretokenize("<|endoftext|>").map(fx.encodePretoken(_).size).sum)
    // a special id colliding with a rank id is rejected at construction
    intercept[IllegalArgumentException](
      new BpeOps.RankTokenizer(fx.entries, BpeOps.Encodings.O200kPattern,
        Map("<|boom|>" -> 303)))
  }

  test("fixture provenance: retraining on the corpus reproduces the resource") {
    import spark.implicits._
    val texts = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("text")).as[String].collect().iterator
    val retrained = graft.tools.GenBpeFixture.trainedEntries(texts)
    assert(retrained.map { case (b, r) => (b.toSeq, r) } ==
      fx.entries.map { case (b, r) => (b.toSeq, r) },
      "o200k_fixture.tiktoken must be exactly what training reproduces")
  }

  test("merge-pair recovery + rank-order fold ≡ tiktoken loop corpus-wide (oracle's law)") {
    val pairs = BpeOps.mergePairsFromRanks(fx.entries)
    assert(pairs.size == graft.tools.GenBpeFixture.Rounds)
    // recovered pairs concatenate to exactly the multi-byte tokens in rank order
    val toks = fx.entries.filter(_._1.length > 1).sortBy(_._2)
      .map(e => e._1.map(b => BpeOps.byteToChar(b & 0xFF)).mkString)
    assert(pairs.map { case (a, b) => a + b } == toks)
    // the law the DuckDB oracle rests on: applying the recovered pairs in
    // rank order (simultaneous, leftmost-greedy) equals the authentic
    // one-at-a-time min-rank tiktoken loop, on every corpus pretoken
    val foldTok = new BpeOps.Tokenizer(pairs)
    val pretokens = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).collect().map(_.getString(0)).filter(_ != null)
      .iterator.flatMap(t => BpeOps.pretokenize(BpeOps.Encodings.O200kPattern, t))
      .toSet
    assert(pretokens.nonEmpty)
    pretokens.foreach { pt =>
      assert(foldTok.applyMergesInOrder(BpeOps.mapBytes(pt)) == fx.encodePretoken(pt),
        s"fold/tiktoken divergence on pretoken '$pt'")
    }
  }

  test("expression + SQL function: o200k encoder bound through codegen") {
    import spark.implicits._
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), BpeCountTokens(col("text"), fx).as("n"))
      .orderBy("doc_id")
    val viaCol = df.as[(Long, Long)].collect()
    assert(viaCol.forall(_._2 > 0))
    val first = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .orderBy("doc_id").select("text").head().getString(0)
    assert(viaCol.head._2 == fx.countTokens(first))
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("o200k_docs_v")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_bpe_count_tokens_o200k(text) AS n " +
        "FROM o200k_docs_v ORDER BY doc_id").as[(Long, Long)].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    // the two encodings disagree on this corpus (48 vs 32 merges) — the
    // gate queries pin genuinely different values
    val both = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(BpeCountTokens(col("text")).as("gpt2"),
        BpeCountTokens(col("text"), fx).as("o200k"))
      .where(col("gpt2") === col("o200k"))
    assert(both.isEmpty)
  }

  test("REAL-SCALE rank file (~200k entries): construction, memory, corpus counts") {
    // the published o200k_base.tiktoken is ~199,998 entries; offline, a
    // structurally faithful stand-in is generated ON DEMAND (the generator
    // is deterministic — same bytes every run) and cached in target/, so
    // the full-scale path runs in every `sbt test` with no env gate.
    // GRAFT_SCALE_RANKFILE still overrides with an external file (e.g. the
    // real o200k_base.tiktoken, which works identically).
    val f = sys.env.get("GRAFT_SCALE_RANKFILE")
      .map(java.nio.file.Paths.get(_))
      .getOrElse {
        val p = java.nio.file.Paths.get("target/scale_rankfile.tiktoken")
        if (!java.nio.file.Files.exists(p)) graft.tools.GenScaleRankFile.write(p)
        p
      }
    assert(java.nio.file.Files.exists(f), s"rank file missing at $f")

    val tParse0 = System.nanoTime()
    val entries = BpeOps.parseTiktoken(
      java.nio.file.Files.readAllLines(f).iterator().asScala)
    val parseMs = (System.nanoTime() - tParse0) / 1e6
    assert(entries.size >= 190000, s"published-size table expected, got ${entries.size}")

    val beforeMem = usedHeap()
    val tBuild0 = System.nanoTime()
    val tok = new BpeOps.RankTokenizer(entries, BpeOps.Encodings.O200kPattern,
      Map("<|endoftext|>" -> entries.size, "<|endofprompt|>" -> (entries.size + 1)))
    val buildMs = (System.nanoTime() - tBuild0) / 1e6
    val tableMb = (usedHeap() - beforeMem) / 1e6

    // construction must be a per-JVM one-off, not a per-task cost: the
    // published-size table loads in interactive time and holds in tens of
    // MB (two hash maps over ~200k short byte strings)
    assert(buildMs < 30000, s"construction took $buildMs ms")

    // multi-byte/emoji corpus: every path encodes, specials stay atomic,
    // and raw UTF-8 falls back to byte tokens where the table has no rank
    val emoji = "café naïve 👍🏽 こんにちは 🤖"
    assert(tok.countTokens(emoji) > 0)
    assert(tok.encodeIds("a<|endoftext|>b").contains(entries.size))
    // deterministic: a second construction over the same entries agrees
    val tok2 = new BpeOps.RankTokenizer(entries, BpeOps.Encodings.O200kPattern)
    assert(tok2.countTokens(emoji) == tok.countTokens(emoji))

    // corpus throughput: the sf0.001 documents, single-threaded
    val texts = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).collect().map(_.getString(0)).filter(_ != null)
    val bytes = texts.map(_.getBytes("UTF-8").length.toLong).sum
    val tEnc0 = System.nanoTime()
    val total = texts.map(tok.countTokens).sum
    val encSec = (System.nanoTime() - tEnc0) / 1e9
    assert(total > 0 && texts.forall(t => tok.countTokens(t) > 0))
    // merges genuinely fire at scale: tokens-per-byte well under the
    // byte-fallback ceiling of 1.0 on letter-dominated text
    assert(total.toDouble / bytes < 0.9,
      s"tokens/byte ${total.toDouble / bytes} — table isn't merging")

    info(f"scale rank file: ${entries.size} entries; parse $parseMs%.0f ms; " +
      f"build $buildMs%.0f ms; ~$tableMb%.1f MB heap; corpus $bytes bytes → " +
      f"$total tokens (${total.toDouble / bytes}%.3f tok/B) in $encSec%.2f s " +
      f"(${bytes / encSec / 1e6}%.1f MB/s single-thread)")
  }

  private def usedHeap(): Long = {
    val rt = Runtime.getRuntime
    System.gc(); Thread.sleep(50); System.gc()
    rt.totalMemory() - rt.freeMemory()
  }
}
