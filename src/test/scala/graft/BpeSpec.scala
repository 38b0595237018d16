package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{BpeCountTokens, BpeOps}

/** Exact byte-level BPE: the GPT-2 byte→unicode map, the pretokenizer
  * (incl. the lookahead whitespace branch), the authentic min-rank merge
  * loop pinned on hand-computed fixtures (multi-byte/emoji included), the
  * GPT-2 merges-file format loader, and the rank-order ≡ min-rank
  * equivalence the DuckDB oracle relies on — corpus-wide.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("byteToChar is the GPT-2 bytes_to_unicode map") {
    val m = BpeOps.byteToChar
    assert(m('a'.toInt) == 'a' && m('!'.toInt) == '!' && m('~'.toInt) == '~')
    assert(m(0x20) == 'Ġ', "space must map to U+0120") // 256 + 32 remapped-before
    assert(m(0x0A) == 'Ċ', "newline must map to U+010A")
    assert(m(0x09) == 'ĉ', "tab must map to U+0109")
    assert(m(0x00) == 'Ā', "byte 0 is the first remapped value")
    assert(m.distinct.length == 256, "mapping must be a bijection")
  }

  test("GPT-2 pretokenizer: contractions, space attachment, whitespace lookahead") {
    def pts(s: String): Seq[String] = {
      val m = BpeOps.Gpt2Pattern.matcher(s)
      val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    assert(pts("I'll go") == Seq("I", "'ll", " go"))
    assert(pts("it's 42 items!") == Seq("it", "'s", " 42", " items", "!"))
    // the (?!\S) branch: a multi-space run leaves its LAST space attached
    // to the following word — the GPT-2 behavior tiktoken reproduces
    assert(pts("a  b") == Seq("a", " ", " b"))
    assert(pts("a   b") == Seq("a", "  ", " b"))
    assert(pts("a \n b") == Seq("a", " \n", " b"))
  }

  test("merge loop: hand-computed fixtures on the shipped table") {
    val tok = BpeOps.default
    // "the" -> t,h,e: no merge in the table applies -> 3 tokens
    assert(tok.countPretoken("the") == 3)
    // " s" -> Ġ,s -> merge 1 (Ġ s) -> 1 token
    assert(tok.countPretoken(" s") == 1)
    // " join": Ġ,j,o,i,n -> (j o)->jo -> (i n)->in -> (jo in)->join ->
    // (Ġ join) -> 1 token
    assert(tok.countPretoken(" join") == 1)
    // "match": m,a,t,c,h -> (a t) -> (at c) -> (atc h) -> [m, atch] = 2
    assert(tok.countPretoken("match") == 2)
    // " customer": Ġ,c,u,s,t,o,m,e,r -> (e r)->er -> (m er)->mer ->
    // (Ġ c)->Ġc -> (s t)->st -> (o mer)->omer -> [Ġc,u,st,omer] = 4
    assert(tok.countPretoken(" customer") == 4)
    // full text: pretokens "the" + " customer" = 3 + 4
    assert(tok.countTokens("the customer") == 7L)
    assert(tok.countTokens("") == 0L && tok.countTokens(null) == 0L)
  }

  test("multi-byte text: each UTF-8 byte is an initial symbol") {
    val tok = BpeOps.default
    // é = 2 UTF-8 bytes, no merges apply -> 2 tokens
    assert(tok.countPretoken("é") == 2)
    // 👍 = 4 UTF-8 bytes -> 4 tokens
    assert(tok.countPretoken("👍") == 4)
    // mixed: "ok 👍" -> ["ok", " 👍"]: o,k=2; Ġ+4 bytes=5 -> 7
    assert(tok.countTokens("ok 👍") == 7L)
  }

  test("merges-file loader: GPT-2 format with #version header") {
    val parsed = BpeOps.parseMerges(Iterator(
      "#version: 0.2", "Ġ t", "h e", "Ġt he", ""))
    assert(parsed == Vector(("Ġ", "t"), ("h", "e"), ("Ġt", "he")))
    // a table loaded this way drives the same loop: " the" -> Ġ,t,h,e ->
    // (Ġ t) -> (h e) -> (Ġt he) -> 1 token
    val tok = new BpeOps.Tokenizer(parsed)
    assert(tok.encodeMapped(BpeOps.mapBytes(" the")) == Vector("Ġthe"))
    intercept[IllegalArgumentException](BpeOps.parseMerges(Iterator("nospace")))
  }

  test("rank-order fold ≡ min-rank loop on every corpus pretoken (oracle's law)") {
    val tok = BpeOps.default
    val texts = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).collect().map(_.getString(0)).filter(_ != null)
    val pretokens = texts.iterator.flatMap { t =>
      val m = BpeOps.Gpt2Pattern.matcher(t)
      val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }.toSet
    assert(pretokens.nonEmpty)
    pretokens.foreach { pt =>
      val mapped = BpeOps.mapBytes(pt)
      assert(tok.applyMergesInOrder(mapped) == tok.encodeMapped(mapped),
        s"fold/min-rank divergence on pretoken '$pt'")
    }
  }

  test("encodeTokens: sequence agrees with the count, concatenation round-trips") {
    import spark.implicits._
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
      .select(col("text"),
        graft.expressions.BpeEncodeTokens(col("text")).as("toks"),
        graft.expressions.BpeCountTokens(col("text")).as("n"))
      .as[(String, Seq[String], Long)].collect()
    assert(df.nonEmpty)
    df.foreach { case (text, toks, n) =>
      assert(toks.size.toLong == n, s"size/count disagree for '$text'")
      // concatenating the mapped tokens reproduces the mapped text exactly
      // (BPE is a partition of the symbol stream — nothing lost or added)
      assert(toks.mkString == graft.expressions.BpeOps.mapBytes(text))
    }
  }

  test("encodeIds: id convention pinned, agrees with the token sequence") {
    val tok = BpeOps.default
    // base bytes keep their byte value; merges are 256 + rank
    assert(tok.tokenToId.get("a") == 97)
    assert(tok.tokenToId.get("Ġs") == 256, "merge rank 0 must be id 256")
    assert(tok.encodeIds("a").toSeq == Seq(97))
    assert(tok.encodeIds(" s").toSeq == Seq(256))
    // ids are exactly the token sequence mapped through the vocab
    val text = "the customer can join a batch of rows"
    val viaTokens = {
      val m = BpeOps.Gpt2Pattern.matcher(text)
      val b = Seq.newBuilder[Int]
      while (m.find())
        tok.encodeMapped(BpeOps.mapBytes(m.group()))
          .foreach(t => b += tok.tokenToId.get(t).intValue())
      b.result()
    }
    assert(tok.encodeIds(text).toSeq == viaTokens)
    // no token is out of vocabulary, ever (multi-byte included)
    assert(tok.encodeIds("emoji 👍 test").forall(_ >= 0))
  }

  test("shipped merges table has recorded provenance: retraining reproduces it") {
    import spark.implicits._
    // pretoken frequencies from the sf0.01 corpus — ONE distributed pass
    // (the trainer itself then runs on the vocab table, corpus-free)
    val freqs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("text")).as[String].collect().iterator
      .filter(_ != null)
      .flatMap { t =>
        val m = BpeOps.Gpt2Pattern.matcher(t)
        val b = Seq.newBuilder[String]
        while (m.find()) b += m.group()
        b.result()
      }
      .foldLeft(Map.empty[String, Long]) { (acc, pt) =>
        acc.updated(pt, acc.getOrElse(pt, 0L) + 1L)
      }
    val retrained = BpeOps.train(freqs, rounds = 32)
    assert(retrained == BpeOps.default.merges,
      "shipped merges.txt must be exactly what training on the corpus produces")
  }

  test("encoder.json vocab and special tokens: GPT-2 file drop-in behavior") {
    // explicit vocab overrides the derived ids (GPT-2 publishes
    // encoder.json with its own assignment)
    val merges = BpeOps.parseMerges(Iterator("#version: 0.2", "Ġ t", "h e", "Ġt he"))
    val vocabJson = """{"Ġthe": 262, "Ġt": 83, "he": 258, "a": 64,
      "Ġ": 220, "t": 84, "h": 71, "e": 68}"""
    val tok = new BpeOps.Tokenizer(merges,
      explicitVocab = Some(BpeOps.parseVocab(vocabJson)),
      specialTokens = Map("<|endoftext|>" -> 50256))
    assert(tok.encodeIds(" the").toSeq == Seq(262))
    assert(tok.encodeIds("a").toSeq == Seq(64))
    // special tokens are atomic, with surrounding text encoded normally
    assert(tok.encodeIds("a<|endoftext|>a").toSeq == Seq(64, 50256, 64))
    assert(tok.encodeIds("<|endoftext|><|endoftext|>").toSeq ==
      Seq(50256, 50256))
    // a token missing from an explicit vocab is an error, not a wrong id
    val holey = new BpeOps.Tokenizer(merges,
      explicitVocab = Some(BpeOps.parseVocab("""{"a": 1}""")))
    intercept[IllegalArgumentException](holey.encodeIds("b"))
    // a special whose STRING is already a vocab entry must carry the same
    // id — otherwise the surface string encodes to two ids path-dependently
    intercept[IllegalArgumentException](new BpeOps.Tokenizer(merges,
      explicitVocab = Some(BpeOps.parseVocab("""{"a": 1, "<|endoftext|>": 7}""")),
      specialTokens = Map("<|endoftext|>" -> 50256)))
    // ...while the same id is fine (GPT-2's encoder.json ships 50256)
    new BpeOps.Tokenizer(merges,
      explicitVocab = Some(BpeOps.parseVocab("""{"a": 1, "<|endoftext|>": 50256}""")),
      specialTokens = Map("<|endoftext|>" -> 50256))
    // malformed encoder.json rejected
    intercept[IllegalArgumentException](BpeOps.parseVocab("[1,2]"))
  }

  test("pretoken cache is bounded: adversarial cardinality cannot leak memory") {
    // a fresh tokenizer over the same table, fed > CacheCap (2^17) distinct
    // pretokens — counts stay correct while the cache stops admitting
    val tok = new BpeOps.Tokenizer(BpeOps.default.merges)
    var i = 0
    while (i < 140000) {
      val w = "zq" + java.lang.Long.toString(i.toLong + 1000000, 26)
      assert(tok.countPretoken(w) >= 1)
      i += 1
    }
    // correctness unaffected at/after the cap: a fixture with known count
    assert(tok.countPretoken(" customer") == 4)
    assert(tok.countPretoken(" join") == 1)
  }

  test("expression: codegen column over a real scan, SQL name registered") {
    import spark.implicits._
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), BpeCountTokens(col("text")).as("n"))
    val viaCol = df.orderBy("doc_id").as[(Long, Long)].collect()
    assert(viaCol.forall(_._2 > 0))
    // exact spot check against the driver-side tokenizer
    val first = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .orderBy("doc_id").select("text").head().getString(0)
    assert(viaCol.head._2 == BpeOps.default.countTokens(first))
    // SQL registration
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("bpe_docs_v")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_bpe_count_tokens(text) AS n FROM bpe_docs_v ORDER BY doc_id")
      .as[(Long, Long)].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    // BPE count is bounded below by the pretokenizer count's property:
    // merges only ever SHRINK a pretoken's symbol count, never below 1
    val cmp = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(
        BpeCountTokens(col("text")).as("bpe"),
        graft.functions.TextAnalysisFns.bpeishTokenCount(col("text")).as("lower"),
        length(col("text")).cast("long").as("upper"))
      .where(col("bpe") < col("lower") || col("bpe") > col("upper"))
    assert(cmp.isEmpty, "BPE count must sit between pretoken count and char count")
  }
}
