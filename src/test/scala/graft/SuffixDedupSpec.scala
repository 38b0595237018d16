package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SuffixDedup

/** Suffix-ranking substring dedup laws on constructed corpora (exact span
  * boundaries the oracle corpus can't pin), plus corpus-wide agreement
  * with the direct L-gram formulation the prefix-doubling labels must be
  * equivalent to by construction.
  */
class SuffixDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val L = 8

  private def spans(docs: org.apache.spark.sql.DataFrame) =
    SuffixDedup.maximalDuplicateSpans(docs, "doc_id", "text", L)
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("contaminationSpans: only train↔eval overlaps flag; train↔train duplicates stay silent") {
    val leak = (1 to 6).map(i => s"leak$i").mkString(" ")  // 6 tokens ≥ L=4
    val trainDup = (1 to 8).map(i => s"td$i").mkString(" ")
    val docs = Seq(
      (1L, "eval", s"e1 e2 $leak e3"),
      (2L, "train", s"x1 $leak x2 x3"),       // leaks the eval passage
      (3L, "train", s"$trainDup y1"),          // train↔train dup only
      (4L, "train", s"z1 z2 $trainDup"),       // train↔train dup only
      (5L, "train", "q1 q2 q3 q4 q5 q6 q7"))   // clean
      .toDF("doc_id", "source", "text")
    val got = SuffixDedup.contaminationSpans(docs, "doc_id", "text",
        col("source") === "eval", 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 2: leak occupies tokens 2..7; covered window starts 2,3,4 →
    // one maximal span [2,7] of length 6. Docs 3/4 share an 8-token run
    // but NOT with eval — coveredPositions would flag them, the
    // decontamination semi-join must not. Eval docs never appear.
    assert(got == Seq((2L, 2L, 7L, 6L)), got.toString)
  }

  test("decontaminate bundle: one checkpointed suffix front; every head row-identical to its standalone query on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val defs = graft.queries.CurationWave4Queries.defs
      .map(d => d.name -> d).toMap
    def run(name: String) = defs(name).fn(spark, dir)
    val docs = graft.Tables.load(spark, dir, "documents")
    val b = SuffixDedup.decontaminate(docs, "doc_id", "text", "source",
      col("source") === "src0", 12)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(rows(b.spans) == rows(run("decontamination_suffix")),
      "bundled spans diverge from the standalone query")
    assert(rows(b.removal) == rows(run("decontamination_suffix_removal")),
      "bundled removal head diverges from the standalone query")
    assert(rows(b.rates) == rows(run("contamination_rate_by_source")),
      "bundled rates head diverges from the standalone query")
    // the bundle's spans frame is PINNED (checkpointed): its logical plan
    // carries no scan of the corpus — reuse across heads cannot recompute
    // the prefix-doubling front
    val leaves = b.spans.queryExecution.analyzed.collectLeaves()
    assert(leaves.forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      s"spans must be checkpoint-backed, got: $leaves")
  }

  test("a planted cross-doc duplicate span is found with exact 1-based boundaries") {
    // docs 1 and 2 share tokens 4..15 of doc 1 (12 tokens, >= L) and
    // nothing else; doc 3 is all-unique filler
    val shared = (1 to 12).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 $shared v1 v2"),
      (2L, s"w1 $shared"),
      (3L, (1 to 30).map(i => s"filler$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = spans(docs)
    // doc 1: shared occupies positions 4..15; covered window starts are
    // 4..8 (each 8-window inside the shared run), so the merged span is
    // [4, 15]. doc 2: positions 2..13 -> span [2, 13]. doc 3: nothing.
    assert(got == Seq((1L, 4L, 15L, 12L), (2L, 2L, 13L, 12L)), got.toString)
  }

  test("two separated duplicate runs in one doc stay two spans; touching runs merge") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    // doc 1 carries a, then 9 unique tokens (> L gap), then b: two spans.
    val sep = Seq(
      (1L, s"$a ${(1 to 9).map(i => s"x$i").mkString(" ")} $b"),
      (2L, a), (3L, b)).toDF("doc_id", "text")
    assert(spans(sep).filter(_._1 == 1L) ==
      Seq((1L, 1L, 8L, 8L), (1L, 18L, 25L, 8L)))

    // doc 1 carries a immediately followed by b: windows at 1 and 9 touch
    // (9 - 1 <= L) -> ONE merged span [1, 16]
    val touch = Seq(
      (1L, s"$a $b"), (2L, a), (3L, b)).toDF("doc_id", "text")
    assert(spans(touch).filter(_._1 == 1L) == Seq((1L, 1L, 16L, 16L)))
  }

  test("a WITHIN-doc repeat is covered; unique text and sub-L repeats are not") {
    val rep = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$rep $rep"),                                  // self-repeat
      (2L, (1 to 40).map(i => s"q$i").mkString(" ")),      // all unique
      (3L, "s1 s2 s3 s4 t1 t2 t3 t4 s1 s2 s3 s4"))         // 4-token repeat < L
      .toDF("doc_id", "text")
    val got = spans(docs)
    assert(got.map(_._1).toSet == Set(1L))
    // windows 1..9 all duplicated? window at 1 == window at 9 (both = rep);
    // intermediate windows (2..8) straddle the seam and are unique, BUT
    // coverage at 1 and 9 touches (9 - 1 <= L) -> one span [1, 16]
    assert(got == Seq((1L, 1L, 16L, 16L)))
  }

  private def toksOf(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"),
        posexplode(graft.functions.TextAnalysisFns.tokens(col("text")))
          .as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("tok"))

  test("suffixRanks: label order == brute-force token-sequence suffix order (prefix rule, cross-doc ties)") {
    // crafted to exercise every ordering rule: a prefix-suffix ("b c" vs
    // "b c a" — shorter first), an equal cross-doc suffix ("c a" in both
    // docs — SAME label), and unequal-length docs (sentinel propagation
    // through multiple doubling rounds)
    val docs = Seq(
      (1L, "a b c a"),
      (2L, "b c a d b c a")).toDF("doc_id", "text")
    val got = SuffixDedup.suffixRanks(toksOf(docs))
      .as[(Long, Long, Long)].collect()
      .map { case (d, p, l) => (d, p) -> l }.toMap

    // brute-force: suffix token sequences ordered by Seq[String] order
    val suf = Seq(
      1L -> Seq("a", "b", "c", "a"),
      2L -> Seq("b", "c", "a", "d", "b", "c", "a")).flatMap { case (d, ts) =>
      (1 to ts.length).map(p => (d, p.toLong, ts.drop(p - 1)))
    }
    import scala.math.Ordering.Implicits._
    def cmp(a: Seq[String], b: Seq[String]) = a < b // Seq lexicographic: prefix sorts first
    for ((d1, p1, s1) <- suf; (d2, p2, s2) <- suf) {
      val (l1, l2) = (got((d1, p1)), got((d2, p2)))
      if (s1 == s2) assert(l1 == l2, s"equal suffixes $s1 got labels $l1 != $l2")
      else if (cmp(s1, s2)) assert(l1 < l2, s"$s1 < $s2 but labels $l1 >= $l2")
      else assert(l1 > l2, s"$s1 > $s2 but labels $l1 <= $l2")
    }
    // the duplicated cross-doc suffixes share one label:
    // doc1 pos3 = ["c","a"] == doc2 pos6; doc1 pos4 = ["a"] == doc2 pos7
    assert(got((1L, 3L)) == got((2L, 6L)))
    assert(got((1L, 4L)) == got((2L, 7L)))
  }

  test("suffix_array_topk matches a driver-side sort of all suffixes on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("suffix_array_topk")(spark, dir)
      .as[(Int, Long, Long, String)].collect().toSeq
    assert(got.size == 100 && got.map(_._1) == (1 to 100))
    // brute force on the collected corpus
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", graft.functions.TextAnalysisFns.tokens($"text").as("ts"))
      .as[(Long, Seq[String])].collect()
    import scala.math.Ordering.Implicits._
    val all = docs.flatMap { case (d, ts) =>
      (1 to ts.length).map(p => (ts.drop(p - 1).toSeq, d, p.toLong)) }
    val want = all.sortBy(identity).take(100)
      .zipWithIndex.map { case ((s, d, p), i) =>
        (i + 1, d, p, s.take(8).mkString(" ")) }
    assert(got == want.toSeq)
  }

  test("prefix-doubling covered set == direct L-gram covered set on the sf0.001 corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val toks = docs.select(col("doc_id"),
        posexplode(graft.functions.TextAnalysisFns.tokens(col("text")))
          .as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("tok"))
    val viaLabels = SuffixDedup.coveredPositions(toks, L)
      .as[(Long, Long)].collect().toSet

    // direct formulation: materialize every 8-gram, group, count >= 2
    val grams = docs.select(col("doc_id"),
        graft.functions.TextAnalysisFns.tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= L)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(ts) - ${L - 1}), i -> " +
          "struct(i AS pos, concat_ws(' ', slice(ts, i, " + L + ")) AS gram))"))
        .as("g"))
      .select(col("doc_id"), col("g.pos").cast("long").as("pos"), col("g.gram"))
    val dupG = grams.groupBy(col("gram")).count().where(col("count") >= 2)
      .select(col("gram"))
    val viaGrams = grams.join(dupG, Seq("gram")).select(col("doc_id"), col("pos"))
      .as[(Long, Long)].collect().toSet

    assert(viaLabels == viaGrams,
      s"label-covered ${viaLabels.size} vs gram-covered ${viaGrams.size}")
    assert(viaLabels.nonEmpty, "fixture corpus has known duplicates — empty covered set is a bug")
  }
}
