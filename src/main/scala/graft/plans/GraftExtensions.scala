package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, LongType, TimestampType}

/** Engine extensions, registered via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PushdownNanosTimestampPredicate)
    e.injectOptimizerRule(_ => ApproxCountDistinctRewrite)
    e.injectPlannerStrategy(_ => TopKPerProbeStrategy)
    GraftSqlFunctions.all.foreach(e.injectFunction)
  }
}

/** The engine's custom Catalyst expressions surfaced as named SQL
  * functions, so `spark.sql("SELECT graft_char_ngrams(text, 3) ...")`
  * works the same as the Column API. Each builder validates arity and
  * returns the codegen'd expression directly — no UDF wrapper, the call
  * stays inside whole-stage codegen.
  */
object GraftSqlFunctions {
  import graft.expressions._

  private type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def reg(name: String, usage: String, arity: Seq[Int])(
      build: Seq[Expression] => Expression): Registration = {
    val fi = FunctionIdentifier(name)
    val info = new ExpressionInfo("graft", name, usage)
    val checked = (args: Seq[Expression]) => {
      if (!arity.contains(args.length))
        throw new IllegalArgumentException(
          s"$name expects ${arity.mkString(" or ")} arguments, got ${args.length}")
      build(args)
    }
    (fi, info, checked)
  }

  val all: Seq[Registration] = Seq(
    reg("graft_char_ngrams",
      "graft_char_ngrams(str, n[, sorted]) - distinct character n-grams; " +
        "pass sorted=true to emit them pre-sorted for graft_jaccard_geq",
      Seq(2, 3)) {
      case Seq(s, n) => CharNgrams(s, n)
      case Seq(s, n, Literal(b: Boolean, BooleanType)) => CharNgrams(s, n, b)
      case _ => throw new IllegalArgumentException(
        "graft_char_ngrams: third argument must be a boolean literal")
    },
    reg("graft_word_shingles",
      "graft_word_shingles(tokens, w) - distinct w-word shingles", Seq(2)) {
      case Seq(t, w) => WordShingles(t, w)
    },
    reg("graft_ngram_intersect",
      "graft_ngram_intersect(a, b) - |a ∩ b| over distinct string arrays",
      Seq(2)) {
      case Seq(a, b) => IntersectCount(a, b)
    },
    reg("graft_jaccard_geq",
      "graft_jaccard_geq(a_sorted, b_sorted, t) - Jaccard(a,b) >= t via one " +
        "sorted-merge pass with a monotonic early exit", Seq(3)) {
      case Seq(a, b, t) => JaccardGeq(a, b, t)
    },
    reg("graft_dot",
      "graft_dot(a, b) - sequential-order dot product of numeric arrays",
      Seq(2)) {
      case Seq(a, b) => DotProduct(a, b)
    },
    reg("graft_parse_schedule_time",
      "graft_parse_schedule_time(s) - seconds since midnight from a " +
        "'h[:mm]AM/PM' schedule string (reference parse rules)", Seq(1)) {
      case Seq(s) => ParseScheduleTime(s)
    },
    reg("graft_rolling_fingerprint",
      "graft_rolling_fingerprint(tokens) - order-sensitive rolling-hash " +
        "document fingerprint over a token array", Seq(1)) {
      case Seq(t) => RollingFingerprint(t)
    },
    reg("graft_sort_join_last",
      "graft_sort_join_last(arr_of_struct, sep) - sort a struct array by " +
        "all fields and join the LAST field with sep, in one fused pass",
      Seq(2)) {
      case Seq(a, sep) => SortJoinLastField(a, sep)
    },
    reg("graft_max_lev_ratio",
      "graft_max_lev_ratio(s, names) - best Levenshtein ratio (0-100) of " +
        "s against a foldable array of names", Seq(2)) {
      case Seq(s, namesExpr)
          if namesExpr.foldable &&
            namesExpr.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
            namesExpr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
              .elementType == org.apache.spark.sql.types.StringType =>
        namesExpr.eval(null) match {
          case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
            val names = (0 until arr.numElements()).map { i =>
              if (arr.isNullAt(i)) throw new IllegalArgumentException(
                "graft_max_lev_ratio: names array must not contain NULLs")
              arr.getUTF8String(i).toString
            }
            MaxLevRatio(s, names)
          case _ => throw new IllegalArgumentException(
            "graft_max_lev_ratio: names array must not be NULL")
        }
      case _ => throw new IllegalArgumentException(
        "graft_max_lev_ratio: second argument must be a foldable string array")
    },
    reg("graft_top_k",
      "graft_top_k(struct(score, id), k) - bounded per-group top-k " +
        "aggregate (score DESC, id ASC); k must be a positive int literal",
      Seq(2)) {
      case Seq(child, Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
        TopKAgg(child, k).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "graft_top_k: second argument must be an int literal")
    },
    reg("graft_nfc",
      "graft_nfc(str) - Unicode NFC canonical composition (normalize " +
        "text keys before dedup/joins)", Seq(1)) {
      case Seq(s) => NfcNormalize(s)
    },
    reg("graft_strip_accents",
      "graft_strip_accents(str) - drop accents/combining marks " +
        "(utf8proc STRIPMARK semantics)", Seq(1)) {
      case Seq(s) => StripAccents(s)
    },
    reg("graft_bpe_count_tokens",
      "graft_bpe_count_tokens(str) - exact byte-level BPE token count " +
        "(GPT-2 pretokenizer + merge loop over the shipped merges table)",
      Seq(1)) {
      case Seq(s) => BpeCountTokens(s, BpeOps.default)
    },
    reg("graft_bpe_tokens",
      "graft_bpe_tokens(str) - the exact BPE token sequence (mapped-symbol " +
        "strings, document order)", Seq(1)) {
      case Seq(s) => BpeEncodeTokens(s, BpeOps.default)
    },
    reg("graft_bpe_ids",
      "graft_bpe_ids(str) - exact BPE token ids (base bytes 0-255, merges " +
        "256+rank), document order", Seq(1)) {
      case Seq(s) => BpeEncodeIds(s, BpeOps.default)
    },
    reg("graft_bpe_count_tokens_o200k",
      "graft_bpe_count_tokens_o200k(str) - exact BPE token count under " +
        "the o200k_base encoding rules (tiktoken rank-file vocabulary, " +
        "o200k pretokenizer)", Seq(1)) {
      case Seq(s) => BpeCountTokens(s, BpeOps.o200kFixture)
    },
    reg("graft_bpe_ids_o200k",
      "graft_bpe_ids_o200k(str) - exact BPE token ids under the " +
        "o200k_base encoding rules (rank = id; specials atomic)", Seq(1)) {
      case Seq(s) => BpeEncodeIds(s, BpeOps.o200kFixture)
    })
}

/** Rewrites comparisons against the ns→µs-converted events timestamp into
  * raw-nanos predicates so they reach the parquet scan.
  *
  * The events table stores TIMESTAMP(NANOS), which Spark reads as a long
  * (legacy flag) and converts with `timestamp_micros(ts div 1000)` — an
  * expression Catalyst cannot push through, losing row-group pruning on
  * the one column every incremental-window query filters on. Since
  * µs = floor(ns/1000), each comparison has an exact integer-arithmetic
  * equivalent on the raw column:
  *
  *   floor(ns/1000) >= T  ⟺  ns >= T*1000
  *   floor(ns/1000) >  T  ⟺  ns >= (T+1)*1000
  *   floor(ns/1000) <  T  ⟺  ns <  T*1000
  *   floor(ns/1000) <= T  ⟺  ns <  (T+1)*1000
  *   floor(ns/1000) =  T  ⟺  ns >= T*1000 AND ns < (T+1)*1000
  *
  * The rewrite replaces the predicate (exact equivalence, so results are
  * unchanged); the plain long comparison then pushes to the scan as a
  * normal parquet filter.
  */
object PushdownNanosTimestampPredicate extends Rule[LogicalPlan] {

  /** timestamp_micros(raw div 1000) → raw */
  private object NanosConversion {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(raw, Literal(1000L, LongType), _))
          if raw.dataType == LongType => Some(raw)
      case _ => None
    }
  }

  private object TsLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) => Some(v)
      case Cast(Literal(v: Long, TimestampType), TimestampType, _, _) => Some(v)
      case _ => None
    }
  }

  private def nsLit(micros: Long): Literal = Literal(micros * 1000L, LongType)

  /** The rewrite is only exact when (a) `(t+1)*1000` cannot overflow Long and
    * (b) `t >= 1`, because Spark's IntegralDivide truncates toward zero (not
    * floor): for negative raw nanos, `ns div 1000` rounds up, so the floor
    * identities above only hold when the literal bound is positive (any
    * negative-nanos row is then strictly below the bound on both sides).
    * Out-of-range literals (pre-1970 or far-future like TIMESTAMP '9999-12-31'
    * at ns scale) are left unrewritten — correct, just not pushed down.
    */
  private def rewritable(t: Long): Boolean =
    t >= 1L && t <= Long.MaxValue / 1000L - 2L

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(NanosConversion(raw), TsLiteral(t)) if rewritable(t) =>
      GreaterThanOrEqual(raw, nsLit(t))
    case GreaterThan(NanosConversion(raw), TsLiteral(t)) if rewritable(t) =>
      GreaterThanOrEqual(raw, nsLit(t + 1))
    case LessThan(NanosConversion(raw), TsLiteral(t)) if rewritable(t) =>
      LessThan(raw, nsLit(t))
    case LessThanOrEqual(NanosConversion(raw), TsLiteral(t)) if rewritable(t) =>
      LessThan(raw, nsLit(t + 1))
    case EqualTo(NanosConversion(raw), TsLiteral(t)) if rewritable(t) =>
      And(GreaterThanOrEqual(raw, nsLit(t)), LessThan(raw, nsLit(t + 1)))
    // mirrored operand order
    case GreaterThanOrEqual(TsLiteral(t), NanosConversion(raw)) if rewritable(t) =>
      LessThan(raw, nsLit(t + 1))
    case GreaterThan(TsLiteral(t), NanosConversion(raw)) if rewritable(t) =>
      LessThan(raw, nsLit(t))
    case LessThan(TsLiteral(t), NanosConversion(raw)) if rewritable(t) =>
      GreaterThanOrEqual(raw, nsLit(t + 1))
    case LessThanOrEqual(TsLiteral(t), NanosConversion(raw)) if rewritable(t) =>
      GreaterThanOrEqual(raw, nsLit(t))
    case EqualTo(TsLiteral(t), NanosConversion(raw)) if rewritable(t) =>
      And(GreaterThanOrEqual(raw, nsLit(t)), LessThan(raw, nsLit(t + 1)))
  }
}
