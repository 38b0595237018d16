package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified Bernoulli sampling for training-data curation:
  * keep a row iff `md5(stratum ":" key) mod 100 < pct(stratum)` — e.g.
  * downsample boilerplate web text hard, keep rare languages at 100%.
  *
  * Like [[Splits]], the decision is a pure function of the row: stable
  * across runs, re-shards, and engines (the DuckDB oracle computes the
  * identical predicate), needs no seed distribution or sampling state,
  * and is a narrow filter — no shuffle, pushes down like any predicate.
  * Seeding the hash with the stratum name decorrelates it from other
  * md5-derived assignments on the same key (a row's split bucket and its
  * sample bucket are independent).
  */
object Sampling {

  def sampleBucket(strata: Column, key: Column): Column =
    conv(substring(md5(concat(strata, lit(":"), key.cast("string"))), 1, 8), 16, 10)
      .cast("bigint") % 100

  /** Filter to the per-stratum percentages in `pct`; strata not listed
    * keep `defaultPct` percent.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           pct: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((pct.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "percentages must be in [0, 100]")
    val rate = pct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.where(sampleBucket(col(strataCol), col(keyCol)) < rate)
  }

  /** Temperature sampling at α = ½: keep each row of group g with
    * probability p_g = (num/den) · N·w_g / (Σw·n_g) where w_g = ⌊√n_g⌋ —
    * the group-size flattening used to build multilingual / multi-source
    * pre-training mixes (rare groups oversampled relative to their share,
    * dominant groups downsampled; expected output ≈ (num/den)·N rows).
    * p_g > 1 degenerates to keeping the whole group.
    *
    * The decision is ALL integer arithmetic — because a double Σ√n
    * would make boundary rows depend on float summation order across
    * engines and partitions. ⌊√n⌋ itself is exact for any realistic n
    * (n < 2⁵², one IEEE sqrt). The per-GROUP threshold is folded once,
    * on the |groups|-row counts table, into
    * `p24_g = min(⌈num·N·w_g·2²⁴ / (den·Σw·n_g)⌉, 2²⁴)` — exact ceil
    * division in DECIMAL(38,0) (the products stay ≤ ~10³⁶ even at
    * 10¹³ total rows), and for integer u, `u < x ⟺ u < ⌈x⌉`. The
    * per-ROW test is then a single BIGINT comparison `hash24 < p24` —
    * no four-factor product that would overflow BIGINT at ~10⁷-row
    * groups (the prior form's silent-wrap hazard), and less per-row
    * work.
    *
    * Scale: one tiny grouped count broadcast back, then a narrow filter —
    * the only shuffle is the per-group count's.
    */
  def temperatureSample(df: DataFrame, keyCol: String, groupCol: String,
                        seed: String, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0, "target fraction num/den must be positive")
    val reserved = Seq("__n", "__w", "__totw", "__nn", "__p24")
    require(!df.columns.exists(c => reserved.contains(c.toLowerCase)),
      s"input must not carry reserved columns ${reserved.mkString(", ")}")
    // Σw and N via a broadcast 1-row aggregate over the per-group counts
    // (the mixturePlan pattern) — never a partition-less window, which
    // would single-partition the frame and spam WindowExec warnings.
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n"))).cast("long"))
    val tot = per.agg(sum(col("__w")).as("__totw"), sum(col("__n")).as("__nn"))
    val dec = "decimal(38,0)"
    val counts = per.crossJoin(broadcast(tot))
      .withColumn("__cd",
        lit(den.toLong).cast(dec) * col("__totw") * col("__n"))
      .withColumn("__cn",
        lit(num.toLong).cast(dec) * col("__nn") * col("__w") * lit(1L << 24)
          + col("__cd") - lit(1))
      .withColumn("__p24",
        least(expr("__cn div __cd"), lit(1L << 24)).cast("long"))
      .select(col(groupCol), col("__p24"))
    val hash24 = conv(substring(md5(concat(lit(seed), lit(":"),
      col(keyCol).cast("string"))), 1, 6), 16, 10).cast("bigint")
    df.join(broadcast(counts), Seq(groupCol))
      .where(hash24 < col("__p24"))
      .select(df.columns.map(col): _*) // the join moved the key first
  }

  /** Exact k-per-group uniform sample ("reservoir" semantics, made
    * deterministic): keep the k rows of each group whose seeded 48-bit
    * md5 hash is smallest — a uniform without-replacement draw that is a
    * pure function of (seed, id), so it is stable across runs, re-shards,
    * and engines. Implemented with the bounded
    * [[graft.expressions.TopKAgg]] aggregate (score = −hash), NOT a
    * `row_number() OVER` window: the window formulation shuffles and
    * sorts EVERY row of every group, while the aggregate's partial state
    * is ≤2k entries per (partition, group) — at 100 TB the shuffle
    * carries O(groups·k), not O(rows). 48 bits so the hash is exact in
    * the aggregate's double score (< 2⁵³).
    *
    * Output: (group, rn 1..k in hash order, id, h48) — `rn` is a stable
    * sample-slot number; a group with fewer than k rows keeps them all.
    */
  def reservoirPerGroup(df: DataFrame, groupCol: String, idCol: String,
                        k: Int, seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    val h48 = conv(substring(md5(concat(lit(seed), lit(":"),
      col(idCol).cast("string"))), 1, 12), 16, 10).cast("bigint")
    val entry = struct((-h48).cast("double").as("score"),
      col(idCol).cast("long").as("id"))
    df.groupBy(col(groupCol))
      .agg(graft.expressions.TopKAgg.topK(entry, k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col(groupCol),
        (col("__pos") + 1).cast("int").as("rn"),
        col("__e.id").as(idCol),
        (-col("__e.score")).cast("bigint").as("h48"))
  }

  /** Weighted k-per-group sample WITHOUT replacement via priority
    * sampling (Duffield–Lund–Thorup, JACM 2007): each row draws
    * u = (h48+1)/2⁴⁸ from its seeded 48-bit md5 hash and gets priority
    * q = w/u; the k highest-priority rows are the sample (heavier rows →
    * larger q → sampled more often, inclusion probability ∝ weight for
    * rows below the threshold). The training-data use is quality- or
    * length-weighted subsampling of a corpus.
    *
    * Deliberately libm-free so the DuckDB oracle is bit-exact: u is an
    * exact dyadic rational (an integer ≤2⁴⁸ divided by 2⁴⁸ — exact in
    * double), and q is ONE IEEE division — no ln/pow/exp, whose
    * last-ulp behavior differs across engines. The Efraimidis–Spirakis
    * u^(1/w) key would need `pow`; priority sampling gives the same
    * weighted-without-replacement contract on arithmetic alone.
    *
    * Same bounded-state [[graft.expressions.TopKAgg]] tail as
    * [[reservoirPerGroup]]: partial state ≤2k entries per (partition,
    * group), shuffle carries O(groups·k) — never the corpus, never a
    * per-group window sort.
    *
    * Output: (group, rn 1..k in priority order, id, priority).
    */
  /** The priority-sampling key q = w/u with u = (md5-h48 + 1)/2⁴⁸ — the
    * ONE construction shared by [[priorityPerGroup]] and the budgeted
    * admission query (`mixture_priority_sample`), and mirrored verbatim
    * by their oracles: seed separator ':', 12 hex chars, +1 offset, the
    * 2⁴⁸ constant. Change it here and every user (and its SQL mirror)
    * must move together.
    */
  def priorityKey(seed: String, id: Column, weight: Column): Column = {
    val h48 = conv(substring(md5(concat(lit(seed), lit(":"),
      id.cast("string"))), 1, 12), 16, 10).cast("bigint")
    val u = (h48 + lit(1L)).cast("double") / lit(281474976710656.0)
    weight.cast("double") / u
  }

  def priorityPerGroup(df: DataFrame, groupCol: String, idCol: String,
                       weight: Column, k: Int, seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    val entry = struct(priorityKey(seed, col(idCol), weight).as("score"),
      col(idCol).cast("long").as("id"))
    df.groupBy(col(groupCol))
      .agg(graft.expressions.TopKAgg.topK(entry, k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col(groupCol),
        (col("__pos") + 1).cast("int").as("rn"),
        col("__e.id").as(idCol),
        col("__e.score").as("priority"))
  }

  /** Epoch plan for a target token mixture: for each source, the number
    * of full passes (epochs) needed to supply its share of `budget`
    * tokens — epochs_s = ⌈budget·w_s / (Σw · tokens_s)⌉, exact integer
    * ceil-division. `tokensCol` is a per-row token-count expression,
    * `weight` an integer mixture-weight expression over the aggregated
    * (source, n_docs, tokens) row. One grouped agg over the corpus; the
    * plan table is |sources| rows.
    */
  def mixturePlan(df: DataFrame, sourceCol: String, tokensCol: Column,
                  weight: Column, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val per = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("tokens"))
      .withColumn("weight", weight.cast("long"))
    val tot = per.agg(sum(col("weight")).as("__totw"))
    per.crossJoin(broadcast(tot))
      .withColumn("__num", lit(budget) * col("weight") +
        col("__totw") * col("tokens") - 1)
      .withColumn("__den", col("__totw") * col("tokens"))
      .withColumn("epochs", expr("__num div __den"))
      .drop("__totw", "__num", "__den")
  }
}
