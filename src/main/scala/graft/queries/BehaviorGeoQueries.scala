package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.CdcChunkStarts

/** Round-6 behavior/geo wave: Markov transition matrix over per-user
  * event sequences, a grid-bucketed planar radius join (the spatial-join
  * shape without libm trig), and content-defined-chunk overlap dedup
  * (the CDC-based near-dup detector). Integer counts; divisions are
  * single float ops; distances are fixed-order multiply/add.
  */
object BehaviorGeoQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // First-order Markov transition matrix of event types: per-user
    // next-event via a KEY-PARTITIONED lead window (one hash shuffle,
    // never a global sort), then one grouped count over the tiny
    // |states|² matrix, row-normalized with a broadcast row-total join
    // — the behavioral model behind session simulation and anomaly
    // scoring. p is one exact division of two BIGINTs.
    QueryDef("markov_transitions", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tr = t("events")(s, dir)
        .withColumn("to_state", lead(col("event_type"), 1).over(w))
        .where(col("to_state").isNotNull)
        .groupBy(col("event_type").as("from_state"), col("to_state"))
        .agg(count(lit(1)).as("n"))
      val totals = tr.groupBy(col("from_state"))
        .agg(sum(col("n")).as("row_n"))
      tr.join(broadcast(totals), Seq("from_state"))
        .select(col("from_state"), col("to_state"), col("n"),
          (col("n").cast("double") / col("row_n")).as("p"))
        .orderBy(col("from_state"), col("to_state"))
    }, Some("""
      WITH tr AS (
        SELECT event_type AS from_state,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_state
        FROM events),
      c AS (
        SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
        FROM tr WHERE to_state IS NOT NULL GROUP BY 1, 2),
      rt AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS row_n
             FROM c GROUP BY 1)
      SELECT c.from_state, c.to_state, c.n,
             CAST(c.n AS DOUBLE) / rt.row_n AS p
      FROM c JOIN rt USING (from_state)
      ORDER BY from_state, to_state""")),

    // Grid-bucketed planar radius join: customers and suppliers carry
    // deterministic integer-derived coordinates on a 0.1-step grid;
    // each point buckets into a radius-sized cell, ONE side explodes
    // into its 3×3 neighborhood, and the cell equi-join guarantees no
    // pair within the radius is missed — the canonical spatial-join
    // decomposition (candidates scale with cell occupancy, never
    // |A|·|B|). Distance² is fixed-order multiply/add — no sqrt, no
    // trig, no libm — so the boundary set is bit-stable.
    QueryDef("geo_grid_join", (s, dir) => {
      val cust = t("customer")(s, dir).select(
        col("c_custkey"),
        (((col("c_custkey") * 37) % 1000).cast("double") / 10.0).as("cx"),
        (((col("c_custkey") * 73) % 1000).cast("double") / 10.0).as("cy"),
        expr("((c_custkey * 37) % 1000) DIV 20").as("gx"),
        expr("((c_custkey * 73) % 1000) DIV 20").as("gy"))
      val supp = t("supplier")(s, dir).select(
        col("s_suppkey"),
        (((col("s_suppkey") * 41) % 1000).cast("double") / 10.0).as("sx"),
        (((col("s_suppkey") * 79) % 1000).cast("double") / 10.0).as("sy"),
        expr("((s_suppkey * 41) % 1000) DIV 20").as("hx"),
        expr("((s_suppkey * 79) % 1000) DIV 20").as("hy"))
      val neigh = supp.select(col("s_suppkey"), col("sx"), col("sy"),
        explode(expr(
          "flatten(transform(sequence(-1, 1), dx -> " +
            "transform(sequence(-1, 1), dy -> " +
            "named_struct('gx', hx + dx, 'gy', hy + dy))))")).as("cell"))
        .select(col("s_suppkey"), col("sx"), col("sy"),
          col("cell.gx").as("gx"), col("cell.gy").as("gy"))
      cust.join(neigh, Seq("gx", "gy"))
        .withColumn("dist2",
          (col("cx") - col("sx")) * (col("cx") - col("sx")) +
            (col("cy") - col("sy")) * (col("cy") - col("sy")))
        .where(col("dist2") <= 4.0)
        .select(col("c_custkey"), col("s_suppkey"), col("dist2"))
        .orderBy(col("c_custkey"), col("s_suppkey"))
    }, Some("""
      WITH cust AS (
        SELECT c_custkey,
               CAST((c_custkey * 37) % 1000 AS DOUBLE) / 10.0 AS cx,
               CAST((c_custkey * 73) % 1000 AS DOUBLE) / 10.0 AS cy,
               ((c_custkey * 37) % 1000) // 20 AS gx,
               ((c_custkey * 73) % 1000) // 20 AS gy
        FROM customer),
      supp AS (
        SELECT s_suppkey,
               CAST((s_suppkey * 41) % 1000 AS DOUBLE) / 10.0 AS sx,
               CAST((s_suppkey * 79) % 1000 AS DOUBLE) / 10.0 AS sy,
               ((s_suppkey * 41) % 1000) // 20 AS hx,
               ((s_suppkey * 79) % 1000) // 20 AS hy
        FROM supplier)
      SELECT c_custkey, s_suppkey,
             (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS dist2
      FROM cust
      JOIN (SELECT s.*, s.hx + d.dx AS gx, s.hy + d.dy AS gy
            FROM supp s
            CROSS JOIN (SELECT dx, dy
                        FROM (SELECT unnest(generate_series(-1, 1)) AS dx) a
                        CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS dy) b) d) n
        USING (gx, gy)
      WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 4.0
      ORDER BY c_custkey, s_suppkey""")),

    // Content-defined-chunk overlap dedup: docs sharing ≥ 2 distinct
    // CDC chunk hashes are near-dup candidates — insertion-stable
    // boundaries mean a local edit changes only the chunks it touches,
    // so shared-chunk counting survives shifts that break fixed-window
    // shingles. One chunk-hash equi-join over distinct (doc, chunk)
    // postings (never doc×doc), the dedup-family doc_id cap.
    QueryDef("dedup_chunk_overlap", (s, dir) => {
      val docs = t("documents")(s, dir)
        .where(col("doc_id") < 1000 && length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          CdcChunkStarts(col("text")).as("__starts"))
      val chunks = docs
        .select(col("doc_id"), col("text"), col("__starts"),
          posexplode(col("__starts")).as(Seq("__i", "st")))
        .withColumn("en",
          coalesce(try_element_at(col("__starts"), col("__i") + lit(2)),
            length(col("text"))))
        .select(col("doc_id"),
          md5(expr("substr(text, st + 1, en - st)")).as("chunk_md5"))
        .distinct()
      chunks.as("a")
        .join(chunks.as("b"),
          col("a.chunk_md5") === col("b.chunk_md5") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("shared_chunks"))
        .where(col("shared_chunks") >= 2)
        .orderBy(col("id_a"), col("id_b"))
    }, Some("""
      WITH d AS (SELECT doc_id, text FROM documents
                 WHERE doc_id < 1000 AND length(text) > 0),
      pos AS (
        SELECT doc_id, text, unnest(range(4, length(text) + 1)) AS i FROM d),
      b AS (
        SELECT doc_id, i FROM pos
        WHERE ((((ord(substr(text, i - 3, 1)) * 31 + ord(substr(text, i - 2, 1))) * 31
                 + ord(substr(text, i - 1, 1))) * 31 + ord(substr(text, i, 1))) % 64) = 0
          AND i < length(text)),
      starts AS (
        SELECT doc_id, 0 AS st FROM d
        UNION ALL SELECT doc_id, i AS st FROM b),
      ch AS (
        SELECT doc_id, st,
               lead(st) OVER (PARTITION BY doc_id ORDER BY st) AS nxt
        FROM starts),
      chunks AS (
        SELECT DISTINCT c.doc_id,
               md5(substr(d.text, c.st + 1,
                 coalesce(c.nxt, length(d.text)) - c.st)) AS chunk_md5
        FROM ch c JOIN d ON c.doc_id = d.doc_id)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS shared_chunks
      FROM chunks a JOIN chunks b
        ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2
      ORDER BY id_a, id_b"""))
  )
}
