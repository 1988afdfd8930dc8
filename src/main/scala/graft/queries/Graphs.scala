package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Lineage
import graft.ops.Det._

/** Graph analytics over relational edge extractions (round 9, fifth
  * session) — the link-analysis family a web-corpus pipeline runs
  * beside dedup clustering: authority scoring (PageRank — the
  * quality-prior signal CommonCrawl-scale curation ranks domains by)
  * and triangle/clustering-structure censuses (community density,
  * spam-farm detection). llm_dedup_cluster already covers connected
  * components; these add the ITERATIVE-SCORING and LOCAL-STRUCTURE
  * primitives on a real multi-million-edge graph.
  *
  * The edge extraction is the adapter, not the semantics: the fixtures
  * carry no hyperlinks, so the graph is the part CO-PURCHASE graph
  * (parts sharing an order — 2.4 M directed edges / 20 k nodes at
  * sf0.1), standing in for the domain link graph with the same code
  * shape. Both operators keep every intermediate bounded the way the
  * 100 TB versions must: PageRank's per-node state is |nodes| rows
  * (broadcast as the per-iteration message table), never edge-sized;
  * the triangle census never materializes the O(Σ deg²) wedge set of
  * the FULL graph — it counts on a deterministically hash-sparsified
  * subgraph (DOULION, Tsourakakis et al. KDD'09) whose wedge volume
  * scales by p², and scales the count back by 1/p³.
  */
object Graphs {

  /** The undirected co-purchase edge set, one row per UNORDERED pair
    * (src < dst), distinct: parts that appear in the same order.
    * Materialized (Lineage.cut) — every caller reuses it for degree /
    * sparsify / census passes, and the cut is what keeps those passes
    * off the corpus.
    *
    * Built as ONE exchange, not a self-join: groupBy order →
    * sort_array(collect_set(part)) (map-side combined, ≤ 7 parts per
    * TPC-H-shaped order so the per-group state is bounded), then the
    * C(k,2) pairs expand INLINE via nested array transforms — the
    * sorted set makes src < dst by construction. The equivalent
    * self-join shuffles the fact table twice and materializes the
    * 2×-redundant join output first; the oracle keeps that plain-SQL
    * form, pinning the two constructions equal. A pathological
    * mega-order (k ~ 1e5 items) would make C(k,2) explode either way —
    * at web scale that's the salting/size-cap case, documented not
    * built (the fixture's fan-out is bounded by schema). */
  private def copurchaseEdges(s: org.apache.spark.sql.SparkSession,
                              d: String): DataFrame =
    Lineage.cut(Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1), y ->
          |    struct(x AS src, y AS dst))))""".stripMargin)).as("e"))
      .select(col("e.src"), col("e.dst"))
      .distinct())

  /** graph_pagerank — 3 synchronous PageRank iterations (d = 0.85) over
    * the SYMMETRIZED co-purchase graph, rank scaled by N (initial mass
    * 1.0 per node, update r' = 0.15 + 0.85·Σ_in r/outdeg) so magnitudes
    * stay O(1) and no global N constant is needed. Nodes are parts with
    * ≥ 1 co-purchase — in the symmetrized graph every node has
    * outdeg ≥ 1, so there is no dangling mass and the fixed iteration
    * count is an exact, engine-reproducible contract (the convergence
    * variant is one `while` away; llm_dedup_cluster already exercises
    * convergence-driven iteration with 1-row driver scalars).
    *
    * Scale shape: the per-iteration message table (node, rank/outdeg)
    * is |nodes| rows — broadcast into the edge join, so each iteration
    * is ONE corpus-sized shuffle (the groupBy dst over |edges| contribs)
    * and the edge set itself is Lineage.cut once and reused, never
    * recomputed per round (at web scale: nodes = domains ~1e8 rows ×
    * 16 B — past broadcast range the join falls back to SMJ on src,
    * same semantics; the per-round lineage cut is what keeps 50-round
    * jobs plannable either way).
    *
    * Determinism: contributions are r8'd (the 1e-4 grain would zero out
    * rank/600-degree messages) and summed as exact scaled DECIMAL(38,8)
    * integers — merge-order-free; 0.15 + 0.85·s and the final r8 are
    * identical IEEE expressions in both engines. */
  val graphPagerank: Q = (s, d) => {
    val und = copurchaseEdges(s, d)
    // symmetrize over the CUT pair set: both union branches re-read the
    // materialized RDD, never the corpus
    val edges = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
    val deg = Lineage.cut(
      edges.groupBy("src").agg(count(lit(1)).as("outd")))
      .select(col("src").as("node"), col("outd"))
    var rank: DataFrame = deg.select(col("node"), lit(1.0).as("rank"))
    for (_ <- 1 to 3) {
      val msgs = rank.join(deg, Seq("node"))
        .select(col("node").as("src"), r8(col("rank") / col("outd")).as("contrib"))
      val contribs = edges.join(broadcast(msgs), "src")
        .groupBy(col("dst").as("node"))
        .agg(sumR8(col("contrib")).as("s"))
      // symmetric graph: indeg == outdeg >= 1, so every node receives
      // mail every round — no zero-contrib outer-join case
      rank = Lineage.cut(
        contribs.select(col("node"),
          r8(lit(0.15) + lit(0.85) * col("s")).as("rank")))
    }
    rank.join(deg, Seq("node"))
      .select(col("node"), col("outd").as("degree"), col("rank"))
      .orderBy("node")
  }

  /** Deterministically sparsified triangle census (DOULION): keep each
    * undirected edge iff its md5 bucket < `pct` (the repo's standard
    * cross-engine hash-sampling rule — a FIXED subgraph, not a random
    * one, so both engines and every rerun count the same triangles),
    * count triangles on the kept subgraph by the oriented wedge join,
    * and scale back by (100/pct)³ — the unbiased DOULION estimator.
    * pct = 100 disables sparsification and counts exactly (the spec's
    * ground-truth arm). Exposed for GraphSpec; the registered query
    * fixes pct = 25 (wedge volume ÷16, estimate ÷64 grain).
    *
    * Orientation: edges are RE-ORIENTED low-degree → high-degree
    * (ties by id) before the wedge join — the classic compact-forward
    * bound: every node's oriented out-degree is O(√E), so wedge
    * fan-out at a power-law hub is O(E) total instead of O(deg²)
    * (a 1e6-degree hub under naive id-orientation enumerates ~5e11
    * wedges; degree-ordered, ≤ 2E). The triangle COUNT is invariant
    * under orientation and the sparsifier keys on the CANONICAL
    * (src < dst) pair before re-orienting, so the oracle's plain
    * id-oriented SQL counts the identical subgraph — the hash match
    * pins orientation-invariance every run. GraphSpec's hub test pins
    * correctness on a graph where the two orientations differ most. */
  def sparsifiedTriangles(edges: DataFrame, pct: Int): DataFrame = {
    val scale = (100.0 / pct) * (100.0 / pct) * (100.0 / pct)
    // callers pass an already-materialized (or trivially cheap) edge
    // frame — copurchaseEdges is Lineage.cut at construction, so the
    // census counts and the sparsify filter re-read the cut RDD; a
    // second cut here would double-buffer the full edge set (measured
    // ~600 MB of extra block churn at GraphScale ×30). Both census
    // counts join in LAZILY as broadcast 1-row aggregates — an eager
    // count() here would run a driver action at plan-construction time
    // (plan inspection, every bench pass) before the query itself.
    val keptU = Lineage.cut(edges.where(
      conv(substring(md5(concat_ws("_", col("src"), col("dst"))), 1, 6),
        16, 10).cast("long") % 100 < pct))
    // undirected degree on the KEPT subgraph (|nodes| rows, broadcast),
    // then re-orient each pair from the (degree, id)-smaller endpoint
    val deg = keptU.select(col("src").as("n"))
      .union(keptU.select(col("dst").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val kept = Lineage.cut(keptU
      .join(broadcast(deg.select(col("n").as("src"), col("dg").as("ds"))), "src")
      .join(broadcast(deg.select(col("n").as("dst"), col("dg").as("dd"))), "dst")
      .select(
        when(col("ds") < col("dd") ||
             (col("ds") === col("dd") && col("src") < col("dst")),
          col("src")).otherwise(col("dst")).as("src"),
        when(col("ds") < col("dd") ||
             (col("ds") === col("dd") && col("src") < col("dst")),
          col("dst")).otherwise(col("src")).as("dst")))
    val tri = kept.as("e1")
      .join(kept.as("e2"), col("e1.dst") === col("e2.src"))
      .join(kept.as("e3"),
        col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
      .agg(count(lit(1)).as("n_sampled"))
    tri.select(col("n_sampled"),
      r4(col("n_sampled") * lit(scale)).as("est_triangles"),
      lit(pct).cast("long").as("sample_pct"))
      .crossJoin(broadcast(
        kept.agg(count(lit(1)).as("edges_kept"))))
      .crossJoin(broadcast(
        edges.agg(count(lit(1)).as("edges_total"))))
  }

  /** graph_triangles — triangle count of the co-purchase graph via the
    * DOULION hash-sparsified estimator at pct = 25. The full sf0.1
    * graph holds 1.88 M triangles behind a ~49 M-row wedge set; the
    * p = 0.25 subgraph cuts the wedge join to ~1/16 volume while the
    * 1/p³ = 64× scale-back keeps the estimate unbiased (GraphSpec pins
    * the estimator against the exact count on synthetic cliques and
    * pins pct = 100 ≡ brute force). At 100 TB, p is the memory/accuracy
    * dial — variance falls as triangles grow, exactly the regime where
    * exact counting dies first. The oracle mirrors the md5 rule, so the
    * sampled count is exact-checked cross-engine, not just the scaled
    * estimate. */
  val graphTriangles: Q = (s, d) =>
    sparsifiedTriangles(copurchaseEdges(s, d), 25)

  val queries: Map[String, Q] = Map(
    "graph_pagerank"  -> graphPagerank,
    "graph_triangles" -> graphTriangles,
  )

  private val edgeSql =
    """SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey""".stripMargin

  private def prIter(prev: String, out: String): String =
    s"""c$out AS (
       | SELECT e.dst AS node, ${sumR8Sql("r.rank / d.outd")} AS s
       | FROM e JOIN r$prev r ON e.src = r.node JOIN deg d ON e.src = d.src
       | GROUP BY e.dst),
       |r$out AS (SELECT node, ${r8Sql("0.15 + 0.85 * s")} AS rank FROM c$out)"""
      .stripMargin

  val oracle: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH und AS ($edgeSql),
        |e AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
        |deg AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
        |r0 AS (SELECT src AS node, 1.0 AS rank FROM deg),
        |${prIter("0", "1")},
        |${prIter("1", "2")},
        |${prIter("2", "3")}
        |SELECT d.src AS node, d.outd AS degree, r.rank
        |FROM deg d JOIN r3 r ON r.node = d.src
        |ORDER BY node""".stripMargin,
    "graph_triangles" ->
      s"""WITH e0 AS ($edgeSql),
        |k AS (SELECT src, dst FROM e0
        |      WHERE CAST(('0x' || substr(md5(CAST(src AS VARCHAR) || '_' ||
        |            CAST(dst AS VARCHAR)), 1, 6)) AS BIGINT) % 100 < 25),
        |t AS (SELECT count(*) AS n_sampled
        |      FROM k e1 JOIN k e2 ON e1.dst = e2.src
        |      JOIN k e3 ON e3.src = e1.src AND e3.dst = e2.dst)
        |SELECT n_sampled, ${r4Sql("n_sampled * 64.0")} AS est_triangles,
        | CAST(25 AS BIGINT) AS sample_pct,
        | (SELECT count(*) FROM k) AS edges_kept,
        | (SELECT count(*) FROM e0) AS edges_total
        |FROM t""".stripMargin,
  )
}
