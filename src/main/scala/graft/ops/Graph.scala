package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-graph analytics for crawl curation: PageRank over a link graph
  * (Brin & Page 1998) — the domain-authority signal crawl frontiers and
  * quality-weighted mixes prioritize by.
  *
  * Determinism contract: ranks are kept as integer MICRO-UNITS (1e6 ×
  * rank) and every per-edge contribution is quantized with
  * `floor(damping * r / outdeg + 0.5)` — pure IEEE ops on exact integers,
  * so a fixed iteration count replays bit-for-bit on any engine (the q59
  * DuckDB oracle unrolls the same 10 iterations as chained CTEs).
  *
  * Scale shape: per iteration, ONE shuffle pair — the rank join keyed on
  * src and the contribution aggregate keyed on dst (map-side combined;
  * only (id, 8-byte micro-rank) rows ride either exchange). The
  * edge+outdeg frame is persisted once and reused across iterations; at
  * production scale it would be bucket-materialized on src so the
  * rank join is co-located every round. Dangling-node mass leaks (the
  * standard simplification) — callers wanting strict stochasticity
  * should pre-filter or self-loop dangling nodes.
  */
object Graph {

  /** PageRank over `edges` (multi-edges count as parallel links).
    * Returns (id, rank_micro, rank) for every node appearing as a source
    * or destination. Fixed `iterations` (no convergence action), so the
    * whole computation is one lazy plan materialized once at the end. */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1)
    val e = edges.select(
        col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ewd = e.join(deg, Seq("src")).persist() // reused every iteration
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist()                     // reused every iteration
    val cnt = broadcast(nodes.agg(count(lit(1)).as("n")))
    var ranks = nodes.crossJoin(cnt)
      .select(col("id"), floor(lit(1e6) / col("n") + lit(0.5)).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = ewd
        .join(ranks.select(col("id").as("src"), col("r")), Seq("src"))
        .select(col("dst").as("id"),
          floor(lit(damping) * col("r") / col("deg") + lit(0.5)).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.join(contrib, Seq("id"), "left").crossJoin(cnt)
        .select(col("id"),
          (floor(lit(1.0 - damping) * lit(1e6) / col("n") + lit(0.5)) +
            coalesce(col("contrib"), lit(0L))).as("r"))
    }
    // one eager materialization truncates the 10-iteration lineage; no
    // storage blocks stay pinned for the caller (the EvalJob lesson)
    val out = ranks
      .select(col("id"), col("r").as("rank_micro"), (col("r") / lit(1e6)).as("rank"))
      .localCheckpoint(true)
    ewd.unpersist()
    nodes.unpersist()
    out
  }

  /** HITS hubs & authorities (Kleinberg 1999) — the complementary
    * authority signal to [[pageRank]]: a page is a good AUTHORITY if good
    * hubs link to it, a good HUB if it links to good authorities (link
    * directories vs linked-to content — crawl seeding wants both lists).
    *
    * Same determinism contract as [[pageRank]]: scores live in integer
    * micro-units, and each half-iteration L1-normalizes with
    * `floor(raw * 1e6 / total + 0.5)` (L1, not the textbook L2 — sqrt is
    * transcendental and NOT bit-replayable cross-engine; L1 preserves the
    * same ordering and fixed point direction). Raw sums must stay below
    * 2^53/1e6 for the double math to be exact — at web scale, normalize
    * more often or widen to nano-units.
    *
    * Scale shape: per iteration TWO shuffle pairs (auth pass keyed on
    * dst, hub pass keyed on src; only 8-byte micro-scores ride them) plus
    * two 1-row total aggregates that broadcast back — no driver collect.
    * Returns (id, auth_micro, hub_micro, auth, hub) for every node. */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8): DataFrame = {
    require(iterations >= 1)
    val e = edges.select(
        col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull).persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist()
    // propagate scores across edges from `fromCol` endpoints to `toCol`
    // endpoints, then L1-normalize back to ~1e6 total micro-units
    def prop(x: DataFrame, fromCol: String, toCol: String): DataFrame = {
      val raw = e.join(x.select(col("id").as(fromCol), col("v")), Seq(fromCol))
        .groupBy(col(toCol).as("id")).agg(sum(col("v")).as("raw"))
      val tot = broadcast(raw.agg(sum(col("raw")).as("t")))
      nodes.join(raw, Seq("id"), "left").crossJoin(tot)
        .select(col("id"),
          floor(coalesce(col("raw"), lit(0L)) * lit(1e6) / col("t") + lit(0.5)).as("v"))
    }
    var h = nodes.select(col("id"), lit(1000000L).as("v"))
    var a = h
    for (_ <- 1 to iterations) {
      // each half-iteration references its input TWICE (the L1 total and
      // the propagate join) — without truncating lineage the plan DOUBLES
      // per half-iteration and execution goes exponential in `iterations`
      // (measured: 45s for 3 iterations on 300 nodes). An eager
      // localCheckpoint of the tiny (id, v) frame keeps both planning and
      // execution linear, like pageRank's single-reference chain.
      a = prop(h, "src", "dst").localCheckpoint(true)
      h = prop(a, "dst", "src").localCheckpoint(true)
    }
    val out = a.select(col("id"), col("v").as("auth_micro"))
      .join(h.select(col("id"), col("v").as("hub_micro")), Seq("id"))
      .select(col("id"), col("auth_micro"), col("hub_micro"),
        (col("auth_micro") / lit(1e6)).as("auth"),
        (col("hub_micro") / lit(1e6)).as("hub"))
      .localCheckpoint(true)
    e.unpersist()
    nodes.unpersist()
    out
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — community
    * detection over the (undirected) link graph: each round every node
    * adopts the most frequent label among its neighbors AND itself, ties
    * breaking to the smallest label. The self-vote keeps the synchronous
    * schedule from oscillating on bipartite subgraphs (the classic LPA
    * failure mode) and, with the min tie-break, makes a fixed round count
    * fully deterministic — no random visit order, so the q99 DuckDB
    * oracle replays every round exactly. Communities ≈ domains/mirror
    * clusters; coarser than [[pageRank]] scores, finer than connected
    * components (a bridge edge does not merge two dense clusters).
    *
    * Scale shape: per round, one join keyed on the neighbor endpoint and
    * one (node, label) count aggregate (map-side combined) topped by a
    * rank-1 window filter that Catalyst rewrites to a map-side
    * WindowGroupLimit (SPARK-37099) — only (id, label, count) triples
    * ride any exchange. The symmetrized edge frame persists across
    * rounds. Returns (id, community). */
  def labelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iterations >= 1)
    val e0 = edges.select(
        col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    val e = e0.union(e0.select(col("b").as("a"), col("a").as("b"))).persist()
    var lbl = e.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    val w = Window.partitionBy(col("id")).orderBy(col("c").desc, col("lbl"))
    for (_ <- 1 to iterations) {
      val votes = e.join(lbl.select(col("id").as("b"), col("lbl")), Seq("b"))
        .select(col("a").as("id"), col("lbl"))
        .union(lbl)
      // two references per round (neighbor join + self-vote union): eager
      // checkpoint keeps the round chain linear (see hits)
      lbl = votes.groupBy(col("id"), col("lbl")).agg(count(lit(1)).as("c"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 1) // <= 1: the InferWindowGroupLimit spelling
        .select(col("id"), col("lbl"))
        .localCheckpoint(true)
    }
    val out = lbl.select(col("id"), col("lbl").as("community"))
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** Edge RECIPROCITY per source node — the link-exchange signal: organic
    * links are overwhelmingly one-way, so a host whose out-edges are
    * mostly reciprocated ("you link me, I link you") reads as a link
    * ring, the spam family PageRank (T41) rewards instead of catching.
    * Self-loops dropped, multi-edges collapsed; per source: distinct
    * out-edges, how many have the reverse edge present, and the exact
    * micro share. Returns (src, n_out, n_recip, recip_micro).
    *
    * Scale shape: one distinct on (src, dst), then the reverse join is
    * the SAME relation keyed the other way — an equi-join on (src, dst)
    * vs (dst, src), 2-key rows only — and one map-combined src
    * aggregate. Nothing wider than two ids ever shuffles. */
  def reciprocity(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
      .withColumn("__r", lit(1L))
    e.join(rev, Seq("src", "dst"), "left")
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_out"),
        sum(coalesce(col("__r"), lit(0L))).as("n_recip"))
      .select(col("src"), col("n_out"), col("n_recip"),
        expr("n_recip * 1000000 div n_out").as("recip_micro"))
  }

  /** CO-CITATION similarity — the crawl-seed expansion move (Dean &
    * Henzinger 1999: pages/hosts frequently linked from the same
    * documents are related): for every pair of sources that share a
    * link target, count how many targets they share; high-overlap pairs
    * of a known-good seed are candidate seeds. Returns the global top-k
    * pairs (src_a < src_b) under the total order (shared desc, src_a
    * asc, src_b asc): (src_a, src_b, shared).
    *
    * Scale shape: the quadratic danger is per-TARGET fan-out (a
    * google.com-like target linked by 10^6 sources would emit 10^12
    * pairs) — so each target's source list is capped at `maxFanout`
    * FIRST (deterministic: the maxFanout smallest sources, a
    * [[Curation.capPerKey]] rank filter that SPARK-37099 prunes
    * map-side), bounding the pair blow-up at F(F−1)/2 per target.
    * Hub targets also carry the least signal — everyone links them —
    * which is why dropping their tails is the published heuristic, not
    * a concession. One exchange on dst (2-id rows), the capped
    * within-dst self-join, one map-combined pair aggregate, and a
    * TakeOrdered top-k (no global sort). */
  def coCitation(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxFanout: Int = 64, k: Int = 20): DataFrame = {
    require(maxFanout >= 2 && k >= 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val capped = Curation.capPerKey(e, "dst", "src", maxFanout)
    val a = capped.select(col("dst"), col("src").as("src_a"))
    val b = capped.select(col("dst"), col("src").as("src_b"))
    a.join(b, Seq("dst")).filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared"))
      .orderBy(col("shared").desc, col("src_a").asc, col("src_b").asc)
      .limit(k)
  }
}
