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
}
