package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding clustering for semantic curation: Lloyd k-means (the
  * SemDeDup / cluster-balanced-sampling stage — Abbas et al. 2023 cluster
  * embeddings, then dedup or sample within clusters).
  *
  * Determinism contract: vectors are quantized ONCE to integer
  * micro-units (`floor(x * 1e6 + 0.5)` per dimension), after which every
  * distance is EXACT 64-bit integer arithmetic — no float protocol at
  * all — and every centroid update is an exact integer sum followed by
  * one floor-quantized division. Ties (equal distances) break to the
  * smallest centroid id. A fixed iteration count therefore replays
  * bit-for-bit on any engine; the q61 DuckDB oracle unrolls the same
  * iterations as chained CTEs.
  *
  * Scale shape per iteration: centroids are a k-row broadcast (the IVF
  * probe pattern) — the corpus-side distance pass is NARROW; the argmin
  * aggregate ships only (id, best d2, cid); the centroid update explodes
  * dimensions AFTER an id-only re-join and aggregates on (cid, dim) —
  * k×dim cells regardless of corpus size. Cluster ids are the seed
  * vector ids (k smallest), so labels are stable and no renumbering pass
  * exists. Empty clusters drop out (standard Lloyd behavior).
  */
object Clustering {

  /** Assign every vector to one of `k` Lloyd-iterated centroids.
    * Returns (id, cid, d2): cluster id (= seed vector id) and the exact
    * micro-unit squared distance under the final centroids. `iterations`
    * counts assignment rounds; centroids update between rounds. */
  def kmeansAssign(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iterations: Int = 3): DataFrame = {
    require(k >= 1 && iterations >= 1)
    val v = emb
      .where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => floor(x.cast("double") * lit(1e6) + lit(0.5))).as("vm"))
      .persist() // quantized once, reused by every round and the update re-join
    // seeds: the k smallest ids (TakeOrdered — no global sort), labels = ids
    var cents = v.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("vm").as("cm"))
    var asg: DataFrame = null
    for (i <- 1 to iterations) {
      // narrow distance pass: k-row broadcast, exact integer fold
      val scored = v.crossJoin(broadcast(cents))
        .select(col("id"), col("cid"),
          aggregate(zip_with(col("vm"), col("cm"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d2"))
      // argmin with deterministic ties: lexicographic struct min
      asg = scored.groupBy(col("id"))
        .agg(min(struct(col("d2"), col("cid"))).as("__m"))
        .select(col("id"), col("__m.cid").as("cid"), col("__m.d2").as("d2"))
      if (i < iterations) {
        // exact integer centroid update: id-only re-join, (cid, dim) cells
        val sums = v.join(asg.select("id", "cid"), Seq("id"))
          .select(col("cid"), posexplode(col("vm")).as(Seq("dim", "x")))
          .groupBy(col("cid"), col("dim"))
          .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
        cents = sums
          .select(col("cid"), col("dim"),
            floor(col("sx") / col("cnt") + lit(0.5)).as("cx"))
          .groupBy(col("cid"))
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("cx")))),
            s => s.getField("cx")).as("cm"))
      }
    }
    val out = asg.localCheckpoint(true)
    v.unpersist()
    out
  }

  /** Product-quantization encode (Jégou et al. 2011): split every vector
    * into `m` contiguous subspaces of `dims / m` dimensions, Lloyd-cluster
    * each subspace INDEPENDENTLY with [[kmeansAssign]]'s exact-integer
    * protocol, and emit one row per (vector, subspace): the nearest
    * sub-centroid id (the PQ code — log2(k) bits per subspace instead of
    * 32·dims/m float bits) and the exact micro-unit quantization error.
    * Codes are seed vector ids, so the whole code table replays
    * bit-for-bit (the q82 oracle unrolls every subspace's Lloyd rounds).
    * Returns (id, sub, cid, d2).
    *
    * Scale shape: m independent kmeans jobs, each inheriting
    * [[kmeansAssign]]'s shape — k-row centroid broadcasts, narrow
    * distance passes, (cid, dim) update cells; the union is lazy, no
    * extra exchange. */
  def pqCodes(
      emb: DataFrame, idCol: String, vecCol: String, dims: Int,
      m: Int = 2, k: Int = 4, iterations: Int = 2): DataFrame = {
    require(m >= 1 && dims % m == 0, s"dims=$dims must split evenly into m=$m subspaces")
    val sublen = dims / m
    (0 until m).map { s =>
      val sub = emb.where(col(vecCol).isNotNull)
        .select(col(idCol).as("id"), slice(col(vecCol), s * sublen + 1, sublen).as("v"))
      kmeansAssign(sub, "id", "v", k, iterations)
        .select(col("id"), lit(s).as("sub"), col("cid"), col("d2"))
    }.reduce(_ unionByName _)
  }
}
