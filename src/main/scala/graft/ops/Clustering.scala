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
      k: Int = 8, iterations: Int = 3): DataFrame =
    kmeansFit(emb, idCol, vecCol, k, iterations)._1

  /** [[kmeansAssign]] plus the FINAL centroid table (cid, cm) the
    * assignment ran against — what a codebook consumer (PQ asymmetric
    * distance, IVF-style probing) needs. The centroid frame is LAZY and
    * ≤ k rows: callers that ignore it (kmeansAssign) pay nothing; callers
    * that use it typically `collect()` it into a lookup structure. */
  def kmeansFit(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iterations: Int = 3): (DataFrame, DataFrame) = {
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
    // cents stays lazy: materializing it after unpersist recomputes the
    // quantization pass once — only paid by callers that actually read it
    v.unpersist()
    (out, cents)
  }

  /** Asymmetric-distance (ADC) top-`topK` search over PQ codes (Jégou et
    * al. 2011 §III): the query keeps its EXACT micro-unit subvectors; each
    * corpus vector is approximated by its per-subspace code centroid, so
    * the distance estimate is one k×m lookup-table probe per corpus row —
    * the search mode that makes PQ usable at 10^10 vectors (no float
    * vector is ever touched at query time). Returns (vec_id, est_d2)
    * top-`topK` under (est_d2 asc, id asc).
    *
    * Scale shape: the LUT is k·m rows built from two bounded collects
    * (centroids + the query's slices — the IVF codebook pattern) and
    * broadcast; the corpus side is its code table (one narrow pass per
    * subspace from [[pqCodes]]' shape) → broadcast LUT join → one
    * id-keyed map-combined aggregate → TakeOrdered. */
  def pqAdcTopK(
      emb: DataFrame, idCol: String, vecCol: String, dims: Int,
      queryId: Long, topK: Int = 10,
      m: Int = 2, k: Int = 4, iterations: Int = 2): DataFrame = {
    require(m >= 1 && dims % m == 0 && topK >= 1)
    val spark = emb.sparkSession
    import spark.implicits._
    val sublen = dims / m
    val parts = (0 until m).map { s =>
      val sub = emb.where(col(vecCol).isNotNull)
        .select(col(idCol).as("id"), slice(col(vecCol), s * sublen + 1, sublen).as("v"))
      val (asg, cents) = kmeansFit(sub, "id", "v", k, iterations)
      // exact query slice in the same micro-unit quantization (Spark's
      // floor() is LongType, so centroid vectors are integer arrays)
      val qm = sub.where(col("id") === queryId).head.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray
      val lut = cents.collect().map { r =>
        val cm = r.getSeq[Long](1)
        var d2 = 0L
        var j = 0
        while (j < qm.length) { val d = qm(j) - cm(j); d2 += d * d; j += 1 }
        (s, r.getLong(0), d2)
      }
      (asg.select(col("id"), lit(s).as("sub"), col("cid")), lut)
    }
    val codes = parts.map(_._1).reduce(_ unionByName _)
    val lutDf = broadcast(parts.flatMap(_._2).toDF("sub", "cid", "qd2"))
    codes.join(lutDf, Seq("sub", "cid"))
      .groupBy(col("id"))
      .agg(sum(col("qd2")).as("est_d2"))
      .orderBy(col("est_d2").asc, col("id").asc).limit(topK)
      .select(col("id").as("vec_id"), col("est_d2"))
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

  /** SemDeDup (Abbas et al. 2023 §3): cluster embeddings with the
    * exact-integer k-means above, then within each cluster DROP every
    * vector that has a lower-id cluster-mate with cosine ≥ `threshold`
    * — the deterministic keep-first-occurrence rule, so reruns, engines,
    * and cluster sizes all agree on which copy survives. Pairs that LSH
    * banding would have to hash for, clustering localizes instead: the
    * pairwise pass is quadratic only WITHIN a cluster, and the paper's
    * design point is that k grows with the corpus so cluster sizes stay
    * bounded (|c| ≈ n/k rows each, scored independently in parallel).
    *
    * Returns (id, cid, keep): keep = 1 iff no lower-id near-dup mate.
    * Near-dups in DIFFERENT clusters are not compared — the documented
    * recall tradeoff that makes SemDeDup feasible at 10^9+ vectors.
    *
    * Scale shape: the pair stage is a cid equi-join (never a cartesian);
    * vectors ride that exchange once per side — unavoidable, the score
    * needs them — but the dup-id aggregate and the final keep decision
    * re-join by 8-byte ids only. Cosine is [[Similarity.cosine]]'s
    * sequential double fold, so the q91 DuckDB oracle replays every
    * decision bit-for-bit on top of the q61 Lloyd unroll. */
  def semDedup(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int = 8, iterations: Int = 3): DataFrame = {
    val asg = kmeansAssign(emb, idCol, vecCol, k, iterations)
    val vecs = emb.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val m = asg.select("id", "cid").join(vecs, Seq("id"))
    val dups = m.select(col("cid"), col("id").as("id_a"), col("v").as("va"))
      .join(m.select(col("cid"), col("id").as("id_b"), col("v").as("vb")), Seq("cid"))
      .filter(col("id_b") < col("id_a") &&
        Similarity.cosine(col("va"), col("vb")) >= lit(threshold))
      .select(col("id_a").as("id"))
      .distinct()
    asg.join(dups.withColumn("__dup", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cid"), col("__dup").isNull.cast("long").as("keep"))
  }

  /** Pairwise cosine similarity between per-key embedding CENTROIDS —
    * "how close are these sources/classes semantically", the matrix that
    * drives mix design (near-identical sources get merged weights) and
    * label sanity checks (two classes whose centroids cosine at 0.99
    * are one class). Exact protocol: vectors quantize to integer
    * micro-units, per-dim centroid = floor(sum/n + 0.5) (exact double
    * division of exact integers), dot/norms are EXACT LONG sums (64
    * dims × 10^12/cell ≈ 6·10^13 < 2^53), and the one float step —
    * dot / (√na·√nb), correctly-rounded sqrts — quantizes to micro.
    *
    * Scale shape: one map-combined (key, dim) sum, centroids assembled
    * with an ordered fold per key (k·d rows total), then a k² pair join
    * on the TINY centroid table (whitelisted crossJoin shape). Returns
    * (key_a, key_b, sim_micro) with key_a < key_b. */
  def centroidSimilarity(
      df: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    val cells = df.select(col(keyCol).as("key"),
        transform(col(vecCol), x => floor(x.cast("double") * lit(1e6) + lit(0.5))).as("vm"))
      .select(col("key"), posexplode(col("vm")).as(Seq("dim", "v")))
      .groupBy(col("key"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("key"), col("dim"), floor(col("s") / col("n") + lit(0.5)).as("c"))
    val cents = cells.groupBy(col("key"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        p => p.getField("c")).as("cv"))
    val a = cents.select(col("key").as("key_a"), col("cv").as("ca"))
    val b = cents.select(col("key").as("key_b"), col("cv").as("cb"))
    a.crossJoin(b).where(col("key_a") < col("key_b"))
      .withColumn("__dot", expr(
        "aggregate(zip_with(ca, cb, (x, y) -> x * y), 0L, (acc, t) -> acc + t)"))
      .withColumn("__na", expr(
        "aggregate(zip_with(ca, ca, (x, y) -> x * y), 0L, (acc, t) -> acc + t)"))
      .withColumn("__nb", expr(
        "aggregate(zip_with(cb, cb, (x, y) -> x * y), 0L, (acc, t) -> acc + t)"))
      .withColumn("sim_micro",
        when(col("__na") === 0L || col("__nb") === 0L, 0L)
          .otherwise(floor(col("__dot") * lit(1e6) /
            (sqrt(col("__na")) * sqrt(col("__nb"))) + lit(0.5))))
      .select(col("key_a"), col("key_b"), col("sim_micro"))
  }

  /** Intra-cluster dispersion: per key, the mean squared distance of its
    * vectors to their own centroid — the compactness number read next to
    * [[centroidSimilarity]]'s between-key matrix (tight clusters far
    * apart = good labels; diffuse clusters close together = relabel).
    * ENTIRELY integer: micro-quantized cells, exact centroid, per-vector
    * Σ(diff)² as LONG folds (64 dims × 4·10^12/cell ≈ 2.6·10^14 < 2^63),
    * mean = one integer division. No float step at all. Returns
    * (key, n_vecs, mean_sq_dist).
    *
    * Scale shape: the (key, dim) centroid aggregate, then the centroid
    * table broadcasts back for a purely NARROW per-vector fold and one
    * map-combined key aggregate. */
  def clusterDispersion(
      df: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("key"),
      transform(col(vecCol), x => floor(x.cast("double") * lit(1e6) + lit(0.5))).as("vm"))
    val cents = base
      .select(col("key"), posexplode(col("vm")).as(Seq("dim", "v")))
      .groupBy(col("key"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("key"), col("dim"), floor(col("s") / col("n") + lit(0.5)).as("c"))
      .groupBy(col("key"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        p => p.getField("c")).as("cv"))
    base.join(broadcast(cents), Seq("key"))
      .withColumn("__sq", expr(
        "aggregate(zip_with(vm, cv, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t)"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("__sq")).as("__ssq"))
      .select(col("key"), col("n_vecs"), expr("__ssq div n_vecs").as("mean_sq_dist"))
  }

  /** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    * traversal, the 2-approximation): pick the min-id seed, then k−1
    * times the point FARTHEST from everything chosen so far — the
    * maximally semantically-DIVERSE exemplar set (coreset selection /
    * "cover the embedding space with k docs"), the opposite pull of
    * SemDeDup's remove-the-redundant. Distances are exact integers under
    * the class quantization contract; selection order is total via the
    * (dmin desc, id asc) tiebreak, so a fixed k replays bit-for-bit
    * (the q150 DuckDB oracle unrolls the k steps as chained CTEs).
    *
    * Scale shape per step: the newly chosen center is a k×dim LITERAL in
    * the update expression, so the min-distance maintenance is PURELY
    * NARROW (no broadcast join, no exchange); the only wide op per step
    * is the argmax — a TakeOrdered(1), never a global sort. The running
    * frame is persisted and rolled each step (the HITS/label-prop
    * lesson: k chained actions must not recompute from the scan), and
    * the only driver-side data is the k selected rows themselves —
    * exactly the codebook-bounded-collect contract. Total cost O(n·k·d).
    * Returns (sel_rank, id, d2): squared micro-unit distance to the
    * previously-chosen set at selection time (0 for the seed) — a
    * decreasing sequence whose tail is the coverage radius. */
  def kCenterSelect(
      emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val spark = emb.sparkSession
    val v = emb.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => floor(x.cast("double") * lit(1e6) + lit(0.5))).as("vm"))
    val seedRow = v.orderBy(col("id")).limit(1).collect()
    if (seedRow.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("sel_rank", "id", "d2")
    }
    def vecLit(c: Seq[Long]) = array(c.map(lit(_)): _*)
    def d2To(c: Seq[Long]) =
      aggregate(zip_with(col("vm"), vecLit(c), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)](
      (1L, seedRow(0).getLong(0), 0L))
    var cur = v.withColumn("dmin", d2To(seedRow(0).getSeq[Long](1))).persist()
    var prev: DataFrame = null
    for (r <- 2 to k) {
      // already-chosen ids are EXCLUDED (a literal isin, not a join), so
      // duplicate vectors (dmin 0) still select distinct ids and both
      // engines agree even on degenerate corpora
      val top = cur.filter(!col("id").isin(chosen.map(_._2).toSeq: _*))
        .orderBy(col("dmin").desc, col("id").asc).limit(1).collect()
      if (top.nonEmpty) {
        chosen += ((r.toLong, top(0).getLong(0), top(0).getLong(2)))
        if (prev != null) prev.unpersist()
        prev = cur
        cur = cur.withColumn("dmin",
          least(col("dmin"), d2To(top(0).getSeq[Long](1)))).persist()
      }
    }
    cur.unpersist()
    if (prev != null) prev.unpersist()
    import spark.implicits._
    chosen.toSeq.toDF("sel_rank", "id", "d2")
  }

  /** Distributed BATCH-PERCEPTRON training of a quality classifier —
    * the trainable twin of the fixed-weight T35 scorer: documents get
    * feature-hashed integer vectors ([[TextOps.hashEmbedding]]) and a
    * ±1 label from an exact-integer teacher signal, and the classic
    * batch perceptron runs `epochs` rounds of
    * w ← w + Σ_misclassified y·x, b ← b + Σ_misclassified y
    * (Rosenblatt's rule summed over the batch). EVERY quantity is a
    * 64-bit integer — features are signed counts, labels ±1, weights
    * integer sums — so a fixed epoch count replays bit-for-bit on any
    * engine: the q170 DuckDB oracle unrolls the same epochs as chained
    * CTEs (the q59/q61 discipline, applied to model TRAINING). Returns
    * one row per (epoch, dim): (epoch, dim, weight, n_mis) with
    * dim = −1 carrying the bias; n_mis counts misclassifications under
    * the weights the epoch STARTED with (all of them at epoch 1: w=0
    * margins are 0, and 0 is classified wrong by convention).
    *
    * Scale shape per epoch: two map-combined aggregates — margins per
    * id (features join the dims-row broadcast weight table), then
    * misclassified deltas per dim (an id semi-join, dims cells out) —
    * and a dims+1-value driver collect (the k-means codebook pattern:
    * the MODEL crosses the driver, never the data). Feature rows are
    * (id, dim, value) triples; raw text never leaves the projection.
    * Overflow bound: |w_d| grows ≤ Σ|x_d| per epoch — at 10⁹ docs ×
    * 10² tokens that is ~10¹¹ per epoch, far under 2⁶³; the margin
    * products stay bounded by dims·|w|·|x|. */
  def perceptronTrain(
      df: DataFrame, idCol: String, textCol: String,
      dims: Int = 8, epochs: Int = 3, qualityBar: Long = 700000L): DataFrame = {
    require(dims >= 2 && epochs >= 1)
    val spark = df.sparkSession
    val feats = TextOps.hashEmbedding(df, idCol, textCol, dims)
    val labels = df.select(col(idCol).cast("long").as("id"),
      when(TextOps.qualityScoreMicro(col(textCol)) >= qualityBar, 1L)
        .otherwise(-1L).as("y"))
    val fl = feats.join(labels, Seq("id")).persist()
    val w = Array.fill(dims)(0L)
    var b = 0L
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    for (e <- 1 to epochs) {
      val wCol = element_at(array(w.toIndexedSeq.map(lit(_)): _*),
        col("dim").cast("int") + 1)
      val margins = fl.groupBy(col("id"), col("y"))
        .agg(sum(col("value") * wCol).as("__dot"))
        .select(col("id"), col("y"), (col("y") * (col("__dot") + lit(b))).as("m"))
      val mis = margins.filter(col("m") <= 0L)
      // deltas + error count: dims+1 values — the bounded model collect
      val dRows = fl.join(mis.select(col("id")), Seq("id"), "left_semi")
        .groupBy(col("dim")).agg(sum(col("y") * col("value")).as("dw"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val bRow = mis.agg(sum(col("y")).as("db"), count(lit(1)).as("n")).collect()(0)
      val nMis = bRow.getLong(1)
      (0 until dims).foreach(d => w(d) += dRows.getOrElse(d.toLong, 0L))
      b += (if (bRow.isNullAt(0)) 0L else bRow.getLong(0))
      out += ((e.toLong, -1L, b, nMis))
      (0 until dims).foreach(d => out += ((e.toLong, d.toLong, w(d), nMis)))
    }
    fl.unpersist()
    import spark.implicits._
    out.toSeq.toDF("epoch", "dim", "weight", "n_mis")
  }
}
