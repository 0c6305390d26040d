package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  *  - Brute-force top-k: broadcast the (small) query set against the
  *    corpus, cosine via higher-order functions (whole-stage codegen'd,
  *    deterministic left-to-right double accumulation), per-query top-k
  *    via a row_number window partitioned by query id. At 10^12 rows
  *    this is one corpus scan per query batch — the exact baseline.
  *  - LSH (random hyperplane, Charikar 2002): a `numBits`-bit signature
  *    from sign(v · plane_j) with ±1 planes derived deterministically
  *    from splitmix64(planeSeed, j, i); candidates = bucket-equi-join on
  *    the signature prefix bands, re-ranked with exact cosine. The scale
  *    path: corpus signatures are computed once (narrow map, storable),
  *    and each query touches only its buckets instead of the full scan.
  */
object Similarity {

  /** Elementwise-deterministic cosine similarity of two `array<float>`
    * columns: all math in double, sequential fold (index order), so the
    * result is bit-stable across partitionings and engines. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0d), (acc, v) => acc + v)
    val na = aggregate(transform(ad, x => x * x), lit(0d), (acc, v) => acc + v)
    val nb = aggregate(transform(bd, x => x * x), lit(0d), (acc, v) => acc + v)
    when(na === 0d || nb === 0d, lit(0d)).otherwise(dot / (sqrt(na) * sqrt(nb)))
  }

  /** Exact brute-force cosine top-k. `queries`/`corpus` carry
    * (`idCol`, `vecCol`). Output: (query_id, vec_id, sim) — k rows per
    * query, ordered ties broken by corpus id (total order). */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("nn_id"), cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic ±1 hyperplanes: the component for (plane j, dim i) is
    * the parity of a Carter-Wegman affine transform mod 2^31-1 (same
    * portable family as ops/Dedup — all arithmetic fits signed 64-bit, so
    * the q29/q34 DuckDB oracles replay the identical signatures; the dot
    * products are sequential double folds, bit-equal across engines). */
  private val MersenneP = 2147483647L

  /** Random-hyperplane signature UDF kernel: numBits sign bits packed into
    * a Long. Pure Scala loop — one pass over the vector per plane; the
    * plane's affine coefficients are hoisted out of the per-dimension
    * loop (they depend only on (seed, j)). */
  def lshSignature(seed: Long, numBits: Int): Seq[Float] => Long = { vec =>
    if (vec == null) 0L
    else {
      var sig = 0L
      var j = 0
      while (j < numBits) {
        val a = ((j + 7L) * 1103515245L + seed * 31L) % MersenneP
        val b = ((j + 3L) * 1234567891L + seed) % MersenneP
        var dot = 0.0
        var i = 0
        val n = vec.length
        while (i < n) {
          val sign = if (((a * (i + 1L) + b) % MersenneP & 1L) == 1L) 1.0 else -1.0
          dot += vec(i) * sign
          i += 1
        }
        if (dot >= 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
  }

  /** Embedding-cosine near-duplicate PAIRS over one corpus: candidates
    * from the banded hyperplane-signature self-join (same family as
    * [[lshTopK]] — only (id, band, bk) enters the band shuffle), deduped,
    * then re-joined to vectors by id and verified with exact cosine ≥
    * `threshold`. The pairwise cousin of [[lshTopK]]: dedup wants "which
    * rows duplicate each other", not "top-k per query". Output:
    * (id_a, id_b, sim) with id_a < id_b. */
  def cosineNearDups(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numBits: Int = 16,
      bands: Int = 4,
      seed: Long = 42L,
      maxBucket: Int = 1000): DataFrame = {
    require(numBits % bands == 0)
    require(maxBucket >= 2)
    val r = numBits / bands
    val sigUdf = udf(lshSignature(seed, numBits))
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val banded = vecs
      .select(col("id"), sigUdf(col("v")).as("sig"))
      .select(col("id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> shiftright(sig, b * $r) & ${(1L << r) - 1})"))
        .as(Seq("band", "bk")))
    // hot-bucket star-reduction (see Dedup.minhashNearDups): a signature
    // bucket wider than maxBucket keeps only its min id on the left side
    // — B−1 pairs per band instead of B²/2 for a B-vector near-identical
    // cluster, with cluster connectivity preserved. q34-oracle-replayed.
    val stats = banded.groupBy(col("band"), col("bk"))
      .agg(count(lit(1)).as("__n"), min(col("id")).as("__mn"))
    val a = banded.join(stats, Seq("band", "bk"))
      .filter(col("__n") <= maxBucket || col("id") === col("__mn"))
      .select(col("band"), col("bk"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bk"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val va = vecs.select(col("id").as("id_a"), col("v").as("va"))
    val vb = vecs.select(col("id").as("id_b"), col("v").as("vb"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Scala twin of [[cosine]]: sequential double fold in index order, so a
    * cell assignment computed here is bit-equal to one computed by the
    * Catalyst column (and by the DuckDB oracle's list_reduce replay). */
  private def cosineKernel(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The `nProbe` nearest centroid ids for `v`, ordered (sim desc, cid asc)
    * — the same total order the oracle's row_number window uses. */
  private def nearestCells(
      cents: Array[(Long, Array[Float])], v: Array[Float], nProbe: Int): Seq[Long] =
    cents.map { case (cid, cv) => (cid, cosineKernel(v, cv)) }
      .sortBy { case (cid, s) => (-s, cid) }
      .take(nProbe).map(_._1).toSeq

  /** Argmax twin of `nearestCells(_, _, 1)` for the per-corpus-row hot
    * path: no tuple allocation, no sort. `cents` is sorted by cid asc and
    * the comparison is strict, so ties keep the lowest cid — the same
    * (sim desc, cid asc) order the oracle's window replays. */
  private def assignCell(cents: Array[(Long, Array[Float])], v: Array[Float]): Long = {
    var best = Long.MinValue
    var bestSim = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val s = cosineKernel(v, cents(i)._2)
      if (s > bestSim) { bestSim = s; best = cents(i)._1 }
      i += 1
    }
    best
  }

  /** IVF (inverted-file) ANN: the coarse-quantizer scale path for
    * [[bruteForceTopK]], complementing [[lshTopK]].
    *
    *  - Codebook: the `nCells` corpus vectors with the smallest
    *    Carter-Wegman affine hash of their id (a deterministic
    *    pseudo-random sample — no iterative k-means, so the DuckDB oracle
    *    replays centroid choice exactly; ids must stay below ~8.4e9 so the
    *    64-bit affine transform cannot wrap). Selected via Spark's
    *    TakeOrdered (top-`nCells`, never a full sort) and broadcast.
    *  - Assignment: one narrow scan — a per-row argmax over the broadcast
    *    codebook, NO shuffle (vs the window-over-crossJoin a pure-DSL
    *    version would need). Each corpus row lands in exactly one cell, so
    *    candidates need no dedup (an advantage over LSH banding). In a
    *    real deployment the assigned table is written out partitioned by
    *    cell and reused across query batches.
    *  - Search: each query probes its `nProbe` nearest cells; the probe
    *    list is broadcast, so the corpus side joins without shuffling, and
    *    only in-cell rows are re-ranked with exact [[cosine]]. The single
    *    shuffle in the plan is the per-query top-k window, and it carries
    *    only (query_id, nn_id, sim) — PlanSpec asserts this.
    *
    * Recall knob: nProbe/nCells. With nProbe == nCells this degenerates to
    * an exact full scan and must equal [[bruteForceTopK]] bit-for-bit
    * (OpsSpec asserts that too). Output schema matches [[bruteForceTopK]];
    * fewer than k rows per query are possible — ANN. */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    require(nCells > 0 && nProbe > 0 && nCells <= 65536, "codebook must stay broadcastable")
    val vecs = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val centroids: Array[(Long, Array[Float])] = vecs
      .filter(col("v").isNotNull) // a null vector cannot anchor a cell
      .withColumn("h", (col("id") * lit(1103515245L) + lit(12345L)) % lit(MersenneP))
      .orderBy(col("h"), col("id"))
      .limit(nCells)
      .collect() // bounded by nCells — this IS the codebook broadcast
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    // Long.MinValue sentinel: cell ids are corpus ids, and MinValue cannot
    // survive the affine codebook hash bound (|id| < ~8.4e9), so a null
    // vector can never collide with a real cell
    val assignUdf = udf { v: Seq[Float] =>
      if (v == null) Long.MinValue else assignCell(bc.value, v.toArray)
    }
    val probeUdf = udf { v: Seq[Float] =>
      if (v == null) Seq.empty[Long] else nearestCells(bc.value, v.toArray, nProbe)
    }
    val cells = vecs.select(col("id").as("nn_id"), col("v").as("cv"),
      assignUdf(col("v")).as("cell"))
    val probes = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"), explode(probeUdf(col("qv"))).as("cell"))
    val cand = cells.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("nn_id"), cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("nn_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), round(col("sim"), 6).as("sim"))
  }

  /** LSH-bucketed ANN: signatures banded into `bands` chunks; a corpus row
    * is a candidate for a query if ANY band matches (equi-join); candidates
    * are re-ranked with exact cosine. Returns the same schema as
    * [[bruteForceTopK]] (fewer than k rows per query possible — ANN).
    *
    * Scale shape (mirrors [[cosineNearDups]]): the banded sides and the
    * candidate dedup carry ONLY (query_id, nn_id, band, bk) — never the
    * embedding arrays. An earlier version `.distinct()`-ed over
    * (query_id, nn_id, qv, cv), hashing and shuffling the full query AND
    * corpus vectors as grouping keys; at 10^9 rows x 1k-dim that exchange
    * is the whole job's wire cost. Corpus vectors re-join the (small)
    * deduped candidate list by id; query vectors come from the broadcast
    * query batch. PlanSpec pins vectors out of the band/dedup exchanges. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numBits: Int = 16,
      bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    require(numBits % bands == 0)
    val r = numBits / bands
    val sigUdf = udf(lshSignature(seed, numBits))
    def banded(df: DataFrame, id: String) =
      df.select(col(idCol).as(id), sigUdf(col(vecCol)).as("sig"))
        .select(col(id),
          posexplode(expr(
            s"transform(sequence(0, ${bands - 1}), b -> shiftright(sig, b * $r) & ${(1L << r) - 1})"))
            .as(Seq("band", "bk")))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cv"))
    val cand = banded(corpus, "nn_id")
      .join(broadcast(banded(queries, "query_id")), Seq("band", "bk"))
      .select(col("query_id"), col("nn_id"))
      .distinct()
    val scored = cand.join(cv, Seq("nn_id")).join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("nn_id"), cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), round(col("sim"), 6).as("sim"))
  }

  /** Per-dimension int8 scalar quantization of an embedding column — the
    * standard 4× memory compression for billion-vector search (each
    * float32 dimension becomes one byte; search runs on the codes, exact
    * re-score on the survivors). Floats are micro-unit-quantized FIRST
    * (the q57-q59 IEEE rule), then mapped to [0, 255] by per-dimension
    * min/max affine integer arithmetic — every code is exact and
    * engine-replayable; a constant dimension codes to 0. Returns one
    * (id, dim, code) row per cell; callers fold codes back to arrays or
    * compute distances directly on the cells (q81 does asymmetric-style
    * integer L2 on codes).
    *
    * Scale shape: the per-dimension min/max is a bounded aggregate (dims
    * rows) broadcast back; the corpus side is one narrow explode+project
    * pass — vectors never shuffle (asserted in PlanSpec). */
  def scalarQuantizeCodes(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val cells = df
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("id"), col("dim"),
        floor(col("v").cast("double") * 1e6 + 0.5).cast("long").as("vm"))
    val stats = cells.groupBy(col("dim")).agg(min(col("vm")).as("lo"), max(col("vm")).as("hi"))
    cells.join(broadcast(stats), Seq("dim"))
      .select(col("id"), col("dim"),
        expr("((vm - lo) * 255) div greatest(hi - lo, 1)").as("code"))
  }

  /** Sparse random projection (Achlioptas 2003): compress vectors to
    * `outDims` dimensions with a ±1 sign matrix — the JL-lemma
    * dimensionality reducer that front-ends LSH/IVF when the input
    * dimension is itself the cost (pairwise distances are preserved
    * within 1±ε at outDims = O(log n / ε²)). The sign matrix is never
    * materialized: sign(i, j) is a pure hash of the coordinate pair, so
    * every engine, executor, and rerun agrees on it (the same
    * matrix-free trick as T19's hash split). Inputs quantize to exact
    * integer micro-units first ([[Clustering]]'s protocol), making every
    * output cell exact-integer and the q112 replay bit-for-bit.
    *
    * Scale shape: PURELY NARROW — the quantized vector and its index zip
    * are bound to attributes once, and the `outDims` signed sums are
    * single-pass `aggregate` folds (no per-element re-evaluation hazard,
    * no exchange at all). Returns long-format (id, dim, value). */
  def randomProjection(
      df: DataFrame, idCol: String, vecCol: String, outDims: Int = 8): DataFrame = {
    require(outDims >= 1)
    val base = df.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => floor(x.cast("double") * lit(1e6) + lit(0.5))).as("__q"))
    val withZ = base.withColumn("__z",
      expr("zip_with(__q, sequence(0, size(__q) - 1), (q, i) -> struct(q AS q, i AS i))"))
    val dims = (0 until outDims).map { j =>
      struct(lit(j.toLong).as("dim"),
        expr(s"""aggregate(__z, 0L, (acc, s) -> acc +
                |(CASE WHEN ((s.i * 131071 + $j * 524287) % 2147483647) % 2 = 0
                |  THEN s.q ELSE -s.q END))""".stripMargin).as("value"))
    }
    withZ.select(col("id"), explode(array(dims: _*)).as("e"))
      .select(col("id"), col("e.dim").as("dim"), col("e.value").as("value"))
  }
}
