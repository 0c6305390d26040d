package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a web-scale training-data pipeline.
  *
  * All of these are built from codegen'd built-ins (HOFs + `xxhash64`) —
  * no Python, no driver-side loops — so they distribute as hash
  * shuffles on the signature keys:
  *
  *  - exact:   groupBy(xxhash64(text)) — one shuffle on the content hash.
  *  - MinHash: shingle → per-shingle hash → column-wise min (signature) →
  *             banded LSH keys → self-equi-join on (band, bandHash).
  *             Signature kernels are tight Scala UDFs (see
  *             wordShinglesKernel's note on why HOF spellings degenerate);
  *             the join itself stays relational.
  *             At 10^12 docs the band join is the only wide op; hot
  *             buckets (boilerplate-identical shingle sets) are the skew
  *             risk — the candidate join keys include the band id, and
  *             AQE skew-join splitting handles residual hot buckets.
  *  - SimHash: 64-bit fingerprint; near-dup = hamming distance ≤ k via
  *             `bit_count(a ^ b)`. Banding over 4×16-bit chunks makes it
  *             joinable without a cross product (pigeonhole: distance ≤ 3
  *             ⇒ at least one of 4 chunks identical).
  *
  * Semantics follow the standard MinHash/LSH construction (Broder 1997;
  * Leskovec et al., "Mining of Massive Datasets" ch. 3) — public
  * algorithms, re-expressed on Catalyst primitives.
  */
object Dedup {

  /** Distinct k-word shingles of a text. (Single pass — the HOF
    * spelling `transform(seq, i -> concat_ws(slice(split(text)...)))` is
    * avoided deliberately: Catalyst re-evaluates non-trivial child
    * expressions inside lambda bodies per element, turning shingling
    * into O(positions × split) and, nested under a signature transform,
    * into O(hashes × positions × split) per row.) */
  def wordShinglesKernel(k: Int): String => Array[String] = { text =>
    if (text == null) Array.empty
    else {
      val words = text.trim.split("\\s+").filter(_.nonEmpty)
      if (words.isEmpty) Array.empty
      else if (words.length <= k) Array(words.mkString(" "))
      else {
        val out = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + k <= words.length) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < k) { if (j > 0) sb.append(' '); sb.append(words(i + j)); j += 1 }
          out.add(sb.toString)
          i += 1
        }
        out.toArray(new Array[String](out.size))
      }
    }
  }

  /** splitmix64 of a seeded polynomial string hash — the permutation
    * family for MinHash (deterministic, independent of JVM hashing). */
  private def shingleHash(seed: Long, s: String): Long = {
    var h = 1125899906842597L ^ (seed * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash band keys from a shingle set: signature of `numHashes` mins
    * (one pass per hash seed over the shingles), then each of `bands`
    * contiguous signature slices folded to one 64-bit key. */
  def bandKeysKernel(numHashes: Int, bands: Int): Array[String] => Array[Long] = { shingles =>
    val r = numHashes / bands
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var h = 0
    while (h < numHashes) {
      var i = 0
      while (i < shingles.length) {
        val v = shingleHash(h.toLong, shingles(i))
        if (v < sig(h)) sig(h) = v
        i += 1
      }
      h += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L + b
      var j = 0
      while (j < r) { acc = acc * 0x100000001b3L + sig(b * r + j); j += 1 }
      keys(b) = acc
      b += 1
    }
    keys
  }

  /** Exact Jaccard over two distinct-element arrays (set semantics —
    * correct here because shingle arrays are array_distinct'ed). */
  def jaccardSets(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0d, lit(1d)).otherwise(inter / union)
  }

  /** Candidate near-duplicate pairs via MinHash LSH, verified with exact
    * shingle-set Jaccard. `df` must carry (`idCol`: orderable id,
    * `textCol`: string). Output: (id_a, id_b, jaccard) with id_a < id_b,
    * jaccard ≥ `threshold`.
    *
    * Scale shape: the band shuffle carries ONLY (id, band, key) — the
    * earlier version rode the shingle arrays through the 8-way posexplode
    * on both join sides (~16× the corpus' shingle bytes over the wire at
    * 100 TB). Candidate pairs are deduped FIRST, then the (small)
    * candidate list re-joins the shingle table by id; Spark/AQE broadcasts
    * the candidate side, so the verify stage streams the corpus once per
    * side with no wide shuffle of shingles. The shingle kernel runs once
    * per branch (3 scans total) — at 100 TB the wire cost of shipping
    * shingle sets dwarfs the recompute; callers verifying against an
    * already-materialized signature table can persist `df` upstream.
    */
  def minhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val shingleUdf = udf(wordShinglesKernel(shingleK))
    val bandUdf = udf(bandKeysKernel(numHashes, bands))
    val sig = df.select(col(idCol).as("id"), shingleUdf(col(textCol)).as("sh"))
    val buckets = sig.select(col("id"), posexplode(bandUdf(col("sh"))).as(Seq("band", "key")))
    val a = buckets.select(col("band"), col("key"), col("id").as("id_a"))
    val b = buckets.select(col("band"), col("key"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val shA = sig.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = sig.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cand.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccardSets(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of whitespace tokens (Charikar 2002): bit j of the
    * fingerprint is the sign of Σ_tokens (±1 by bit j of the token hash).
    * Kernel is a tight Scala UDF (64×N bit loop — cheaper and clearer than
    * 64 nested HOF passes); the token hash is splitmix64 of a polynomial
    * char hash, fully deterministic, no JVM-hash dependence. */
  val simhash64: String => Long = { text =>
    if (text == null) 0L
    else {
      val counts = new Array[Int](64)
      var i = 0
      val n = text.length
      while (i < n) {
        while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
        var h = 1125899906842597L
        var any = false
        while (i < n && !Character.isWhitespace(text.charAt(i))) {
          h = h * 31 + text.charAt(i); i += 1; any = true
        }
        if (any) {
          // splitmix64 finalizer
          var z = h + 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z = z ^ (z >>> 31)
          var b = 0
          while (b < 64) {
            if (((z >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, joined by
    * 16-bit chunk banding (any pair within distance 3 shares ≥1 of the
    * 4 chunks — pigeonhole — so no cross join is needed). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4x16-bit banding guarantees recall only for distance <= 3")
    val shUdf = udf(simhash64)
    val sigs = df.select(col(idCol).as("id"), shUdf(col(textCol)).as("sig"))
    val chunks = sigs.select(col("id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(sig, c * 16) & 65535)")).as(Seq("chunk", "ck")))
    val a = chunks.select(col("chunk"), col("ck"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunks.select(col("chunk"), col("ck"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
