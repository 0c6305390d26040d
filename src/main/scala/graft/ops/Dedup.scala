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

  /** Distinct k-word shingles of a text column, as `array<string>`.
    * Shorter-than-k documents yield their single joined-word shingle. */
  def wordShingles(text: Column, k: Int): Column = {
    val words = split(trim(text), "\\s+")
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(words) - lit(k - 1), lit(1))),
        i => concat_ws(" ", slice(words, i, lit(k)))))
  }

  /** MinHash signature: `array<bigint>` of length `numHashes`;
    * element i = min over shingles of xxhash64(i, shingle). */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleSet, s => xxhash64(i, s))))

  /** LSH band keys: hash each of `bands` contiguous signature slices.
    * Returns `array<bigint>` of length `bands`. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))

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
    * Scale shape: one narrow pass computes signatures, one explode, one
    * shuffle on (band, key), candidate pairs verified WITHOUT re-reading
    * the corpus (shingle sets travel with the bucket rows — cheaper than
    * a second join back to a 100 TB table; for very long documents swap
    * to re-join-by-id instead).
    */
  def minhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val r = numHashes / bands
    val sig = df
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleK).as("sh"))
      .withColumn("bk", bandKeys(minhashSignature(col("sh"), numHashes), bands, r))
    val buckets = sig.select(col("id"), col("sh"), posexplode(col("bk")).as(Seq("band", "key")))
    val a = buckets.select(col("band"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = buckets.select(col("band"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccardSets(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
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
