package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, SQL-replayable sketches for corpus profiling.
  *
  * A 100-TB curation run wants cheap per-group cardinality profiles
  * (distinct tokens per source, distinct urls per host, vocabulary
  * growth) without an exact count-distinct shuffle of every value. The
  * standard answer is HLL; HLL's register layout is engine-specific and
  * unverifiable cross-engine, so this module uses the KMV (k minimum
  * values) estimator (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007:
  * E = (k-1)/h_k with hashes scaled to the unit interval) over the same
  * Carter-Wegman affine family mod 2^31-1 as the MinHash pipeline — every
  * arithmetic step fits signed-64-bit and replays bit-for-bit in ANSI SQL
  * (the q51 DuckDB oracle recomputes the estimates independently).
  */
object Sketches {

  /** Affine scramble of an already-hashed value into [0, 2^31-1): KMV
    * needs its order statistics over a (pseudo-)uniform hash, and the
    * base-131 polynomial alone skews small strings toward small values. */
  def kmvHash(h: Column): Column =
    pmod(h * lit(1103515245L) + lit(12345L), lit(Dedup.MersenneP))

  /** Per-group distinct-count estimate from the k minimum distinct hash
    * values. Input: one row per (group, value-hash) OBSERVATION (dups
    * fine). Output: (groupCol, n_kept, kth_hash, est_distinct) where
    * est_distinct = (k-1) · p / h_k when the group has ≥ k distinct
    * hashes, else the exact kept count (the estimator's standard
    * small-set exact regime).
    *
    * Scale shape: the (group, hash) distinct is the only full-width
    * exchange and it carries 16-byte rows with map-side partial
    * aggregation; the rank-≤-k filter is a declarative row_number window,
    * so Catalyst inserts a PARTIAL WindowGroupLimit below its exchange
    * (SPARK-37099) — each map partition ships at most k hashes per group
    * and a 10^9-token group costs the wire the same k rows as a tiny one.
    * Estimates are rounded to 6dp (floor(x·10^6 + 0.5)/10^6) so the
    * cross-engine float representation is stable. */
  def kmvDistinct(df: DataFrame, groupCol: String, hashCol: Column, k: Int = 64): DataFrame = {
    require(k >= 2)
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__kmv_h").asc)
    val est = (lit(k - 1).cast("double") * lit(Dedup.MersenneP.toDouble)) / col("kth_hash")
    df.select(col(groupCol), kmvHash(hashCol).as("__kmv_h"))
      .distinct()
      .withColumn("__kmv_rn", row_number().over(w))
      .filter(col("__kmv_rn") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("__kmv_h")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(floor(est * lit(1e6) + lit(0.5)) / lit(1e6)))
  }
}
