package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, in their scale-correct
  * shapes. Both avoid the naive range/theta join (which Catalyst executes
  * as a nested-loop or cartesian — unusable at 10⁹ rows):
  *
  *  - as-of join: union-tag both sides and take one window pass per key
  *    (the standard log-merge formulation). ONE shuffle total, on the key;
  *    wire cost is the two inputs, never a pair blowup.
  *  - range join: quantize timestamps to tolerance-width bins, probe the
  *    three adjacent bins with an EQUI-join, then apply the exact
  *    predicate. One hash-join shuffle; each (left,right) pair is seen
  *    exactly once (a right row lands in one bin, probed by one of the
  *    left row's three bins).
  */
object Temporal {

  /** Left as-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` for the same key (DuckDB `ASOF JOIN`
    * semantics). Right rows must carry `keyCol`/`tsCol` under the same
    * names; their `rightCols` come back prefixed `asof_` (null when
    * nothing precedes). Ties at identical (key, ts): right side wins over
    * left (<= semantics), equal-ts right rows break by struct field
    * order, greatest last. */
  def asOfJoinLeft(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String]): DataFrame = {
    val lStruct = struct(left.columns.toSeq.map(col): _*)
    val rStruct = struct(rightCols.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val lU = left.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"), lit(1).as("__side"))
    val rU = right.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"), lit(0).as("__side"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.toSeq.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }

  /** Inner as-of join: left rows with no preceding right row drop out. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String]): DataFrame =
    asOfJoinLeft(left, right, keyCol, tsCol, rightCols)
      .where(col(s"asof_${rightCols.head}").isNotNull)

  /** Range-join count: for each left row, how many right rows share the
    * key and sit within `tolUs` microseconds of its timestamp (inclusive
    * both ends). Zero-match left rows are kept with cnt 0. */
  def rangeJoinCount(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tolUs: Long): DataFrame = {
    require(tolUs > 0, "tolerance must be positive")
    // cast covers TIMESTAMP_NTZ fixtures: with a UTC session the cast
    // reinterprets the wall clock as UTC (exact, same reading DuckDB takes)
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    val lBin = floor(us(col(tsCol)) / tolUs)
    val l = left.select(col(keyCol).as("__k"), us(col(tsCol)).as("__lus"),
        struct(left.columns.toSeq.map(col): _*).as("__l"),
        explode(array(lBin - 1, lBin, lBin + 1)).as("__bin"))
    val r = right.select(col(keyCol).as("__rk"), us(col(tsCol)).as("__rus"),
        floor(us(col(tsCol)) / tolUs).as("__rbin"))
    l.join(r, l("__k") === r("__rk") && l("__bin") === r("__rbin"), "left_outer")
      .groupBy(col("__l"))
      .agg(sum(when(col("__rus").isNotNull &&
        abs(col("__rus") - col("__lus")) <= tolUs, 1L).otherwise(0L)).as("cnt"))
      .select(left.columns.toSeq.map(c => col(s"__l.$c").as(c)) :+ col("cnt"): _*)
  }

  /** Strict ordered-funnel conversion: how many users performed the
    * stage-1 event, then a stage-2 event STRICTLY AFTER their first
    * stage-1 event, then stage-3 after that, … — the sequence-matching
    * report [[graft.ops.Curation.funnelReport]]'s row-predicate cascade
    * cannot express (order between events matters, not row membership).
    * Frontier semantics: each stage keeps the EARLIEST qualifying event
    * after the user's previous-stage time, so conversion is maximal
    * (first-opportunity) and deterministic.
    *
    * Scale shape: per stage, one narrow type filter + one user-keyed
    * join to the (user, time) frontier + a min aggregate — all on the
    * same user key (bucket-co-locatable); frontiers are eagerly
    * checkpointed (tiny: one row per surviving user) so the per-stage
    * count branches don't multiply the join chain (the HITS lesson).
    * Returns (stage, stage_name, n_users). */
  def orderedFunnel(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.size >= 2)
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    val ev = df.select(col(userCol).as("__u"), us(col(tsCol)).as("__t"),
      col(typeCol).as("__ty"))
    var frontier = ev.filter(col("__ty") === stages.head)
      .groupBy(col("__u")).agg(min(col("__t")).as("__ft"))
      .localCheckpoint(true)
    var counts = frontier.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("stage"), lit(stages.head).as("stage_name"), col("n_users"))
    for (k <- 1 until stages.size) {
      frontier = ev.filter(col("__ty") === stages(k))
        .join(frontier.select(col("__u"), col("__ft")), Seq("__u"))
        .where(col("__t") > col("__ft"))
        .groupBy(col("__u")).agg(min(col("__t")).as("__ft"))
        .localCheckpoint(true)
      counts = counts.union(frontier.agg(count(lit(1)).as("n_users"))
        .select(lit((k + 1).toLong).as("stage"), lit(stages(k)).as("stage_name"),
          col("n_users")))
    }
    counts
  }

  /** Retention cohort matrix: users grouped by FIRST-activity day, then
    * for each (cohort day, day offset) the count of distinct users active
    * that many days later — the standard "does the crawl/user base come
    * back" triangle. Deterministic end to end (min-date cohorting, exact
    * datediff, distinct counts).
    *
    * Scale shape: one map-combined (user → first day) aggregate, a join
    * back on the user key (bucket-co-locatable), a distinct on (cohort,
    * offset, user) — 12-byte rows — and the final count aggregate.
    * Returns (cohort_day, day_offset, n_users). */
  def retentionCohorts(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val acts = df.select(col(keyCol).as("__u"),
      to_date(col(tsCol).cast("timestamp")).as("__d"))
    val first = acts.groupBy(col("__u")).agg(min(col("__d")).as("__c"))
    acts.join(first, Seq("__u"))
      .select(col("__c").as("cohort_day"),
        datediff(col("__d"), col("__c")).cast("long").as("day_offset"), col("__u"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Interval overlap self-join: all same-key pairs whose [start, end]
    * ranges intersect (session collision / concurrent-visit mining) —
    * the two-sided generalization of [[rangeJoinCount]]'s point-
    * tolerance probe. Time tiles into `binUs` bins; each interval
    * replicates to the bins it touches, pairs meet in an EQUI-join on
    * (key, bin), and the exact predicate prunes after. A pair spanning
    * several shared bins is emitted ONCE without any distinct exchange:
    * only the bin containing `greatest(start_a, start_b)` reports (for
    * an overlapping pair that bin lies in both intervals' ranges, so
    * exactly one joined row satisfies the equality — the standard
    * report-at-first-overlap dedup). Replication per interval is
    * span/binUs + 1 bins — size `binUs` to the TYPICAL span (clamp
    * outliers upstream); timestamps must be non-negative µs (integer
    * `div` = floor there). Returns (key, id_a, id_b, overlap_us) with
    * id_a < id_b and overlap_us ≥ 0 (touching endpoints = 0).
    *
    * Scale shape: one hash-join exchange on (key, bin) carrying
    * (id, start, end) triples; never a theta join, never a cartesian,
    * no post-join distinct. Skewed keys split under AQE. */
  def intervalOverlapPairs(
      df: DataFrame, keyCol: String, idCol: String,
      startUsCol: String, endUsCol: String, binUs: Long): DataFrame = {
    require(binUs > 0)
    val b = df.select(col(keyCol).as("__k"), col(idCol).cast("long").as("__id"),
        col(startUsCol).cast("long").as("__s"), col(endUsCol).cast("long").as("__e"))
      .where(col("__s") <= col("__e") && col("__s") >= 0L)
      .withColumn("__bin",
        explode(sequence(expr(s"__s div ${binUs}L"), expr(s"__e div ${binUs}L"))))
    val a = b.select(col("__k"), col("__bin"), col("__id").as("id_a"),
      col("__s").as("__sa"), col("__e").as("__ea"))
    val c = b.select(col("__k"), col("__bin"), col("__id").as("id_b"),
      col("__s").as("__sb"), col("__e").as("__eb"))
    a.join(c, Seq("__k", "__bin"))
      .where(col("id_a") < col("id_b") &&
        col("__sa") <= col("__eb") && col("__sb") <= col("__ea") &&
        col("__bin") === expr(s"greatest(__sa, __sb) div ${binUs}L"))
      .select(col("__k").as("key"), col("id_a"), col("id_b"),
        (least(col("__ea"), col("__eb")) - greatest(col("__sa"), col("__sb")))
          .as("overlap_us"))
  }

  /** Per-key inter-arrival profile: gaps between consecutive events in
    * epoch MICROseconds — min, truncated-integer mean, and an exact
    * type-1 p-th percentile. For a crawler this is the politeness audit
    * (per-host request spacing: a min gap of 0 is a hammering fetcher);
    * for user events it is the burstiness read that session windows
    * (T21) summarize away. Everything integer: gaps are long micros
    * (TIMESTAMP_NTZ wall clock read as UTC, the q38 convention), the
    * mean is `sum div n`, and the percentile is the gap at rank
    * `(p·n + 99) div 100` under the total order (gap asc, seq asc) — no
    * `percentile_approx` nondeterminism, replayable in SQL.
    *
    * Scale shape: both window passes share ONE key-hash exchange (same
    * partitioning), keys are independent so a 10^9-key corpus spreads;
    * per-key sort is the unavoidable cost of an ordered statistic — no
    * global sort anywhere. `seqCol` breaks timestamp ties so the gap
    * sequence (and thus the percentile) is deterministic.
    * Returns (key, n_gaps, min_gap_us, mean_gap_us, p_gap_us). */
  def interArrival(
      df: DataFrame, keyCol: String, tsCol: String, seqCol: String,
      p: Int = 95): DataFrame = {
    require(p >= 1 && p <= 100)
    val ord = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__seq"))
    val gaps = df.select(col(keyCol).as("__k"),
        unix_micros(col(tsCol).cast("timestamp")).as("__ts"), col(seqCol).as("__seq"))
      .withColumn("__gap", col("__ts") - lag(col("__ts"), 1).over(ord))
      .filter(col("__gap").isNotNull)
    val ranked = gaps.withColumn("__r",
      row_number().over(Window.partitionBy(col("__k"))
        .orderBy(col("__gap"), col("__seq"))))
    val stats = ranked.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("__gap")).as("min_gap_us"),
        expr("sum(__gap) div count(1)").as("mean_gap_us"))
    stats.join(ranked.select(col("__k"), col("__gap"), col("__r")), Seq("__k"))
      .filter(col("__r") === expr(s"($p * n_gaps + 99) div 100"))
      .select(col("__k").as("key"), col("n_gaps"), col("min_gap_us"),
        col("mean_gap_us"), col("__gap").as("p_gap_us"))
  }

  /** Ingest-volume anomaly monitor: per-day row counts compared against
    * the TRAILING `window`-day mean — the "did the crawler break
    * yesterday / did a feed explode" alarm read before a snapshot is
    * trusted (T68's drift monitor compares token DISTRIBUTIONS; this
    * watches raw volume, the failure mode that hits first). Deviation is
    * exact micro-units `cnt·10⁶ div trailing_mean` (10⁶ = nominal,
    * <10⁵ = nine-tenths drop, >10⁷ = 10× spike); days with no full
    * trailing window report NULL deviation rather than a misleading
    * partial-window one.
    *
    * The trailing window is over the `window` preceding OBSERVED days
    * (rows, not calendar positions): a fully-silent day is absent from
    * the day table — that absence is itself the alarm — and a calendar-
    * positional window would need a generated day dimension upstream.
    *
    * Scale shape: one map-combined day aggregate collapses the corpus to
    * ≤ days rows, then one unpartitioned-but-tiny ordered window over
    * that day table (bounded by the calendar, never by the corpus).
    * Returns (day, cnt, trail_total, dev_micro). */
  def volumeAnomaly(df: DataFrame, tsCol: String, window: Int = 7): DataFrame = {
    require(window >= 1)
    val days = df
      .select(date_format(col(tsCol).cast("timestamp"), "yyyy-MM-dd").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("day")).rowsBetween(-window, -1)
    days
      .withColumn("__tn", count(lit(1)).over(w))
      .withColumn("trail_total", sum(col("cnt")).over(w))
      .withColumn("dev_micro",
        when(col("__tn") === window,
          expr(s"cnt * 1000000 div (trail_total div $window)"))
          .otherwise(lit(null).cast("long")))
      .select(col("day"), col("cnt"),
        when(col("__tn") === window, col("trail_total")).otherwise(lit(null).cast("long"))
          .as("trail_total"),
        col("dev_micro"))
  }

  /** Snapshot DRIFT — the edit-distance magnitude the set-level snapshot
    * delta (T38) can't see: the same document re-extracted in two crawls
    * (or by two extractor versions) is joined by id and measured as
    * levenshtein edits over the old length. The extraction-regression
    * monitor a pipeline reads before shipping a new stripper: a release
    * whose mean drift jumps from 0 to 5% rewrote everyone's main
    * content. Returns per-doc (id, lev, len_old, drift_micro); callers
    * aggregate per source/release.
    *
    * Both sides are clamped to a `prefix`-char prefix (default 64 Ki)
    * before the DP: drift is a regression MONITOR, not an exact diff,
    * and an unbounded O(len² ) kernel turns a handful of megabyte-class
    * documents into hour-long straggler tasks at crawl scale — skew the
    * shuffle-shape audits can't see because it hides inside one row.
    * With the clamp the worst row costs O(prefix²) bounded CPU and the
    * 0→5% release-regression signal survives intact (a stripper that
    * rewrote everyone's content rewrites the first 64 KiB too).
    * `len_old` is the clamped length, so drift_micro stays a true
    * edits-per-compared-char rate; oracles replay the clamp with
    * `left(t, prefix)`.
    *
    * Scale shape: one equi-join on the id — text must co-locate to be
    * compared, so this is the operator whose input WANTS bucketed/
    * co-partitioned snapshot tables (T60) at 10¹² rows — then a purely
    * narrow levenshtein projection (Spark's builtin, codegen'd). */
  def snapshotDrift(
      old: DataFrame, cur: DataFrame, idCol: String, textCol: String,
      prefix: Int = 65536): DataFrame = {
    require(prefix >= 1, s"snapshotDrift prefix must be >= 1, got $prefix")
    old.select(col(idCol).cast("long").as("id"),
        substring(col(textCol), 1, prefix).as("__t0"))
      .join(cur.select(col(idCol).cast("long").as("id"),
        substring(col(textCol), 1, prefix).as("__t1")), Seq("id"))
      .select(col("id"), levenshtein(col("__t0"), col("__t1")).cast("long").as("lev"),
        length(col("__t0")).cast("long").as("len_old"))
      .withColumn("drift_micro", expr("lev * 1000000 div greatest(len_old, 1)"))
  }
}
