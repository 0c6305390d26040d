package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: quality scoring,
  * document fingerprinting, token counting. All pure Column DSL —
  * whole-stage codegen, no UDFs — and every formula is mirrored in the
  * DuckDB oracle SQL (Queries.scala) so the kernels are cross-engine
  * checked, not just unit-tested.
  */
object TextOps {

  /** Whitespace token count (the cheap tokenizer every curation pass
    * starts with). */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish subword proxy: alternating letter-run / digit-run / single
    * punctuation tokens — a deterministic regex split that approximates
    * byte-pair token counts without a vocab file. */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => length(t) > 0)).cast("long")

  /** Quality-score feature block (struct): char/word counts, mean word
    * length, punctuation ratio, uppercase ratio — the standard cheap
    * heuristics (Gopher / C4-style filters). All ratios divide exact
    * integer counts once at the end (deterministic across engines). */
  def qualityFeatures(text: Column): Column = {
    val chars = length(text).cast("double")
    val words = tokenCount(text).cast("double")
    val punct = (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double")
    val upper = (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double")
    val safeChars = when(chars === 0d, lit(1d)).otherwise(chars)
    struct(
      chars.cast("long").as("n_chars"),
      words.cast("long").as("n_words"),
      round(chars / when(words === 0d, 1d).otherwise(words), 4).as("mean_word_len"),
      round(punct / safeChars, 6).as("punct_ratio"),
      round(upper / safeChars, 6).as("upper_ratio"))
  }

  /** Composite [0,1] quality score from the feature block: penalizes
    * too-short docs, extreme word lengths, punctuation soup. Monotone
    * arithmetic on rounded features → deterministic. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenScore = least(f.getField("n_words").cast("double") / 50d, lit(1d))
    val wl = f.getField("mean_word_len")
    val wlScore = when(wl >= 3d && wl <= 10d, 1d).otherwise(0.5d)
    val punctScore = when(f.getField("punct_ratio") <= 0.1d, 1d).otherwise(0.5d)
    round((lenScore + wlScore + punctScore) / 3d, 6)
  }

  /** Polynomial rolling-hash fingerprint of the full text:
    * h = fold(chars, h*31 + code) mod 1e9+7. Modulus keeps every
    * intermediate < 2^63 (31 * (1e9+7) + 127 << Long.Max), so the fold is
    * overflow-free and expressible identically in Spark and DuckDB SQL. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31L + c, lit(1000000007L)))

  /** Shift-invariant content-defined chunk count (rolling-hash chunking à
    * la rsync/CDC): number of positions whose 8-char rolling hash hits a
    * boundary mask — the building block for fuzzy dedup of big documents. */
  def chunkBoundaryCount(textCol: String, mask: Int = 63): Column = {
    // 8-gram hashes via substr inside a HOF (SQL form: the Scala
    // substring() overload only takes literal positions).
    val hashes = expr(
      s"transform(sequence(1, greatest(length($textCol) - 7, 1)), i -> " +
        s"aggregate(transform(split(substr($textCol, i, 8), ''), c -> cast(ascii(c) as bigint)), " +
        "cast(0 as bigint), (acc, c) -> pmod(acc * 31 + c, 1000000007)))")
    size(filter(hashes, h => pmod(h, lit(mask + 1)) === 0L)).cast("long")
  }

  /** Stopword-profile language id over a fixed public stopword table.
    * Scores = occurrence counts of per-language marker words; argmax with
    * a deterministic preference order on ties. */
  def langId(text: Column): Column = {
    def occ(w: String): Column =
      ((length(text) - length(regexp_replace(text, s" $w ", ""))) / (w.length + 2)).cast("long")
    val sEn = occ("the") + occ("and")
    val sDe = occ("der") + occ("und")
    val sEs = occ("los") + occ("las")
    val sFr = occ("les") + occ("des")
    when(sEn >= greatest(sDe, sEs, sFr), "en")
      .when(sDe >= greatest(sEs, sFr), "de")
      .when(sEs >= sFr, "es")
      .otherwise("fr")
  }
}
