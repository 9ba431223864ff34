package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for corpus curation, composed from native
  * (codegen'd) functions only — every expression here stays inside
  * whole-stage codegen; no UDFs.
  *
  * Each helper has an exact DuckDB-SQL mirror (see TextQueries oracles):
  * occurrence counting via the length-of-replace trick, token counting
  * via regex, so both engines agree bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokens of a text column, empty tokens removed,
    * case-preserving — the shared tokenizer expression under q94's
    * chunking, q111's lexical-diversity axis, and their specs. One
    * definition: oracle parity depends on the exact regex and
    * empty-token semantics (`trim` strips only spaces in both engines,
    * so tab-only text still needs the empty filter), and drifting
    * copies would silently break hash-match.
    */
  def wsTokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Ordered word-bigram stream: one row per adjacent token pair of
    * each document — the shared primitive under q71 (transition counts),
    * q80 (LM scoring) and q88 (token-graph edges).
    *
    * Deliberately NOT `explode(zip_with(slice, slice, struct))`: ZipWith
    * has no codegen, so that form evaluates interpreted per row —
    * re-running the regex split once per slice branch and deep-copying a
    * GenericInternalRow per pair (profiled as the dominant serial stage
    * of the round-6 bench: 3 such branches pinned single cores for
    * minutes at sf0.1). This form — split once in a codegen'd project,
    * position explode, two element_at lookups — stays inside whole-stage
    * codegen end to end and emits identical rows (a size<2 array yields
    * no pairs, exactly like zipping a slice with its empty tail).
    */
  def wordBigrams(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(2), size(col("toks")))).as("i"))
      .select(col(idCol),
        element_at(col("toks"), col("i") - 1).as("tok_a"),
        element_at(col("toks"), col("i")).as("tok_b"))
  }

  /** DISTINCT word n-gram shingles: one row per (doc, space-joined
    * n-token window) — the containment-dedup primitive (q121). Same
    * codegen-friendly split-once + position-explode form as
    * [[wordBigrams]]; documents shorter than n yield no shingles.
    */
  def wordNgrams(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    // the shared tokenizer (empty tokens dropped): split of "" returns
    // [""], which at n=1 would pass the size >= n gate and emit an
    // empty-string shingle for a blank document, breaking the
    // zero-tokens convention — and an inline copy would drift
    val toks = wsTokens(lower(col(textCol)))
    df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(n), size(col("toks")))).as("i"))
      .select(col(idCol),
        concat_ws(" ", (n - 1 to 0 by -1).map(k =>
          element_at(col("toks"), col("i") - k)): _*).as("shingle"))
      .distinct()
  }

  /** Whitespace-delimited token count; a blank/whitespace-only text has
    * ZERO tokens (split of "" returns [""], which must not count).
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** Count of alphabetic word tokens (BPE-ish pre-tokenization class). */
  def alphaTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+")).cast("long")

  /** Count of punctuation characters. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.!?,;:]")).cast("long")

  /** BPE-style pre-tokenizer classes (GPT-2-like, without lookaheads so
    * the same pattern runs on Java regex and RE2): contractions, letter
    * runs, digit runs, non-space symbol runs.
    */
  val BpePattern: String = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s']+"

  /** Token count under BPE-ish pre-tokenization — the token-budget
    * estimator a training-data pipeline uses before actual BPE merges.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePattern)).cast("long")

  /** Non-overlapping occurrence count of a literal needle. The divisor
    * is the needle's CODE POINT count — Spark's length() counts code
    * points, so dividing by UTF-16 units would halve counts for
    * supplementary-plane needles (emoji). Empty needles are meaningless
    * (and would divide by zero).
    */
  def occurrences(text: Column, needle: String): Column = {
    require(needle.nonEmpty, "occurrences needs a non-empty needle")
    val cps = needle.codePointCount(0, needle.length)
    ((length(text) - length(replace(text, lit(needle), lit("")))) / cps)
      .cast("long")
  }

  /** Marker-word language scores: (lang, markers) pairs → per-lang score
    * = total marker occurrences. Surrounding spaces avoid substring hits.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "es" -> Seq(" el ", " y ", " los "),
    "zh" -> Seq(" de ", " le5 ", " shi "))

  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => occurrences(text, m)).reduce(_ + _)

  /** Predicted language: argmax of marker scores, ties broken by marker
    * list order (deterministic — required for oracle parity).
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    // first index whose score >= every later score == first global argmax
    def build(i: Int): Column =
      if (i == scores.length - 1) lit(scores(i)._1)
      else {
        val (lang, score) = scores(i)
        val later = scores.drop(i + 1).map(_._2)
        when(later.map(score >= _).reduce(_ && _), lang).otherwise(build(i + 1))
      }
    // NULL in, NULL out — without the guard every NULL-score comparison
    // is skipped and the terminal ELSE mislabels null text as the last
    // language in the marker list
    when(text.isNull, lit(null).cast("string")).otherwise(build(0))
  }

  /** Composite quality score in [0,1]: token mass, punctuation restraint,
    * stopword naturalness. Formula order is fixed — the oracle mirrors it
    * term for term so double arithmetic matches exactly.
    */
  def qualityScore(text: Column): Column = {
    val tokens = tokenCount(text).cast("double")
    val punct = punctCount(text).cast("double")
    val stops = occurrences(text, " the ").cast("double")
    val chars = length(text).cast("double")
    least(tokens / lit(50.0), lit(1.0)) * lit(0.4) +
      (lit(1.0) - least(punct / greatest(tokens, lit(1.0)), lit(1.0))) * lit(0.3) +
      least(stops * lit(10.0) / greatest(tokens, lit(1.0)), lit(1.0)) * lit(0.3)
  }
}
