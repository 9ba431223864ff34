package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary LEARNING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the step between q82's coverage analysis and q56's tokenization:
  * actually deriving the merge table a tokenizer ships with.
  *
  * The classic trainer never iterates over the raw corpus: it runs on
  * the WORD-FREQUENCY table (SentencePiece and HuggingFace tokenizers
  * do exactly this). That split is what makes the op viable at 100 TB:
  *  - corpus-scale work = ONE tokenize + groupBy(word) shuffle,
  *    producing a vocabulary-sized frame (bounded by the language's
  *    word inventory, not the corpus);
  *  - the greedy merge loop then runs on that bounded state
  *    driver-side, under a LOUD `graft.bpe.maxVocab` bound (default
  *    2^20 — the q55 union-find / q88 node-count precedent for
  *    metadata-sized driver work).
  *
  * Determinism: ties on pair frequency break by the pair's lexical
  * order, so the merge table is a pure function of the corpus.
  */
object BpeTrainer {

  val DefaultMaxVocab: Long = 1L << 20

  /** One learned merge: rank-th most frequent adjacent symbol pair at
    * the time it was merged.
    */
  case class Merge(rank: Int, left: String, right: String,
                   merged: String, freq: Long)

  /** Learn `nMerges` BPE merges from a text column. Words are
    * whitespace tokens lowercased; initial symbols are characters.
    * Returns the merge table as a DataFrame (rank, left, right,
    * merged, freq).
    */
  def learn(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = df.sparkSession
    val wordFreq = df
      .select(explode(graft.functions.TextFunctions.wsTokens(lower(col(textCol))))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val maxVocab = spark.conf.getOption("graft.bpe.maxVocab")
      .map(_.toLong).getOrElse(DefaultMaxVocab)
    val n = wordFreq.count()
    require(n <= maxVocab,
      s"word vocabulary $n exceeds graft.bpe.maxVocab=$maxVocab: the merge " +
        "loop runs on the collected word-frequency table; raise the bound " +
        "only with driver memory to match")
    val words: Array[(Array[String], Long)] = wordFreq.collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val merges = learnFromWordFreq(words, nMerges)
    import spark.implicits._
    merges.toDF()
  }

  /** The exact greedy loop on (symbol-array, count) pairs — exposed for
    * direct testing against hand-computed merges.
    */
  def learnFromWordFreq(wordFreq: Array[(Array[String], Long)],
                        nMerges: Int): Seq[Merge] = {
    var words = wordFreq
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var continue = true
    while (rank <= nMerges && continue) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        // most frequent pair; ties break lexicographically — deterministic
        val ((l, r), f) = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += Merge(rank, l, r, l + r, f)
        words = words.map { case (syms, wf) =>
          val ns = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              ns += l + r; i += 2
            } else { ns += syms(i); i += 1 }
          }
          (ns.toArray, wf)
        }
        rank += 1
      }
    }
    out.result()
  }
}
