package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding APPLY — the counterpart of [[BpeTrainer]]: encode
  * the corpus with a learned merge table (Sennrich et al. 2016 §3.2).
  * BpeTrainer derives the vocabulary; this operator is what a training
  * pipeline actually runs over 100 TB to turn text into token streams.
  *
  * Shape at scale: the merge table is vocabulary-sized metadata — it
  * broadcasts; the corpus is a single map pass (zero shuffle). The
  * per-word greedy loop (repeatedly merge the LOWEST-RANK adjacent
  * pair) is imperative per-row compute, so it lives in `mapPartitions`
  * next to the Multimodal codecs, with the rank map built once per
  * partition from the broadcast.
  *
  * Semantics match the trainer exactly: one rank merges ALL its
  * occurrences left-to-right (the trainer's replace-all step), so
  * encoding a training word with the full merge table reproduces the
  * trainer's final symbol state — property-asserted in CurationSpec.
  */
object BpeEncoder {

  case class EncodedDoc(doc_id: Long, n_words: Long, n_tokens: Long,
                        n_fused: Long)

  /** Encode one word with a (left,right)→rank map: repeatedly find the
    * lowest-rank adjacent pair and merge all its occurrences. Exposed
    * for direct spec testing against hand-computed tokenizations.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      var l: String = null; var r: String = null
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; l = syms(i); r = syms(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val ns = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            ns += l + r; j += 2
          } else { ns += syms(j); j += 1 }
        }
        syms = ns.toArray
        done = syms.length < 2
      }
    }
    syms
  }

  case class TokenRow(doc_id: Long, pos: Int, token: String)

  /** The full encoded token STREAM — what a training pipeline actually
    * materializes: one row per (doc, position, subword token), in
    * document order. Same single map pass and broadcast rank map as
    * [[encode]]; positions are dense from 0 within each document, so
    * downstream packing (q64's shape) and vocab-id assignment (a join
    * against the q96-style vocab frame) are plain relational steps.
    * CurationSpec cross-checks this stream's per-doc aggregate against
    * [[encode]]'s summary row for row.
    */
  def encodeTokens(df: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    val bRanks = spark.sparkContext.broadcast(ranks)
    val pairs = df.select(col(idCol).cast("long"),
      graft.functions.TextFunctions.wsTokens(lower(col(textCol))))
      .as[(Long, Seq[String])]
    pairs.mapPartitions { it =>
      val rk = bRanks.value
      it.flatMap { case (id, words) =>
        var pos = -1
        words.iterator.flatMap { w =>
          encodeWord(w, rk).iterator.map { t => pos += 1; TokenRow(id, pos, t) }
        }
      }
    }(Encoders.product[TokenRow]).toDF()
  }

  /** Per-document encoding summary: word count, BPE token count, and
    * how many emitted tokens are fused (length > 1 — the vocabulary
    * actually paying off). Words are lowercased whitespace tokens,
    * exactly the trainer's pre-tokenization.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    val bRanks = spark.sparkContext.broadcast(ranks)
    val pairs = df.select(col(idCol).cast("long"),
      graft.functions.TextFunctions.wsTokens(lower(col(textCol))))
      .as[(Long, Seq[String])]
    pairs.mapPartitions { it =>
      val rk = bRanks.value
      it.map { case (id, words) =>
        var nTok = 0L; var nFused = 0L
        words.foreach { w =>
          val toks = encodeWord(w, rk)
          nTok += toks.length
          toks.foreach(t => if (t.length > 1) nFused += 1)
        }
        EncodedDoc(id, words.length.toLong, nTok, nFused)
      }
    }(Encoders.product[EncodedDoc]).toDF()
  }
}
