package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal (the Gopher / MassiveText "repetition
  * compresses well" heuristic, Rae et al. 2021 §A1.3): documents whose
  * deflate ratio is extreme are boilerplate (very low) or noise (very
  * high), and both ends get filtered before LLM training.
  *
  * Shape at 100 TB: a pure map stage — zero shuffle, no driver state.
  * Per-row byte work (DEFLATE over the UTF-8 payload) is genuinely
  * imperative, so this sits in `mapPartitions` like the Multimodal codec
  * operators: ONE `Deflater` per partition, reset between rows (not one
  * per row — Deflater holds native zlib memory, and per-row allocation
  * at corpus scale churns native heap), released on task completion.
  *
  * Determinism: java.util.zip.Deflater with a fixed level and strategy
  * is a pure function of the input bytes on a given JDK, so the ratio
  * column is stable across runs and partitionings (asserted in
  * CurationSpec). It is NOT portable SQL — the query registers rows-only.
  */
object CompressionStats {

  case class DeflateRow(doc_id: Long, n_bytes: Long, n_deflate: Long,
                        ratio: Option[Double])

  /** Per-document deflate stats: raw UTF-8 size, deflated size (raw
    * stream, no zlib header so tiny docs aren't dominated by framing),
    * and their ratio rounded to 6 places (null for an empty text —
    * 0-byte input has no meaningful ratio).
    */
  def deflateStats(df: DataFrame, idCol: String, textCol: String,
                   level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"deflate level must be in [1,9], got $level")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
    pairs.mapPartitions { it =>
      val deflater = new java.util.zip.Deflater(level, /* nowrap = */ true)
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => deflater.end()))
      val buf = new Array[Byte](64 * 1024)
      it.map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        deflater.reset()
        deflater.setInput(bytes)
        deflater.finish()
        var out = 0L
        while (!deflater.finished()) out += deflater.deflate(buf)
        val ratio =
          if (bytes.length == 0) None
          else Some(BigDecimal(out.toDouble / bytes.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        DeflateRow(id, bytes.length.toLong, out, ratio)
      }
    }(Encoders.product[DeflateRow]).toDF()
  }
}
