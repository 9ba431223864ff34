package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata extracted per partition.
  *
  * The decode step is STUBBED — this container has no image/audio
  * codecs — with a deterministic fake ([[decodeImageStub]]). Everything
  * Spark-side is real: binary column handling, case-class schema out,
  * partition-wise batching via mapPartitions (the Scala analog of
  * `mapInPandas` batch shape), no driver involvement.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Long, checksum: Long,
                       width: Int, height: Int, format: String)

  /** STUB decode: a real implementation would hand `bytes` to a codec;
    * here the "image header" is derived from the payload bytes so tests
    * are deterministic. Swap this single function for a real codec at
    * deploy time — the operator contract does not change.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, String) = {
    val w = 64 + (math.abs(bytes.headOption.getOrElse(0: Byte).toInt) % 16) * 64
    val h = 64 + (math.abs(bytes.lastOption.getOrElse(0: Byte).toInt) % 9) * 64
    val fmt = if (bytes.length % 2 == 0) "png" else "jpeg"
    (w, h, fmt)
  }

  /** Fixed-size frame sampling over a binary payload (the audio/video
    * frame-extraction batch shape): payload → overlapping `frameBytes`
    * windows every `strideBytes`, one output row per frame. Pure native
    * expressions — `substr` works on BinaryType — so the explode stays
    * inside codegen and distributes with the scan; a real decoder swaps
    * in per frame downstream.
    *
    * Frame positions are chosen so every frame is full-size:
    * n = floor((len - frameBytes)/stride) + 1 (0 when the payload is
    * shorter than one frame).
    */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
                  frameBytes: Int, strideBytes: Int): DataFrame = {
    import org.apache.spark.sql.functions.{array, col, explode, length, lit, sequence, when}
    df.withColumn("__nlast",
        ((length(col(payloadCol)) - frameBytes) / strideBytes).cast("int"))
      .withColumn("frame_no",
        explode(when(length(col(payloadCol)) >= frameBytes,
            sequence(lit(0), col("__nlast")))
          .otherwise(array().cast("array<int>"))))
      .select(col(idCol), col("frame_no"),
        col(payloadCol).substr(col("frame_no") * strideBytes + 1, lit(frameBytes))
          .as("frame"))
  }

  /** Extract typed metadata from an (id, binary-payload) DataFrame. */
  def extractMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    val pairs = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      val crc = new java.util.zip.CRC32()
      it.map { case (id, bytes) =>
        crc.reset()
        crc.update(bytes)
        val (w, h, fmt) = decodeImageStub(bytes)
        MediaMeta(id, bytes.length.toLong, crc.getValue, w, h, fmt)
      }
    }(Encoders.product[MediaMeta])
  }
}
