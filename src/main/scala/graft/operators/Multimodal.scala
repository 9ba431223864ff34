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
