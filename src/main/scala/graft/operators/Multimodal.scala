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

  /** STUB resize: a real implementation hands the decoded image and
    * target dims to a codec; the deterministic fake keeps the contract —
    * output dims are the requested ones, the "resized" payload is a
    * stride-sampled byte subset sized proportionally to the pixel-count
    * ratio. Swap this one function for a real scaler at deploy time.
    */
  def resizeStub(bytes: Array[Byte], srcW: Int, srcH: Int,
                 dstW: Int, dstH: Int): Array[Byte] = {
    // Convention: an empty payload resizes to an empty payload (there
    // are no pixels to sample; indexing below would be out of bounds).
    if (bytes.isEmpty) return Array.emptyByteArray
    val ratio = (dstW.toLong * dstH).toDouble / math.max(1L, srcW.toLong * srcH)
    val outLen = math.max(1, math.min(bytes.length, (bytes.length * ratio).toInt))
    val stride = math.max(1, bytes.length / outLen)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) { out(i) = bytes(math.min(bytes.length - 1, i * stride)); i += 1 }
    out
  }

  case class Resized(doc_id: Long, width: Int, height: Int,
                     n_bytes: Long, checksum: Long)

  /** Resize every payload to (dstW, dstH): decode-stub for source dims,
    * resize-stub for the pixel work, re-checksum of the result — the
    * full decode→transform→re-encode batch shape, one partition at a
    * time, no driver involvement.
    */
  def resizeAll(df: DataFrame, idCol: String, payloadCol: String,
                dstW: Int, dstH: Int): Dataset[Resized] = {
    val pairs = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      val crc = new java.util.zip.CRC32()
      it.map { case (id, rawBytes) =>
        val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
        val (w, h, _) = decodeImageStub(bytes)
        val resized = resizeStub(bytes, w, h, dstW, dstH)
        crc.reset()
        crc.update(resized)
        Resized(id, dstW, dstH, resized.length.toLong, crc.getValue)
      }
    }(Encoders.product[Resized])
  }

  case class Featurized(doc_id: Long, features: Array[Double])

  /** Feature extraction: a 16-bin byte histogram per payload as an
    * `array<double>` feature vector (the stand-in for an embedding
    * model). One partition-local pass per payload — the same
    * mapPartitions batch shape as the other media operators (HOF
    * lambdas would evaluate interpreted, 16 passes per row).
    *
    * Convention: an empty payload yields the all-zero histogram (the
    * sums-to-1 contract applies only to non-empty payloads).
    */
  def byteHistogram(df: DataFrame, idCol: String, payloadCol: String): Dataset[Featurized] = {
    val pairs = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      it.map { case (id, rawBytes) =>
        // NULL payload == empty payload (all-zero histogram), matching
        // frameSample's tolerance — a nullable binary column must not
        // kill the job
        val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
        val hist = new Array[Double](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xF0) >> 4) += 1.0; i += 1 }
        val n = math.max(1, bytes.length).toDouble
        var b = 0
        while (b < 16) { hist(b) /= n; b += 1 }
        Featurized(id, hist)
      }
    }(Encoders.product[Featurized])
  }

  /** Extract typed metadata from an (id, binary-payload) DataFrame. */
  def extractMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    val pairs = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      val crc = new java.util.zip.CRC32()
      it.map { case (id, rawBytes) =>
        val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
        crc.reset()
        crc.update(bytes)
        val (w, h, fmt) = decodeImageStub(bytes)
        MediaMeta(id, bytes.length.toLong, crc.getValue, w, h, fmt)
      }
    }(Encoders.product[MediaMeta])
  }
}
