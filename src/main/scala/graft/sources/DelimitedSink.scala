package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Writer for the reference's daily flat-file format — the reverse of
  * [[DelimitedSource]], for handing marts BACK to legacy consumers
  * that still ingest `name_DDMMYYYY.ext` files (file.py:17-36):
  * `;`-delimited, header row, decimal commas, UTF-8, business date in
  * the filename.
  *
  * Shape contract: the legacy consumer reads ONE file per business
  * date, so the frame coalesces to a single part that is renamed into
  * place atomically — this sink is for MART-sized exports (the fraud
  * report a downstream team pulls, run-log extracts), never corpus
  * dumps; `maxRows` makes that explicit and the write REFUSES beyond
  * it rather than silently serializing a corpus through one task.
  */
object DelimitedSink {

  /** Write `df` as `<outDir>/<name>_<DDMMYYYY>.<ext>` and return the
    * path. `decimalCols` are rendered with decimal COMMAS (the format's
    * convention); every other column uses its canonical string form.
    * Nulls round-trip as empty fields ([[DelimitedSource]] reads them
    * back as null).
    */
  def write(df: DataFrame, outDir: String, name: String,
            businessDate: java.time.LocalDate,
            decimalCols: Seq[String] = Nil,
            ext: String = "txt",
            maxRows: Long = 10000000L): String = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"unsafe file name: $name")
    val missing = decimalCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"decimalCols not in frame: ${missing.mkString(", ")}")
    // one evaluation for both the checks and the write: mart frames
    // can sit on non-trivial upstream plans. try/finally so a failed
    // write (rename, part-count) never leaks the cached frame.
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = cached.count()
      require(n <= maxRows,
        s"$n rows exceed the single-file export bound $maxRows — " +
          "legacy flat files are for mart-sized extracts; raise maxRows " +
          "deliberately or export parquet")
      // the legacy format holds plain decimal digits: values the
      // DECIMAL(38,6) rendering below cannot represent faithfully
      // (|v| >= 1e32 overflows to NULL, 0 < |v| < 1e-6 rounds to 0)
      // must REFUSE, not silently corrupt
      if (decimalCols.nonEmpty) {
        val outOfRange = decimalCols.map(c =>
          col(c).isNotNull &&
            (abs(col(c)) >= 1e32 || (col(c) =!= 0.0 && abs(col(c)) < 1e-6)))
          .reduce(_ || _)
        val bad = cached.filter(outOfRange).count()
        require(bad == 0L,
          s"$bad rows carry decimal values outside the legacy format's " +
            "representable range [1e-6, 1e32) — export parquet instead")
      }

      // decimal rendering goes through DECIMAL, never the native double
      // toString: a DoubleType |value| >= 1e7 would serialize as '1.0E7'
      // and the legacy consumer gets '1,0E7'; the decimal cast is always
      // plain notation. Trailing fractional zeros (and a bare trailing
      // comma) strip so 12.50 round-trips as '12,5', 10.0 as '10'.
      val rendered = decimalCols.foldLeft(cached.toDF()) { (d, c) =>
        d.withColumn(c,
          regexp_replace(
            regexp_replace(
              regexp_replace(
                col(c).cast(org.apache.spark.sql.types.DecimalType(38, 6))
                  .cast("string"),
                "[.]", ","),
              "(,\\d*?)0+$", "$1"),
            ",$", ""))
      }
      val spark = df.sparkSession
      val dateTag = businessDate.format(
        java.time.format.DateTimeFormatter.ofPattern("ddMMyyyy"))
      val finalPath = new Path(s"$outDir/${name}_$dateTag.$ext")
      val tmp = new Path(s"$outDir/.tmp_${name}_$dateTag")
      val fs = tmp.getFileSystem(spark.sessionState.newHadoopConf())
      rendered.coalesce(1).write.mode("overwrite")
        .option("sep", ";").option("header", "true").option("encoding", "UTF-8")
        .csv(tmp.toString)
      val part = fs.globStatus(new Path(tmp, "part-*")) match {
        case Array(one) => one.getPath
        case other => throw new IllegalStateException(
          s"expected exactly one part file under $tmp, found ${other.length}")
      }
      if (fs.exists(finalPath)) fs.delete(finalPath, false)
      require(fs.rename(part, finalPath), s"rename $part -> $finalPath failed")
      fs.delete(tmp, true)
      finalPath.toString
    } finally cached.unpersist(blocking = false)
  }
}
