package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the reference's daily flat-file format (file.py:30-36):
  * `;`-delimited text, UTF-8 (BOM tolerated), decimal commas, business
  * date encoded in the filename as `name_DDMMYYYY.ext` (file.py:17-27).
  *
  * Re-expressed on Spark's native CSV source so schema inference,
  * partitioned listing, and predicate pushdown all apply; the filename
  * date comes from `input_file_name()` — evaluated executor-side, no
  * driver listing.
  */
object DelimitedSource {

  /** Read one file or a glob of files, attaching `create_dt` from the
    * filename business date — the column the reference keys its
    * incremental watermark on (etl.py:150).
    */
  def read(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("encoding", "UTF-8")
      .csv(pathGlob)
      .withColumn("create_dt", {
        // regexp_extract yields '' for non-matching names, and ANSI mode
        // makes to_date('') THROW executor-side — one stray file in the
        // glob must yield a null date, not an opaque parse error
        val d = regexp_extract(input_file_name(), FileIngest.BusinessDateRegex, 1)
        when(d === "", lit(null).cast("date")).otherwise(to_date(d, "ddMMyyyy"))
      })

  /** Normalize decimal-comma columns to doubles (file.py:33 replaces all
    * `,` with `.` before parsing — here it's per-column and codegen'd).
    */
  def normalizeDecimalColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, regexp_replace(col(c), ",", ".").cast("double"))
    }
}
