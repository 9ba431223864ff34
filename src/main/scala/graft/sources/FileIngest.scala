package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** File discovery + post-load archiving (reference finder.py +
  * file.py:46-57), on the Hadoop FileSystem API so the same code works
  * against local disk, HDFS, or object stores.
  */
object FileIngest {

  /** The `name_DDMMYYYY.ext` filename convention (file.py:17-27) — the
    * ONE definition every reader and the pipeline share.
    */
  val BusinessDateRegex: String = "_(\\d{8})\\.[A-Za-z0-9]+$"

  def businessDate(path: String): java.time.LocalDate = {
    val m = BusinessDateRegex.r.findFirstMatchIn(path).getOrElse(
      throw new IllegalArgumentException(s"no _DDMMYYYY business date in $path"))
    val d = m.group(1)
    java.time.LocalDate.of(d.substring(4, 8).toInt, d.substring(2, 4).toInt,
      d.substring(0, 2).toInt)
  }

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All files matching any of the glob templates under `dir`
    * (finder.py:14-23).
    */
  def find(spark: SparkSession, dir: String, templates: Seq[String]): Seq[String] = {
    val f = fs(spark, dir)
    templates.flatMap { t =>
      Option(f.globStatus(new Path(s"$dir/$t")))
        .map(_.toSeq.map(_.getPath.toString)).getOrElse(Seq.empty)
    }.distinct
  }

  /** Move a loaded file to `<dir>/archive/<name>.backup`
    * (file.py:46-51). Returns the archive path.
    */
  def archive(spark: SparkSession, filePath: String): String = {
    val p = new Path(filePath)
    val f = fs(spark, filePath)
    val archiveDir = new Path(p.getParent, "archive")
    if (!f.exists(archiveDir)) f.mkdirs(archiveDir)
    val dest = new Path(archiveDir, p.getName + ".backup")
    // rename reports failure via FALSE (e.g. destination already exists
    // from a redelivered same-named file) — swallowing it would leave
    // the file in the inbox marked as archived, and the next find()
    // would double-ingest it
    if (!f.rename(p, dest))
      throw new java.io.IOException(
        s"archive rename $p -> $dest failed (destination exists or source gone)")
    dest.toString
  }
}
