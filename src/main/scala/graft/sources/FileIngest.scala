package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** File discovery + post-load archiving (reference finder.py +
  * file.py:46-57), on the Hadoop FileSystem API so the same code works
  * against local disk, HDFS, or object stores.
  */
object FileIngest {

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
    f.rename(p, dest)
    dest.toString
  }
}
