package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet table directories.
  *
  * Streaming sinks and incremental merges (EtlPipeline.streamingMerge,
  * MartAccumulate appends) accrete many small files; at cluster scale
  * each file costs a task, a NameNode entry, and a footer read, so scan
  * parallelism degrades into scheduling overhead. Compaction rewrites
  * the directory into `ceil(bytes / targetBytes)` files and swaps the
  * result in atomically (same stage-then-rename discipline as
  * EtlPipeline's writeSwap — the write materializes before the old
  * directory is touched, because Spark cannot overwrite a path a lazy
  * plan still reads).
  *
  * The file census comes from the filesystem, not a data scan, so
  * deciding whether to compact is metadata-priced — callers can run
  * [[needsCompaction]] on every pipeline tick and pay a rewrite only
  * when fragmentation crossed the threshold.
  */
object Compaction {

  final case class Census(nFiles: Int, totalBytes: Long) {
    def avgBytes: Long = if (nFiles == 0) 0L else totalBytes / nFiles
  }

  /** A crash between compact()'s delete and rename leaves the ONLY copy
    * of the table at the stage path; treating that as an empty table
    * would silently drop it. Fail loudly with the recovery step instead
    * (same guard as EtlPipeline's readers for `__stage`).
    */
  private def guardInterrupted(fs: org.apache.hadoop.fs.FileSystem,
                               p: Path, path: String): Unit =
    if (!fs.exists(p) && fs.exists(new Path(path + "__compact")))
      throw new IllegalStateException(
        s"$path is missing but ${path}__compact exists — an interrupted " +
          "compaction swap. Recover by renaming the stage directory back " +
          "to the table path before re-running.")

  /** Count the data files and bytes under `path` (metadata-only). */
  def census(spark: SparkSession, path: String): Census = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    guardInterrupted(fs, p, path)
    if (!fs.exists(p)) Census(0, 0L)
    else {
      val files = fs.listStatus(p).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      Census(files.length, files.map(_.getLen).sum)
    }
  }

  /** True when the directory holds more than `maxFiles` data files
    * averaging under `minAvgBytes` — the fragmentation signature worth
    * a rewrite (a few small files, or many large ones, are both fine).
    */
  def needsCompaction(spark: SparkSession, path: String,
                      maxFiles: Int = 16,
                      minAvgBytes: Long = 8L * 1024 * 1024): Boolean = {
    val c = census(spark, path)
    c.nFiles > maxFiles && c.avgBytes < minAvgBytes
  }

  /** Rewrite `path` into `ceil(totalBytes / targetBytes)` parquet files
    * and atomically swap the result in. Returns the post-compaction
    * census. `coalesce` (not repartition) keeps the rewrite shuffle-free
    * — one streaming pass over the old files; row order within the
    * table is not part of the parquet contract. Note coalesce also caps
    * the READ parallelism at `nOut`; that is the right trade here
    * because a small `nOut` implies a small table (nOut scales with
    * total bytes), while a 100 TB-scale compaction gets hundreds of
    * output files and therefore hundreds of read tasks.
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Census = {
    val before = census(spark, path)
    if (before.nFiles == 0) return before
    val nOut = math.max(1L, (before.totalBytes + targetBytes - 1) / targetBytes).toInt
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(path + "__compact")
    spark.read.parquet(path).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(stage.toString)
    if (fs.exists(p)) fs.delete(p, true)
    if (!fs.rename(stage, p))
      throw new java.io.IOException(s"rename $stage -> $p failed")
    census(spark, path)
  }
}
