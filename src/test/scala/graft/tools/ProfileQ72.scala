package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: q72's candidate volume + stage times at a given SF. */
object ProfileQ72 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 === 0)
    val cands = Dedup.minhashLshPairs(docs, "doc_id", "text",
      k = 3, numPerm = 16, bands = 16)
    timed("q72 candidates (distinct)")(println(cands.count()))
    timed("q72 full")(println(
      graft.queries.DedupQueries.queries("q72_dedup_lsh_verified")
        .apply(spark, sfDir).count()))
    spark.stop()
  }
}
