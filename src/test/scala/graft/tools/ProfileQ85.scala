package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for q85's dedupIncrement at a given SF —
  * mirrors the CURRENT (first-agreeing-band) pipeline stage by stage.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.tools.ProfileQ85"
  */
object ProfileQ85 {
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
    import graft.functions.BitmapFunctions.noEarlierBandMatch
    val base = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 === 0)
    val (indexBands, indexSets) = Dedup.nearDupIndex(
      base.filter(col("doc_id") % 8 === 0), "doc_id", "text",
      k = 3, numPerm = 16, bands = 16)
    val newDocs = base.filter(col("doc_id") % 8 =!= 0)
    val (newBands, newSets) = Dedup.nearDupIndex(newDocs, "doc_id", "text",
      k = 3, numPerm = 16, bands = 16)

    timed("warm bands/sets") {
      println((indexBands.count(), newBands.count(), indexSets.count(), newSets.count()))
    }

    val vsCorpus = newBands.select(col("doc_id").as("id_n"), col("band"), col("bucket"),
        col("buckets").as("bk_n"))
      .join(indexBands.select(col("doc_id").as("id_o"), col("band"), col("bucket"),
        col("buckets").as("bk_o")), Seq("band", "bucket"))
      .filter(col("id_n") =!= col("id_o"))
      .filter(noEarlierBandMatch(col("bk_n"), col("bk_o"), col("band")))
      .select(least(col("id_n"), col("id_o")).as("id_a"),
        greatest(col("id_n"), col("id_o")).as("id_b"))
    timed("vsCorpus (band-filtered)")(println(vsCorpus.count()))
    val l = newBands.select(col("doc_id").as("id_a"), col("band"), col("bucket"),
      col("buckets").as("bk_a"))
    val r = newBands.select(col("doc_id").as("id_b"), col("band"), col("bucket"),
      col("buckets").as("bk_b"))
    val vsBatch = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter(noEarlierBandMatch(col("bk_a"), col("bk_b"), col("band")))
      .select("id_a", "id_b")
    timed("vsBatch (band-filtered)")(println(vsBatch.count()))
    val cands = vsCorpus.union(vsBatch)
    timed("cands union count")(println(cands.count()))
    val allSets = indexSets.unionByName(newSets)
    val a = allSets.select(col("doc_id").as("id_a"), col("bm").as("bm_a"),
      col("set_size").as("size_a"))
    val b = allSets.select(col("doc_id").as("id_b"), col("bm").as("bm_b"),
      col("set_size").as("size_b"))
    val joined = cands.join(a, Seq("id_a")).join(b, Seq("id_b"))
    timed("verify-input join (unpersisted cands)")(println(joined.count()))
    timed("full q85")(println(
      graft.queries.DedupQueries.queries("q85_dedup_increment")
        .apply(spark, sfDir).count()))
    timed("full q85 again")(println(
      graft.queries.DedupQueries.queries("q85_dedup_increment")
        .apply(spark, sfDir).count()))
    spark.stop()
  }
}
