package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-cost breakdown for q192_dedup_assign at a scale dir: banding
  * census, index build, stored-cluster backfill, and the assignment
  * itself, each timed separately (warm after one throwaway pass).
  */
object ProbeAssign {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t = 0.65
    val base = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 4 === 0)
    val idx = base.filter(col("doc_id") % 8 === 0)
    val batch = base.filter(col("doc_id") % 8 =!= 0)
    val choice = time("banding-census")(
      Dedup.adaptiveBanding(base, "doc_id", "text", 3, t))
    println(s"PROBE choice numPerm=${choice.numPerm} bands=${choice.bands} estPairsPerDoc=${choice.estPairsPerDoc}")
    val (ib, is) = Dedup.nearDupIndex(idx, "doc_id", "text", 3,
      choice.numPerm, choice.bands)
    time("index-build")(ib.count() + is.count())
    val stored = time("stored-backfill") {
      val s = Dedup.dedupClusters(
        Dedup.lshVerifiedPairs(idx, "doc_id", "text", 3, t,
          choice.numPerm, choice.bands, Some(choice.estPairsPerDoc))
          .select("id_a", "id_b"), "id_a", "id_b")
      s.count(); s
    }
    val n1 = time("assign-cold")(
      Dedup.assignIncrement(ib, is, stored, batch, "doc_id", "text", 3, t,
        choice.numPerm, choice.bands, Some(choice.estPairsPerDoc)).count())
    val n2 = time("assign-warm")(
      Dedup.assignIncrement(ib, is, stored, batch, "doc_id", "text", 3, t,
        choice.numPerm, choice.bands, Some(choice.estPairsPerDoc)).count())
    println(s"PROBE rows cold=$n1 warm=$n2")
    val p1 = time("pairs-q85-equiv")(
      Dedup.dedupIncrement(ib, is, batch, "doc_id", "text", 3, t,
        choice.numPerm, choice.bands, Some(choice.estPairsPerDoc)).count())
    println(s"PROBE pairRows=$p1")
    // stage split: edge discovery vs the cluster fold
    val e = time("edges-only") {
      val ed = Dedup.assignIncrementEdges(ib, is, stored, batch,
        "doc_id", "text", 3, t, choice.numPerm, choice.bands,
        Some(choice.estPairsPerDoc))
      println(s"PROBE edgeRows corpus=${ed.corpus.count()} batch=${ed.batch.count()}")
      ed
    }
    time("update-clusters-only")(
      Dedup.updateClusters(stored,
        e.corpus.unionByName(e.batch), "ea", "eb").count())
    spark.stop()
  }
}
