package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Does the dedupIncrement verify ship its broadcast once or twice?
  *
  * METHODOLOGY (fixed in r12): the plan must be read AFTER executing
  * the probed DataFrame itself — `df.count()` runs a different
  * QueryExecution, leaving `df.queryExecution.executedPlan` an
  * unexecuted `isFinalPlan=false` AQE skeleton whose exchange lines say
  * nothing about reuse. The r11 probe had that flaw; the r12 rerun on
  * final plans CONFIRMS its conclusion with stage-level evidence:
  *
  *   - AQE ON (the suite's config): the two verify joins materialize
  *     DISTINCT BroadcastQueryStage ids over distinct (TableCache)
  *     stages — two copies build and ship. Caching the build side does
  *     not change it; neither does sharing one canonical child frame.
  *   - AQE OFF: the ReuseExchange rule fires and the second join reads
  *     a ReusedExchange — one copy.
  *
  * So on this Spark (4.1, local) the 2-copy footprint under AQE is a
  * planner property, not a plan-shape bug we can fix from the API:
  * the only single-copy reformulation is melting the pair's two sides
  * through ONE join + regroup, which shuffles every candidate WITH its
  * set payload — the exact 3× regression (164 s vs 52 s at sf1) the
  * broadcast form exists to avoid. The maxBroadcastSetBytes docs keep
  * the honest ~4× accounting (2 copies × ~2× UnsafeRow/HashedRelation
  * overhead).
  */
object ProbeReuse {
  def stages(df: DataFrame): (Boolean, List[String]) = {
    df.count() // warm caches the way the suite does
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    (plan.contains("isFinalPlan=true"),
      "BroadcastQueryStage \\d+".r.findAllIn(plan).toList ++
        "ReusedExchange".r.findAllIn(plan).toList)
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (fin, st) =
      stages(graft.queries.DedupQueries.queries("q85_dedup_increment")(spark, dir))
    println(s"q85 verify, AQE on  — final=$fin stages=$st")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (fin2, st2) =
      stages(graft.queries.DedupQueries.queries("q85_dedup_increment")(spark, dir))
    println(s"q85 verify, AQE off — final=$fin2 stages=$st2")
    spark.stop()
  }
}
