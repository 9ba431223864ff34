package graft.tools

/** Regenerates the committed exchange-budget golden file consumed by
  * PlanLintSpec: one line per SparkEntry query —
  * `name<TAB>shuffleExchanges<TAB>broadcastExchanges` — counted from the
  * executed-plan string under the SAME session the spec uses
  * (SparkSpec.spark: local[4], 4 shuffle partitions, sf0.001 inputs), so
  * regenerated counts and asserted counts can never disagree on
  * environment.
  *
  * Run after a DELIBERATE plan change:
  *   sbt "Test/runMain graft.tools.RegenPlanBudgets"
  * then review the git diff of src/test/resources/plan_budgets.tsv —
  * every changed line is a plan-shape change you are signing off on.
  */
object RegenPlanBudgets {
  val goldenPath = "src/test/resources/plan_budgets.tsv"

  def exchangeCounts(plan: String): (Int, Int) = (
    // shuffle exchanges print as plain "Exchange hashpartitioning(...)";
    // the lookbehind keeps BroadcastExchange out
    "(?<!Broadcast)Exchange ".r.findAllIn(plan).size,
    "BroadcastExchange".r.findAllIn(plan).size)

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.spark
    val sf = graft.SparkSpec.sf
    // Build EVERY query before capturing ANY plan, from a CLEARED
    // cache — exactly what PlanLintSpec.queryDfs does. Capture order
    // matters: shared sub-plans registered with the cache manager by a
    // later build substitute InMemoryRelation into an earlier query's
    // executed plan, changing its exchange count; budgets must be read
    // from the same all-built state the spec asserts in.
    spark.catalog.clearCache()
    val dfs = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf)
    }
    val lines = dfs.map { case (name, df) =>
      val (s, b) = exchangeCounts(df.queryExecution.executedPlan.toString)
      s"$name\t$s\t$b"
    }
    val out = java.nio.file.Paths.get(goldenPath)
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"wrote ${lines.size} budgets to $goldenPath")
    spark.stop()
  }
}
