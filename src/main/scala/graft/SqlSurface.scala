package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** Explicit SQL surface for users coming from the reference's
  * raw-SQL workflow (trsh_rep_fraud_sync.sql, analysis SQL): one call
  * registers every test table and/or every registered query as a
  * session temp view, after which `spark.sql("SELECT ... FROM
  * q20_fraud_report")` works directly — including joins ACROSS query
  * views, which stay lazy composed plans that Catalyst optimizes as a
  * whole (a view is a logical plan, not a materialization).
  *
  * This is deliberately an explicit entry point, not a side effect of
  * query construction: the query builders themselves never touch
  * session state (OlapQueries.q38's design note — concurrent plan
  * building must stay race-free). Scalar/vector SQL functions
  * (`rolling_hash`, `vec_cosine`, ...) register separately via
  * `plans.GraftExtensions` at session build.
  */
object SqlSurface {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register the typed table loaders as temp views (events gets its
    * µs-timestamp conversion, documents/embeddings their parallelize
    * guard — same frames the Scala API serves). Returns the view names.
    */
  def registerTables(spark: SparkSession, dir: String): Seq[String] = {
    Seq("region" -> Tables.region _, "nation" -> Tables.nation _,
      "customer" -> Tables.customer _, "supplier" -> Tables.supplier _,
      "part" -> Tables.part _, "orders" -> Tables.orders _,
      "lineitem" -> Tables.lineitem _, "events" -> Tables.events _,
      "documents" -> Tables.documents _, "embeddings" -> Tables.embeddings _
    ).map { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
      name
    }
  }

  /** Register every SparkEntry query (or the named subset) as a temp
    * view under its full qNN_ name. Most queries are purely declarative
    * — their views are lazy logical plans and registration executes
    * nothing. The exceptions are the queries with a documented bounded
    * driver stage (q33/q78 train a model, q55 runs union-find,
    * q100/q101/q109 materialize metadata-sized sketches/edges): those
    * execute that stage AT REGISTRATION and their views snapshot its
    * result — register a subset if that cost is unwanted up front.
    * Returns the view names registered.
    */
  def registerQueries(spark: SparkSession, dir: String,
                      names: Seq[String] = Nil): Seq[String] = {
    val chosen =
      if (names.isEmpty) SparkEntry.queries
      else {
        val missing = names.filterNot(SparkEntry.queries.contains)
        require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")
        SparkEntry.queries.view.filterKeys(names.contains).toMap
      }
    chosen.map { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(name)
      name
    }.toSeq
  }
}
