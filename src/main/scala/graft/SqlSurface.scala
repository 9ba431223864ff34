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

  /** Register the mergeable-summary family as SQL AGGREGATE functions
    * (the scalar functions — rolling_hash, vec_* — register via
    * GraftExtensions at session build; aggregates go through the
    * public `functions.udaf` + `spark.udf.register` path instead):
    *
    *  - `mg_sketch(tok)`      — Misra-Gries heavy-hitter summary
    *    (struct: n, counts map), width 63
    *  - `kmv_sketch(x)`       — KMV distinct-set sketch over a LONG
    *    (e.g. xxhash64(col)), k 1024
    *  - `quantile_summary(v)` — p25/p50/p75/p95 summary over a DOUBLE,
    *    capacity 4096 (exact below it)
    *  - `group_sample(key, id)` — bottom-8 (key, id) sample
    *
    * Parameters are fixed at registration (SQL has no constructor
    * arguments); Scala callers wanting other widths instantiate the
    * Aggregators directly. Returns the registered names.
    */
  def registerAggregates(spark: SparkSession): Seq[String] = {
    import org.apache.spark.sql.{Encoders, functions => F}
    spark.udf.register("mg_sketch",
      F.udaf(new graft.operators.HeavyHitters.MisraGries(63), Encoders.STRING))
    spark.udf.register("kmv_sketch",
      F.udaf(new NullSafeKmv(1024), Encoders.LONG))
    spark.udf.register("quantile_summary",
      F.udaf(new NullSafeQuantile(4096, Seq(25, 50, 75, 95)), Encoders.DOUBLE))
    spark.udf.register("group_sample",
      F.udaf(new NullSafeSample(8), Encoders.tuple(Encoders.LONG, Encoders.LONG)))
    Seq("mg_sketch", "kmv_sketch", "quantile_summary", "group_sample")
  }

  // SQL NULL handling: a primitive-encoder udaf decodes NULL inputs as
  // 0 and counts them — a phantom 0.0 drags quantiles, a phantom hash 0
  // permanently occupies KMV's minimum slot, a (0,0) pair wins the
  // bottom-k sample. Every built-in SQL aggregate IGNORES nulls; these
  // boxed-input wrappers restore that convention (MisraGries takes
  // String and already skips nulls in reduce).
  private final class NullSafeQuantile(capacity: Int, percents: Seq[Int])
    extends org.apache.spark.sql.expressions.Aggregator[
      java.lang.Double, graft.operators.QuantileSummary.QBuf,
      graft.operators.QuantileSummary.Quantiles] {
    private val inner = new graft.operators.QuantileSummary.QuantileAgg(capacity, percents)
    def zero = inner.zero
    def reduce(b: graft.operators.QuantileSummary.QBuf, v: java.lang.Double) =
      if (v == null) b else inner.reduce(b, v.doubleValue)
    def merge(a: graft.operators.QuantileSummary.QBuf,
              b: graft.operators.QuantileSummary.QBuf) = inner.merge(a, b)
    def finish(b: graft.operators.QuantileSummary.QBuf) = inner.finish(b)
    def bufferEncoder = inner.bufferEncoder
    def outputEncoder = inner.outputEncoder
  }

  private final class NullSafeKmv(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      java.lang.Long, graft.operators.KmvSketch.KmvBuf,
      graft.operators.KmvSketch.KmvSummary] {
    private val inner = new graft.operators.KmvSketch.KmvAgg(k)
    def zero = inner.zero
    def reduce(b: graft.operators.KmvSketch.KmvBuf, v: java.lang.Long) =
      if (v == null) b else inner.reduce(b, v.longValue)
    def merge(a: graft.operators.KmvSketch.KmvBuf,
              b: graft.operators.KmvSketch.KmvBuf) = inner.merge(a, b)
    def finish(b: graft.operators.KmvSketch.KmvBuf) = inner.finish(b)
    def bufferEncoder = inner.bufferEncoder
    def outputEncoder = inner.outputEncoder
  }

  private final class NullSafeSample(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      (java.lang.Long, java.lang.Long), graft.operators.GroupSample.SampleBuf,
      graft.operators.GroupSample.Sample] {
    private val inner = new graft.operators.GroupSample.GroupSampleAgg(k)
    def zero = inner.zero
    def reduce(b: graft.operators.GroupSample.SampleBuf,
               v: (java.lang.Long, java.lang.Long)) =
      if (v == null || v._1 == null || v._2 == null) b
      else inner.reduce(b, (v._1.longValue, v._2.longValue))
    def merge(a: graft.operators.GroupSample.SampleBuf,
              b: graft.operators.GroupSample.SampleBuf) = inner.merge(a, b)
    def finish(b: graft.operators.GroupSample.SampleBuf) = inner.finish(b)
    def bufferEncoder = inner.bufferEncoder
    def outputEncoder = inner.outputEncoder
  }

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
