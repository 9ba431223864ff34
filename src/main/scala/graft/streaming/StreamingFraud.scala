package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming face of the engine: the same transforms that run
  * in batch (q32's windowed activity, the fraud rules) applied to a
  * `readStream` source with watermarking.
  *
  * The transform is *shared* between batch and stream — one definition,
  * two execution modes — which is the Spark-native answer to the
  * reference's "daily batch that should have been a stream".
  */
object StreamingFraud {

  /** Schema of the events stream (ts already µs). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window activity rollup — valid on both batch and streaming
    * DataFrames (append mode once a watermark is set).
    */
  def windowedActivity(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window exact distinct-user cardinality — the streaming twin
    * of CorpusQueries.q98. Distinct aggregates aren't supported in
    * streaming aggregation, so exactness comes from `collect_set` (a
    * supported streaming aggregate) sized at emit: one stateful
    * operator, valid in complete/update mode, and on a batch frame it
    * is exactly q98 (`size(collect_set)` ≡ `countDistinct` on non-null
    * keys).
    *
    * Scale note: state holds the user-id set per open window. When the
    * per-window set itself is too big for state, the scale path is the
    * append-mode chain `dropDuplicatesWithinWatermark(window, user)` →
    * windowed count (two stateful operators, state bounded by the
    * watermark), or `approx_count_distinct` when exactness is
    * negotiable — same trade q36 makes in batch.
    */
  def slidingDistinctUsers(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(size(collect_set(col("user_id"))).cast("long").as("n_users"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_users"), col("n_events"))

  /** The documented SCALE PATH for [[slidingDistinctUsers]]: per-window
    * distinct cardinality from a KMV sketch instead of `collect_set` —
    * O(k) state per open window regardless of how many distinct users it
    * sees. Below sketch capacity (window distinct < k) the estimate is
    * the EXACT count, so on test data this matches q98 row-for-row; at
    * 100 TB the same plan holds state constant and degrades to
    * ~1/sqrt(k) relative error. Valid on both batch and streaming
    * frames, like every twin in this file.
    */
  def slidingDistinctSketch(events: DataFrame, k: Int = 4096): DataFrame = {
    val kmv = udaf(new graft.operators.KmvSketch.KmvAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(kmv(xxhash64(col("user_id"))).as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"),
        round(graft.operators.KmvSketch.distinctCol(col("sk"), k))
          .cast("long").as("n_users"),
        col("n_events"))
  }

  /** Windowed streaming heavy hitters: q100's Misra-Gries Aggregator
    * registered as a udaf, so the SKETCH is the streaming aggregation
    * state — per hour window the state store holds one O(width) summary
    * instead of a counter per distinct key. This is the hot-key-alerting
    * shape: at 100 TB/day the per-window distinct-user state of an exact
    * count explodes, while the sketch state is constant-size and the
    * n/(width+1) error bound still guarantees every truly hot key
    * surfaces.
    *
    * Output: one row per (window, candidate key) with the lower-bound
    * count and the window's total event count. The candidate SET is a
    * guaranteed superset of keys with count > n_events/(width+1); the
    * per-key count underestimates by at most that same bound. The exact
    * membership of near-threshold candidates depends on merge order
    * (inherent to Misra-Gries) — the spec asserts the order-independent
    * guarantees against the exact batch counts, not row equality.
    */
  def hotUsersSketch(events: DataFrame, width: Int = 15): DataFrame = {
    val mg = udaf(new graft.operators.HeavyHitters.MisraGries(width),
      org.apache.spark.sql.Encoders.STRING)
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(mg(col("user_id").cast("string")).as("sketch"))
      .select(col("w.start").as("window_start"),
        col("sketch.n").as("n_events"),
        explode(col("sketch.counts")).as(Seq("user_id", "lb_count")))
  }

  /** Windowed streaming value percentiles: q107's quantile summary as
    * the streaming aggregation state — per (window, event_type) the
    * state store holds one O(capacity·log n) summary instead of every
    * value, which is what makes latency-percentile dashboards viable
    * at 100 TB/day (the exact formulation would buffer each window's
    * full value set in the store).
    *
    * Below capacity the summary never compacts and is merge-order
    * independent, so the stream is row-identical to the same
    * aggregation run in batch — the spec asserts exact equality, the
    * q101/q102 "exact below capacity" contract. Above capacity answers
    * stay rank-bounded (QuantileSummary's deterministic compaction)
    * but may depend on micro-batch arrival order, as any sketch does.
    */
  def valueQuantilesStream(events: DataFrame, capacity: Int = 4096): DataFrame = {
    val qagg = udaf(
      new graft.operators.QuantileSummary.QuantileAgg(capacity, Seq(50, 95)),
      org.apache.spark.sql.Encoders.scalaDouble)
    events
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(qagg(col("value")).as("s"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("s.n_events").as("n_events"),
        col("s.qs")(0).as("p50"), col("s.qs")(1).as("p95"))
  }

  /** Windowed streaming drift monitor — q112's total-variation drift as
    * a stream, the shape a deployed fraud model actually runs: each
    * 6-hour window's per-type value histogram compared against the
    * TRAINING-TIME baseline distribution. The baseline is a
    * types×bins literal map folded in as a constant expression, NOT a
    * join — so the transform stays one stateful aggregation (a join
    * after a streaming aggregation is unsupported), exactly how a
    * deployed monitor ships its reference distribution.
    *
    * State per (window, type): one BinHistogram — nBins longs —
    * regardless of window volume. The drift number is q112's exact
    * integer cross-multiplied TV numerator Σ|h_i·N_base − b_i·N_win|
    * (TV = num / (2·N_win·N_base)); no float forms, so batch and
    * stream agree bit-for-bit (spec asserts equality and a driver
    * recomputation). Event types absent from the baseline are dropped
    * — no reference distribution exists to compare against; route
    * those through the q99-style inventory instead.
    */
  def driftStream(events: DataFrame, baseline: Map[String, Seq[Long]],
                  nBins: Int = 20, binWidth: Double = 25.0): DataFrame = {
    require(baseline.nonEmpty, "drift needs a non-empty baseline histogram map")
    require(baseline.values.forall(_.length == nBins),
      s"every baseline histogram must have exactly $nBins bins")
    val hist = udaf(new graft.operators.BinHistogram.HistAgg(nBins),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(hist(least(floor(col("value") / binWidth), lit(nBins - 1L))
        .cast("long")).as("h"))
      .withColumn("bh", element_at(typedLit(baseline), col("event_type")))
      .filter(col("bh").isNotNull)
      .withColumn("n_base", aggregate(col("bh"), lit(0L), _ + _))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("h.n").as("n_events"), col("n_base"),
        aggregate(zip_with(col("h.bins"), col("bh"),
          (x, y) => abs(x * col("n_base") - y * col("h.n"))),
          lit(0L), _ + _).as("drift_num"))
  }

  /** Streaming twin of q128's CUSUM changepoint detector — the natural
    * companion of [[driftStream]] for the fraud-ops story (drift says
    * "the distribution moved"; CUSUM says "the level broke, on this
    * day"). The corpus-scale stateful work is this one streaming
    * aggregation: tumbling 1-day windows × type → counts, state one
    * long per open (day, type). The CUSUM fold and argmax belong in
    * [[changepointOf]], run each trigger over the materialized daily
    * frame — types×days rows, metadata next to the stream — because a
    * rank-over-window on top of a streaming aggregation is unsupported,
    * and at that size shouldn't be streamed anyway.
    */
  def changepointStream(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("day_start"), col("event_type"), col("n"))

  /** CUSUM argmax over a (event_type, day, n) daily-count frame — the
    * SHARED finisher: CurationQueries.q128 applies it to batch daily
    * counts, a deployed monitor applies it to [[changepointStream]]'s
    * output table each trigger, so stream = batch holds by construction
    * (StreamingSpec asserts it). Exact integers throughout: with D days
    * and N total events per type, S_d = Σ_{i≤d}(n_i·D − N); the
    * changepoint is argmax |S_d|, earliest-day tie-break. All windows
    * run over the types×days frame, never an event stream.
    */
  def changepointOf(daily: DataFrame, dayCol: String = "day"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wTot = Window.partitionBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.partitionBy("event_type").orderBy(col(dayCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wPick = Window.partitionBy("event_type")
      .orderBy(abs(col("s")).desc, col(dayCol).asc)
    daily
      .withColumn("n_days", count(lit(1)).over(wTot))
      .withColumn("n_total", sum(col("n")).over(wTot))
      .withColumn("s", sum(col("n") * col("n_days") - col("n_total")).over(wCum))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col(dayCol).as("change_day"),
        col("s").as("cusum_s"), abs(col("s")).as("cusum_abs"),
        col("n_days").cast("bigint").as("n_days"), col("n_total").as("n_total"))
  }

  /** Trailing-7-day burst scores over a (event_type, day, n) daily-count
    * frame — the SHARED finisher behind SignalQueries.q131 (batch) and
    * the deployed alarm: ONE daily-count stream ([[changepointStream]]'s
    * output table — tumbling 1-day windows × type) feeds BOTH monitors,
    * changepoint (WHEN did the level break) and burst (is TODAY
    * anomalous), each re-run per trigger over the materialized
    * types×days frame. Stream = batch by construction (StreamingSpec
    * asserts it against q131). RANGE frames on epoch-day so missing
    * days self-exclude; emitted only with a full 7-day baseline; ratio
    * is exact integer cross-multiplication (7·n·1e6 DIV base7).
    */
  def burstsOf(daily: DataFrame, dayCol: String = "day"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = daily.withColumn("ed",
      datediff(col(dayCol), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("event_type").orderBy(col("ed")).rangeBetween(-7, -1)
    d.withColumn("base7", sum("n").over(w))
      .withColumn("days7", count(lit(1)).over(w))
      .filter(col("days7") === 7)
      .withColumn("ratio_ppm", expr("(7 * n * 1000000) DIV base7"))
      .withColumn("is_burst", col("ratio_ppm") >= lit(1250000L))
      .select(col("event_type"), col(dayCol).as("day"), col("n"),
        col("base7"), col("ratio_ppm"), col("is_burst"))
  }

  /** Daily value totals as ONE stream — 1-day tumbling windows over the
    * non-null value stream in integer cents: the shared input frame of
    * the EWMA anomaly monitor ([[ewmaOf]]) and `SeriesQueries.q174`
    * (which runs the identical definition in batch).
    */
  def dailyValueStream(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).cast("long").as("c"))
      .select(expr("unix_micros(w.start) div 86400000000").cast("long").as("day"),
        col("c"))

  /** EWMA anomaly flags over a (day, c) daily-cents frame — the SHARED
    * finisher: SeriesQueries.q174 applies it to batch daily totals, a
    * deployed monitor applies it to [[dailyValueStream]]'s materialized
    * output table each trigger, so stream = batch holds by construction
    * (StreamingSpec asserts it). The baseline is an exact integer dot
    * product of the plan-time ppm weights `SeriesQueries.EwmaWeights`
    * over the PRIOR 14 observed days (the day under test excluded — a
    * spike must not damp its own deviation); rows emit only past the
    * warmup. The windows run over the ≤ |days| daily frame, never an
    * event stream.
    */
  def ewmaOf(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.queries.SeriesQueries.{EwmaWSum, EwmaWeights}
    val w = Window.orderBy("day")
    val ew = EwmaWeights.zipWithIndex.map { case (wt, k) =>
      lag(col("c"), k + 1).over(w) * lit(wt)
    }.reduce(_ + _)
    daily
      .withColumn("rn", row_number().over(w))
      .withColumn("ew", ew.cast("long"))
      .filter(col("rn") >= 15)
      .select(col("day"), col("c"),
        col("ew").as("ewma_scaled"),
        (col("c") * lit(EwmaWSum) - col("ew")).cast("long").as("dev"),
        when(abs(col("c") * lit(EwmaWSum) - col("ew")) * lit(10L) > col("ew") * lit(3L),
          lit("spike")).otherwise(lit("ok")).as("flag"))
  }

  /** Per-(user, type) event counts as ONE stream (windowless running
    * aggregation, complete/update output) — the shared input frame of
    * the behavior-entropy monitor ([[entropyOf]]) and
    * `InfoQueries.q178` (which builds the identical frame in batch).
    */
  def typeCountStream(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Per-user event-type entropy over a (user_id, event_type, n) count
    * frame — the SHARED finisher: InfoQueries.q178 applies it to the
    * batch counts, a deployed monitor applies it to
    * [[typeCountStream]]'s materialized output each trigger (stream =
    * batch asserted in StreamingSpec). Every LN term FLOORs to an
    * integer before summation (the q166 posture), so no cross-engine
    * or cross-trigger accumulation order exists. The rollup runs over
    * the users x types frame — already aggregated, never the event
    * stream.
    */
  def entropyOf(g: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // per-user totals via a window on the already-aggregated frame —
    // join-free on purpose: a self-join of a materialized streaming
    // sink view trips conflicting-attribute resolution, and the window
    // runs over users x types rows, never the event stream
    val wu = Window.partitionBy("user_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("n_events", sum("n").over(wu).cast("long"))
      .withColumn("n_types", count(lit(1)).over(wu).cast("long"))
      .groupBy("user_id")
      .agg(min("n_events").as("n_events"), min("n_types").as("n_types"),
        sum(floor(lit(1e6) * col("n") *
          log(col("n_events").cast("double") / col("n"))).cast("long"))
          .cast("long").as("term_sum"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        expr("term_sum DIV n_events").as("entropy_micro"))
  }

  /** Batch helper for [[driftStream]]: the per-type reference histogram
    * over a training window, collected to a driver map (types×bins —
    * metadata next to the corpus, the q55 union-find precedent).
    */
  def baselineHistogram(events: DataFrame, nBins: Int = 20,
                        binWidth: Double = 25.0): Map[String, Seq[Long]] =
    events
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"),
        least(floor(col("value") / binWidth), lit(nBins - 1L)).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        val bins = new Array[Long](nBins)
        // clamp like HistAgg.reduce so negative values land in bin 0
        rows.foreach { r =>
          val i = math.min(math.max(r.getLong(1), 0L), (nBins - 1).toLong).toInt
          bins(i) += r.getLong(2)
        }
        t -> bins.toIndexedSeq
      }

  /** Streaming source over a directory of parquet event files, watermarked
    * for state cleanup (10 min lateness — at scale this bounds the window
    * state store regardless of input volume).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .parquet(dir)
      .withWatermark("ts", "10 minutes")

  /** Per-user stateful velocity flagging via flatMapGroupsWithState:
    * emits (user_id, ts, k, prv_k) whenever consecutive events land in
    * different locations within an hour — the streaming twin of
    * FraudMart.r3Velocity.
    */
  case class Flag(user_id: Long, ts: java.sql.Timestamp, event_id: Long, k: Int, prv_k: Int)
  case class St(ts: Long, k: Int)

  /** Streaming sessionization: the stateful twin of the batch 30-min-gap
    * rule (OlapQueries.q37). Per user, events accumulate into the open
    * session; a gap larger than `gapMinutes` CLOSES the previous session
    * (emitted) and opens a new one.
    *
    * With `timeout = EventTimeTimeout` (streaming with a watermark set,
    * e.g. [[readEventStream]]) an idle user's final session is emitted
    * once the watermark passes its gap deadline, so state is bounded and
    * every session eventually closes. With the default `NoTimeout` (the
    * batch twin used in tests — batch execution never fires timeouts)
    * the final open session per user intentionally stays in state, so a
    * batch comparison matches on all non-final sessions.
    *
    * Late events: an event older than the open session's `last` extends
    * the session without moving `last` backwards (last = max) — a
    * regressing `last` would make the next on-time event spuriously
    * close the session.
    */
  case class Sess(user_id: Long, session_start: java.sql.Timestamp, n_events: Long)
  case class SessSt(start: Long, last: Long, n: Long)

  /** µs-precision epoch conversion — Timestamp.getTime is ms-truncating,
    * which would shift emitted session starts off the batch twin's
    * min(ts) by up to 999 µs.
    */
  private[streaming] def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private[streaming] def fromMicros(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  def sessionStream(events: DataFrame, gapMinutes: Int,
                    timeout: org.apache.spark.sql.streaming.GroupStateTimeout =
                      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    val useTimeout = timeout == GroupStateTimeout.EventTimeTimeout
    events.select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaLong))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[SessSt]) => {
          if (useTimeout && state.hasTimedOut) {
            // watermark passed the gap deadline: close the idle session
            val out = state.getOption.map(s => Sess(user, fromMicros(s.start), s.n))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(r => (micros(r._2), r._3))
            val out = scala.collection.mutable.ArrayBuffer[Sess]()
            var st = state.getOption
            sorted.foreach { case (_, ts, _) =>
              val t = micros(ts)
              st match {
                case Some(s) if t <= s.last + gapUs =>
                  // max(): a late event must not move `last` backwards
                  st = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  out += Sess(user, fromMicros(s.start), s.n)
                  st = Some(SessSt(t, t, 1))
                case None =>
                  st = Some(SessSt(t, t, 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              // deadline rounds UP to ms: flooring would set it up to
              // 999µs before last+gap, closing a session that a
              // boundary event (t <= last+gapUs) should still extend
              if (useTimeout)
                state.setTimeoutTimestamp(Math.floorDiv(s.last + gapUs + 999L, 1000L))
            }
            out.iterator
          }
        })(Encoders.product[SessSt], Encoders.product[Sess])
      .toDF()
  }

  /** Streaming exact dedup on the (user_id, event_type) key set.
    *
    * Keeps the FIRST-ARRIVING row per key (arrival order, not event
    * time — with out-of-order arrival the survivor can differ from the
    * batch argmin-by-ts of ExtendedQueries.q50; the KEY SET is
    * identical either way). With `withinWatermark = true` (requires a
    * watermarked stream, e.g. [[readEventStream]]) state for a key is
    * dropped once the watermark passes it, bounding state at the cost
    * of re-admitting a key that reappears much later; the default keeps
    * one state entry per distinct key for exact global dedup.
    */
  def dedupStream(events: DataFrame, withinWatermark: Boolean = false): DataFrame =
    if (withinWatermark) events.dropDuplicatesWithinWatermark("user_id", "event_type")
    else events.dropDuplicates("user_id", "event_type")

  /** Watermarked stream-stream interval join: purchases matched to the
    * same user's error events in the preceding `lookbackMinutes` — the
    * "conversion despite errors" enrichment. One shared definition for
    * batch and stream (pass the same watermarked stream twice for the
    * streaming self-join).
    *
    * Shape notes for the streaming engine: the equality key (user_id)
    * plus the bounded `BETWEEN` time condition is exactly what lets
    * Spark bound the join state — each side's buffered rows are dropped
    * once the OTHER side's watermark passes their join window, so state
    * is O(lookback × rate), not O(stream). In batch the same plan is a
    * plain shuffled equi-join with a range post-filter (the asOfJoin
    * shape) — never a cross product.
    */
  def purchasesAfterErrors(purchaseSide: DataFrame, errorSide: DataFrame,
                           lookbackMinutes: Int): DataFrame = {
    val p = purchaseSide.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    val e = errorSide.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("error_id"))
    p.join(e,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES") &&
          col("e_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("p_ts"),
        col("error_id"), col("e_ts"))
  }

  /** R4's streaming twin — the amount-guessing rule as a stateful
    * per-user buffer of the last 3 events. Each stored event carries its
    * own "smaller than its predecessor" bit (computed on arrival from
    * the then-newest event, so evicting older rows never changes it).
    * A purchase flags when the buffered window shows >=2 errors, all
    * within 96 h, and three consecutive decreasing amounts — the exact
    * conditions of the batch frames (`ROWS BETWEEN 3 PRECEDING AND 1
    * PRECEDING` / `2 PRECEDING AND CURRENT ROW`). State is 3 rows per
    * user, O(users), watermark-independent.
    */
  case class GuessFlag(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class Ev4(ts: Long, eid: Long, typ: String, value: Double, red: Boolean)
  case class Buf4(evs: List[Ev4])

  def guessingStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        // NaN sentinel: the batch twin's when(value < prv).otherwise(0)
        // yields bit=0 when either side is NULL; NaN comparisons are
        // false on both sides of <, reproducing that exactly — and the
        // non-nullable Double encoder never sees a null
        coalesce(col("value").cast("double"), lit(Double.NaN)))
      .as[(Long, java.sql.Timestamp, Long, String, Double)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaLong,
          Encoders.STRING, Encoders.scalaDouble))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String, Double)],
         state: GroupState[Buf4]) => {
          // same total order as the batch window: (ts, event_id)
          val sorted = rows.toSeq.sortBy(r => (micros(r._2), r._3))
          val out = scala.collection.mutable.ArrayBuffer[GuessFlag]()
          var buf = state.getOption.map(_.evs).getOrElse(Nil) // newest first
          sorted.foreach { case (_, ts, eid, typ, value) =>
            val t = micros(ts)
            // bit vs the CURRENT newest (this event's immediate
            // predecessor); batch's when(v < prv).otherwise(0) → false
            // when there is no predecessor
            val red = buf.headOption.exists(p => value < p.value)
            val prev3 = buf.take(3)
            if (typ == "purchase" && prev3.nonEmpty) {
              val errs = prev3.count(_.typ == "error")
              val minDt = prev3.map(_.ts).min
              val redRun = red && buf.take(2).forall(_.red) // this + 2 preceding bits
              if (errs >= 2 && t < minDt + 96L * 3600L * 1000000L && redRun)
                out += GuessFlag(user, ts, eid)
            }
            buf = (Ev4(t, eid, typ, value, red) :: buf).take(3)
          }
          state.update(Buf4(buf))
          out.iterator
        })(Encoders.product[Buf4], Encoders.product[GuessFlag])
      .toDF()
  }

  /** The WHOLE fraud report as one continuous stream — the reference's
    * nightly `mart_update` with the batch window removed. All four rules
    * share their definitions with the batch mart:
    *  - r1: stream-static broadcast join against the client dim
    *    (FraudMart.r1On works unchanged on a streaming frame),
    *  - r2: stream-static join against the maintained validity table,
    *  - r3: [[velocityStream]] (stateful last-location),
    *  - r4: [[guessingStream]] (stateful 3-event buffer).
    * `customer` and `validity` are static/slowly-updating relations — at
    * scale, Delta-style tables refreshed by the batch pipeline.
    */
  def reportStream(events: DataFrame, customer: DataFrame,
                   validity: DataFrame): DataFrame = {
    val common = Seq("event_id", "event_dt", "user_id", "rule")
    graft.pipeline.FraudMart.r1On(events, customer).select(common.map(col): _*)
      .unionByName(graft.pipeline.FraudMart.r2On(events, validity)
        .select(common.map(col): _*))
      .unionByName(velocityStream(events)
        .select(col("event_id"), col("ts").as("event_dt"), col("user_id"),
          lit(3).as("rule")))
      .unionByName(guessingStream(events)
        .select(col("event_id"), col("ts").as("event_dt"), col("user_id"),
          lit(4).as("rule")))
  }

  /** Streaming twin of the q104 transition matrix: per-user stateful
    * last-event memory emits one (prev_type, next_type) pair per
    * consecutive event pair — O(1) state per user, pairs aggregate
    * downstream into the bounded types² matrix. Within a micro-batch
    * events sort by the batch twin's (ts, event_id) total order; across
    * batches the chain continues from state, so in-order delivery per
    * user (the watermarked-ingest contract) keeps the stream
    * pair-identical to the batch lag window.
    *
    * State is ONLY the last event's type string — the chain's timestamp
    * never feeds the output, so carrying it would be dead weight in the
    * state store at user-population scale.
    */
  case class Trans(user_id: Long, prev_type: String, next_type: String)

  def transitionsStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaLong,
          Encoders.STRING))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[String]) => {
          // sort by (ts, event_id) — the batch twin's lag-window order
          val sorted = rows.toSeq.sortBy(r => (micros(r._2), r._3))
          val out = scala.collection.mutable.ArrayBuffer[Trans]()
          var prev = state.getOption
          sorted.foreach { case (_, _, _, tpe) =>
            prev.foreach(p => out += Trans(user, p, tpe))
            prev = Some(tpe)
          }
          prev.foreach(state.update)
          out.iterator
        })(Encoders.STRING, Encoders.product[Trans])
      .toDF()
  }

  // NOT private: Janino-generated encoder projections cannot call
  // private case-class accessors — codegen fails and every row falls
  // back to interpreter mode (visible as "Expr codegen error" warns)
  case class ConvState(viewUs: Long, converted: Boolean)
  case class Conversion(user_id: Long, view_us: Long,
                                purchase_us: Long, latency_s: Double)

  /** Stateful first-conversion detection — q123's per-user latency rows
    * as a stream: one tiny (earliest-view, converted?) record per user,
    * a conversion emitted exactly once at the user's FIRST purchase at
    * or after their FIRST view. Same contract as the other stateful
    * twins (velocity/guessing/transitions): events sort by (ts,
    * event_id) inside each group so the stateful path and q123's
    * min-aggregate formulation cannot diverge on ties, and the spec
    * asserts row equality of the emitted latencies with the batch
    * definition on closed history.
    *
    * Caveat shared with every NoTimeout stateful twin here: an
    * already-converted user's record stays in state (one small row per
    * user); the watermark-timeout variant is the sessionStream
    * precedent if eviction matters.
    */
  def conversionStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .as[(Long, java.sql.Timestamp, String, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.STRING,
          Encoders.scalaLong))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, String, Long)],
         state: GroupState[ConvState]) => {
          val sorted = rows.toSeq.sortBy(r => (micros(r._2), r._4))
          var st = state.getOption.getOrElse(ConvState(Long.MaxValue, converted = false))
          val out = scala.collection.mutable.ArrayBuffer[Conversion]()
          sorted.foreach { case (_, ts, tpe, _) =>
            val us = micros(ts)
            if (tpe == "view" && us < st.viewUs && !st.converted)
              st = ConvState(us, st.converted)
            else if (tpe == "purchase" && !st.converted && us >= st.viewUs) {
              out += Conversion(user, st.viewUs, us, (us - st.viewUs) / 1e6)
              st = ConvState(st.viewUs, converted = true)
            }
          }
          state.update(st)
          out.iterator
        })(Encoders.product[ConvState], Encoders.product[Conversion])
      .toDF()
  }

  def velocityStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val flagEnc = Encoders.product[Flag]
    val stEnc = Encoders.product[St]
    // Null-k events must STAY in the state chain (the batch window's lag
    // passes through them, and pairs touching them never flag) but the
    // non-nullable tuple encoder would kill the stream on a null — use a
    // sentinel and skip flag pairs touching it. Int.MinValue is outside
    // any real location-id domain.
    val NoK = Int.MinValue
    val withK = events
      .withColumn("k", coalesce(
        get_json_object(col("props"), "$.k").cast("int"), lit(NoK)))
      .select(col("user_id"), col("ts"), col("k"), col("event_id"))
    withK.as[(Long, java.sql.Timestamp, Int, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaInt,
          Encoders.scalaLong))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Int, Long)],
         state: GroupState[St]) => {
          // sort by (ts, event_id) — the SAME total order as the batch
          // twin's Window.orderBy(ts, event_id), so timestamp ties cannot
          // make the two paths diverge; µs precision to match the batch
          // INTERVAL arithmetic exactly
          val sorted = rows.toSeq.sortBy(r => (micros(r._2), r._4))
          val out = scala.collection.mutable.ArrayBuffer[Flag]()
          var prev = state.getOption
          sorted.foreach { case (_, ts, k, eid) =>
            prev.foreach { p =>
              if (k != NoK && p.k != NoK && p.k != k &&
                  micros(ts) < p.ts + 3600L * 1000000L)
                out += Flag(user, ts, eid, k, p.k)
            }
            prev = Some(St(micros(ts), k))
          }
          prev.foreach(state.update)
          out.iterator
        })(stEnc, flagEnc)
      .toDF()
  }

  /** Reactivation alert — q144's dormancy profile as a live alarm: an
    * event arriving more than `gapUs` after the same user's previous
    * event fires immediately (the account-takeover precursor moment,
    * not the nightly rollup). State is ONE (ts µs) per user — O(users),
    * watermark-independent; within a micro-batch events process in the
    * batch twin's (ts, event_id) lag order, so stream flags equal the
    * batch window's gap > threshold rows exactly (StreamingSpec).
    */
  case class ReactFlag(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                       gap_us: Long)

  def reactivationStream(events: DataFrame,
                         gapUs: Long = 604800000000L): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaLong))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[Long]) => {
          val sorted = rows.toSeq.sortBy(r => (micros(r._2), r._3))
          val out = scala.collection.mutable.ArrayBuffer[ReactFlag]()
          var prev = state.getOption
          sorted.foreach { case (_, ts, eid) =>
            val us = micros(ts)
            prev.foreach { p =>
              if (us - p > gapUs) out += ReactFlag(user, ts, eid, us - p)
            }
            prev = Some(us)
          }
          prev.foreach(state.update)
          out.iterator
        })(Encoders.scalaLong, Encoders.product[ReactFlag])
      .toDF()
  }

  /** Streaming twin of q141's double-charge pair finder: a stateful
    * per-user buffer of the last 24 h of purchases; each arriving
    * purchase pairs against every buffered one within ±tolCents and
    * the window, then evicts entries too old to ever match again
    * (in-order delivery per user — the same watermarked-ingest
    * contract as [[transitionsStream]] — means future events only move
    * forward in time). State is O(purchases per user per day); the
    * batch twin's canonical (event_a < event_b BY ID) pair order is
    * reproduced by orienting each emitted pair by event_id, so the
    * stream is SET-equal to the batch band join by construction —
    * StreamingSpec asserts it.
    */
  case class ChargePair(user_id: Long, event_a: Long, event_b: Long,
                        gap_us: Long, cents_a: Long, cents_b: Long)
  case class Purch(us: Long, eid: Long, cents: Long)
  case class PairBuf(evs: List[Purch])

  def pairChargesStream(events: DataFrame, tolCents: Long = 500L,
                        windowUs: Long = 86400000000L): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("bigint"))
      .as[(Long, java.sql.Timestamp, Long, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaLong,
          Encoders.scalaLong))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long)],
         state: GroupState[PairBuf]) => {
          // the batch band join has no window order, but per-user
          // in-order processing needs a total order within the batch:
          // (ts, event_id), as every other twin
          val sorted = rows.toSeq.sortBy(r => (micros(r._2), r._3))
          val out = scala.collection.mutable.ArrayBuffer[ChargePair]()
          var buf = state.getOption.map(_.evs).getOrElse(Nil)
          sorted.foreach { case (_, ts, eid, cents) =>
            val us = micros(ts)
            // evict first: too-old entries cannot match this or any
            // later event (us only grows)
            buf = buf.filter(p => us - p.us <= windowUs)
            buf.foreach { p =>
              if (math.abs(p.cents - cents) <= tolCents && p.eid != eid) {
                // canonical orientation: event_a = smaller event_id
                if (p.eid < eid)
                  out += ChargePair(user, p.eid, eid, us - p.us, p.cents, cents)
                else
                  out += ChargePair(user, eid, p.eid, p.us - us, cents, p.cents)
              }
            }
            buf = Purch(us, eid, cents) :: buf
          }
          state.update(PairBuf(buf))
          out.iterator
        })(Encoders.product[PairBuf], Encoders.product[ChargePair])
      .toDF()
  }

  /** Live root-cause enrichment — q161's latest-error-before-purchase
    * as a stream: every purchase emits immediately with the user's
    * freshest error so far and the exact µs gap. State is ONE error
    * (ts, id) per user — O(users), watermark-independent. Within a
    * micro-batch rows process in (ts, errors-before-purchases,
    * event_id) order: the batch oracle admits a same-timestamp error
    * (`e.ts <= p.ts`) regardless of event id, so errors at a purchase's
    * exact timestamp must update state BEFORE the purchase fires —
    * with that tie rule, stream output equals q161 exactly on in-order
    * arrival (StreamingSpec).
    */
  case class ErrState(e_ts: java.sql.Timestamp, e_us: Long, error_id: Long)
  case class ErrFlag(purchase_id: Long, user_id: Long,
                     p_ts: java.sql.Timestamp, error_id: Long,
                     e_ts: java.sql.Timestamp, gap_us: Long)

  def lastErrorStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.filter(col("event_type").isin("error", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("event_type") === "purchase").as("is_p"))
      .as[(Long, java.sql.Timestamp, Long, Boolean)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP,
          Encoders.scalaLong, Encoders.scalaBoolean))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Boolean)],
         state: GroupState[ErrState]) => {
          // false < true: errors sort before purchases at equal ts
          val sorted = rows.toSeq.sortBy(r => (micros(r._2), r._4, r._3))
          val out = scala.collection.mutable.ArrayBuffer[ErrFlag]()
          var last = state.getOption
          sorted.foreach { case (_, ts, eid, isP) =>
            if (!isP) last = Some(ErrState(ts, micros(ts), eid))
            else last.foreach { e =>
              out += ErrFlag(eid, user, ts, e.error_id, e.e_ts,
                micros(ts) - e.e_us)
            }
          }
          last.foreach(state.update)
          out.iterator
        })(Encoders.product[ErrState], Encoders.product[ErrFlag])
      .toDF()
  }

  /** Streaming as-of join that is CORRECT UNDER LATE DIMENSION UPDATES —
    * the update-stream twin of the native batch operator
    * (plans/AsOfJoin.scala) and the piece [[lastErrorStream]] doesn't
    * give you: lastErrorStream resolves each fact against the versions
    * seen SO FAR, so a version that arrives out of order — after a fact
    * whose event time it precedes — is silently missed. Here facts
    * BUFFER in state until the event-time watermark passes their
    * timestamp; only then can no version with `v.ts <= f.ts` still
    * arrive (any later arrival is below the watermark and dropped by
    * the engine), so the resolution each fact emits is final and equals
    * the batch as-of exactly. This is the streaming SCD lookup: facts
    * stream in while the dimension's version stream runs behind by up
    * to the watermark delay.
    *
    * Inputs: `facts(fact_id, user_id, ts)` and
    * `versions(user_id, ts, version_id, cents)`; output one row per
    * fact that has a version at-or-before it (inner as-of, ties to the
    * latest (ts, version_id) — the q160/q161 oracle rule).
    *
    * With the default `NoTimeout` (batch execution — timeouts never
    * fire in batch) the group function sees each key's full history
    * once, the watermark is treated as +infinity, and every fact
    * resolves: batch output IS the batch as-of join, which is what the
    * q164 oracle checks. With `EventTimeTimeout` (streaming; both
    * inputs must carry a watermark at least as large as the real
    * disorder), pending facts emit as the watermark passes them, and a
    * timeout at watermark+1ms keeps an idle key draining.
    *
    * End-of-stream drain: the engine's watermark is max-event-time
    * minus delay, so it NEVER passes the final delay-window of facts —
    * without help they'd sit in state forever once the feed stops (the
    * sessionStream "final open session" caveat). `closeAtUs` is the
    * explicit close watermark that drains them: the CALLER's promise
    * that every version with event time < closeAtUs has already been
    * delivered (the dimension feed is caught up / closed to there).
    * Facts below `max(engine watermark, closeAtUs)` then resolve
    * finally against the versions seen so far. Set it to (max fact
    * event time + 1µs) when replaying a closed feed, or to the
    * dimension source's committed offset frontier on a live one; keys
    * drain at their next invocation (their arrival batch, or the
    * watermark+1ms timeout for already-pending state). Leave it None
    * for the engine-watermark-only behavior — correct under arbitrary
    * version lateness within the delay, but final-window facts pend.
    *
    * Scale: state per key is the pending-fact buffer (bounded by the
    * watermark delay x per-key fact rate) plus the version list pruned
    * to the latest version at-or-before the resolution frontier — O(1)
    * per key when versions arrive at dimension-update rates. One
    * shuffle by key; per-invocation work is a sort of the new rows plus
    * a linear merge.
    */
  case class AsOfVer(v_us: Long, v_id: Long, cents: Long)
  case class AsOfFact(f_us: Long, f_id: Long)
  case class AsOfSt(versions: List[AsOfVer], pending: List[AsOfFact])
  case class AsOfOut(fact_id: Long, user_id: Long, f_ts: java.sql.Timestamp,
                     version_id: Long, v_ts: java.sql.Timestamp, v_cents: Long)

  def asOfUpdateStream(facts: DataFrame, versions: DataFrame,
                       timeout: org.apache.spark.sql.streaming.GroupStateTimeout =
                         org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
                       closeAtUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val useTimeout = timeout == GroupStateTimeout.EventTimeTimeout
    val tagged = facts
      .select(col("user_id"), col("ts"), col("fact_id").as("id"),
        lit(0L).as("cents"), lit(true).as("is_fact"))
      .unionByName(versions
        .select(col("user_id"), col("ts"), col("version_id").as("id"),
          col("cents"), lit(false).as("is_fact")))
    tagged
      .as[(Long, java.sql.Timestamp, Long, Long, Boolean)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP,
          Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaBoolean))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long, Boolean)],
         state: GroupState[AsOfSt]) => {
          var st = state.getOption.getOrElse(AsOfSt(Nil, Nil))
          if (!(useTimeout && state.hasTimedOut)) {
            val rs = rows.toSeq
            val nv = rs.collect { case (_, ts, id, c, false) => AsOfVer(micros(ts), id, c) }
            val nf = rs.collect { case (_, ts, id, _, true) => AsOfFact(micros(ts), id) }
            st = AsOfSt((st.versions ++ nv).sortBy(v => (v.v_us, v.v_id)),
              st.pending ++ nf)
          }
          // Watermark W (ms) guarantees no future row with event time
          // < W. A fact STRICTLY below W (µs-floored) can therefore
          // never gain another admissible version (v_us <= f_us < W·1000
          // implies the version's event time is below W) — it is final.
          // closeAtUs extends the finality frontier by the caller's
          // promise (version feed complete below it) — the end-of-stream
          // drain the engine watermark alone can never provide.
          val safeUs =
            if (useTimeout)
              math.max(state.getCurrentWatermarkMs() * 1000L,
                closeAtUs.getOrElse(Long.MinValue))
            else Long.MaxValue
          val (ready, still) = st.pending.partition(_.f_us < safeUs)
          val out = ready.sortBy(f => (f.f_us, f.f_id)).flatMap { f =>
            // latest version at-or-before the fact: list is sorted by
            // (v_us, v_id), so the last admissible element is the match
            st.versions.takeWhile(_.v_us <= f.f_us).lastOption.map(v =>
              AsOfOut(f.f_id, user, fromMicros(f.f_us), v.v_id,
                fromMicros(v.v_us), v.cents))
          }
          // prune versions: future facts all sit at or above
          // min(watermark, oldest still-pending fact); only the LATEST
          // version at-or-before that frontier can ever match again
          val frontier = (safeUs +: still.map(_.f_us)).min
          val (below, above) = st.versions.partition(_.v_us <= frontier)
          val kept = AsOfSt(below.takeRight(1) ++ above, still)
          if (kept.versions.isEmpty && kept.pending.isEmpty) state.remove()
          else {
            state.update(kept)
            // re-invoke as the watermark advances past pending facts
            if (useTimeout && kept.pending.nonEmpty)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          }
          out.iterator
        })(Encoders.product[AsOfSt], Encoders.product[AsOfOut])
      .toDF()
  }

  /** End-of-stream drain for [[asOfUpdateStream]]: batch-read the
    * STOPPED query's keyed state from its checkpoint (Spark's state
    * data source) and resolve every still-pending fact against the
    * versions its key had accumulated — the rows the engine watermark
    * could never release (it trails max event time by the delay, so
    * the final delay-window of facts pends forever once the feed
    * stops). Union the streamed output with this frame and the result
    * equals the batch as-of exactly (StreamingSpec).
    *
    * `closeAtUs` bounds the promise exactly as in the live operator:
    * only facts strictly below it drain (default: everything — the
    * feed is fully closed). Resolution reuses the operator's rule via
    * the same (v_us, v_id) struct ordering: latest admissible version,
    * ties to the larger version_id; keys with no admissible version
    * emit nothing (inner as-of). The state is watermark-delay-bounded
    * per key, so the HOF filter runs over tiny arrays — this is a
    * state-sized maintenance read, not a corpus scan.
    */
  def drainAsOfState(spark: SparkSession, checkpointDir: String,
                     closeAtUs: Long = Long.MaxValue): DataFrame = {
    val st = spark.read.format("statestore").load(checkpointDir)
    st.select(col("key.value").as("user_id"),
        col("value.groupState.versions").as("versions"),
        explode(col("value.groupState.pending")).as("f"))
      .filter(col("f.f_us") < lit(closeAtUs))
      .withColumn("v", array_max(expr("filter(versions, v -> v.v_us <= f.f_us)")))
      .filter(col("v").isNotNull)
      .select(col("f.f_id").as("fact_id"), col("user_id"),
        timestamp_micros(col("f.f_us")).as("f_ts"),
        col("v.v_id").as("version_id"),
        timestamp_micros(col("v.v_us")).as("v_ts"),
        col("v.cents").as("v_cents"))
  }
}
