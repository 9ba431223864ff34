package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension operators (reference etl.py:286-407).
  *
  * The reference performs SCD1/SCD2 as correlated UPDATE/INSERT SQL
  * against Postgres; here each merge is a declarative plan: one shuffle
  * on the natural key (the join), window functions over (key, ts), and a
  * union of the row classes. No driver-side iteration — the same plan
  * runs on 150 users or 10^9 keys; skew is AQE's problem.
  */
object Scd {

  val OpenEnd = "9999-12-31 00:00:00"

  // The sentinel as an ABSOLUTE instant (9999-12-31T00:00:00 UTC), not a
  // session-timezone string cast: histories are written and re-merged
  // across sessions, and a tz-dependent sentinel would misclassify every
  // open version the moment spark.sql.session.timeZone differs between
  // writer and merger (all in-repo sessions pin UTC; external callers
  // may not).
  private val openEndInstant =
    java.time.LocalDateTime.of(9999, 12, 31, 0, 0).toInstant(java.time.ZoneOffset.UTC)
  private def openEndTs: Column = lit(java.sql.Timestamp.from(openEndInstant))
  private val oneMicro = expr("INTERVAL 1 MICROSECOND")

  /** Snapshot-diff CDC extraction: classify every key across two
    * snapshots of the same entity as inserted ('I': key only in `newer`),
    * deleted ('D': key only in `older`), or updated ('U': key in both
    * with any payload column differing, null-safely); unchanged keys are
    * dropped. The change stream this emits is exactly what [[scd1Merge]]
    * / [[scd2Merge]] consume when a source system ships full snapshots
    * instead of a changelog — the reference infers the same three classes
    * inside its merge SQL (etl.py:297-407); extracting them first lets a
    * 100 TB pipeline ship only the (typically tiny) diff downstream.
    *
    * One full-outer equi-join on the key — a single co-partitioned
    * shuffle of each snapshot, no window, no driver state. Keys must be
    * non-null (they identify the entity); payload nulls are handled by
    * the null-safe comparison.
    */
  def snapshotDiff(older: DataFrame, newer: DataFrame,
                   keyCols: Seq[String], payloadCols: Seq[String]): DataFrame = {
    val o = older.as("o")
    val n = newer.as("n")
    val keyEq = keyCols.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val inOld = col(s"o.${keyCols.head}").isNotNull
    val inNew = col(s"n.${keyCols.head}").isNotNull
    val changed = payloadCols.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    o.join(n, keyEq, "full_outer")
      .filter(!inOld || !inNew || changed)
      .select(
        keyCols.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) ++
          Seq(when(!inOld, "I").when(!inNew, "D").otherwise("U").as("change_type")) ++
          payloadCols.map(c => col(s"o.$c").as(s"old_$c")) ++
          payloadCols.map(c => col(s"n.$c").as(s"new_$c")): _*)
  }

  /** Change stream → versioned history: each change row becomes a version
    * effective from its timestamp until the next change of the same key
    * (minus 1µs), the last version open-ended (reference's 9999-12-31,
    * main.ddl:154).
    *
    * `tieCol` makes ordering total when timestamps collide — version
    * boundaries must be deterministic for the merge to be reproducible.
    * Note that two changes sharing the SAME (key, ts) instant give the
    * earlier (by tie) row a degenerate `[ts, ts - 1µs]` interval — this
    * mirrors the SQL window formulation exactly (both engines agree, the
    * q11 oracle checks it), and degenerate intervals match no as-of
    * probe, so the final same-instant change wins every lookup. Collapse
    * same-instant changes upstream if degenerate rows are unwanted.
    */
  def buildHistory(changes: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    changes.select(
      (col(keyCol) +: payloadCols.map(col) :+
        col(tsCol).as("effective_from") :+
        coalesce(lead(col(tsCol), 1).over(w) - oneMicro, openEndTs).as("effective_to")): _*)
  }

  /** Point-in-time (as-of) join of a fact stream to a versioned dimension:
    * equi-join on the key FIRST (hash-partitionable, broadcastable), then
    * the `BETWEEN effective_from AND effective_to` range predicate as a
    * post-join filter — the reference's join shape
    * (trsh_rep_fraud_sync.sql:11-16) and the only shape that scales: a
    * pure range join would be a cross product per key.
    */
  def asOfJoin(facts: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, factTs: String): DataFrame =
    facts.join(dim,
      facts(factKey) === dim(dimKey) &&
        facts(factTs) >= dim("effective_from") &&
        facts(factTs) <= dim("effective_to"))

  /** SCD1 merge (reference etl.py:390-407): stg values overwrite matching
    * dwh rows when any payload column differs; unmatched stg keys insert.
    * Returns the post-merge table plus an `action` column
    * ('U'pdated / 'I'nserted / 'N'o-change) — the reference's run-log
    * counts fall out of a groupBy on it.
    *
    * dwh: (key, payload...); stg: (key, payload...). Null-safe change
    * detection (the reference uses INTERSECT, which is null-safe too).
    */
  def scd1Merge(dwh: DataFrame, stg: DataFrame, keyCol: String,
                payloadCols: Seq[String]): DataFrame = {
    val d = dwh.select(col(keyCol).as("d_key") +: payloadCols.map(c => col(c).as(s"d_$c")): _*)
    val s = stg.select(col(keyCol).as("s_key") +: payloadCols.map(c => col(c).as(s"s_$c")): _*)
    val j = d.join(s, col("d_key") === col("s_key"), "full_outer")
    val changed = payloadCols.map(c => !(col(s"d_$c") <=> col(s"s_$c"))).reduce(_ || _)
    val action = when(col("d_key").isNull, "I")
      .when(col("s_key").isNull, "N")
      .when(changed, "U")
      .otherwise("N")
    val outCols = payloadCols.map { c =>
      when(col("s_key").isNotNull, col(s"s_$c")).otherwise(col(s"d_$c")).as(c)
    }
    j.select((coalesce(col("d_key"), col("s_key")).as(keyCol) +: outCols :+ action.as("action")): _*)
  }

  /** SCD2 merge (reference etl.py:297-388): against a history table with
    * one open version per key, a full stg snapshot
    * (key, state..., create_dt):
    *  - open version, state unchanged        → kept open
    *  - open version, state changed          → closed at create_dt - 1µs,
    *                                           new open version inserted
    *  - open tombstone, key back in stg      → closed, live version
    *                                           inserted (revival — the
    *                                           reference's INTERSECT
    *                                           includes deleted_flg,
    *                                           etl.py:352-355, so even an
    *                                           identical-state return
    *                                           counts as a change)
    *  - open version, key absent from stg    → closed at deleteTs - 1µs,
    *                                           open tombstone inserted
    *                                           (deleted_flg, etl.py:297)
    *  - stg key unknown to the history       → new open version
    * Closed historical versions pass through untouched.
    */
  /** How deletion is detected in an SCD2 merge: what makes an open key
    * still "alive" at the source.
    */
  sealed trait Liveness
  /** Full snapshot staging: a key absent from stg is deleted. */
  case object SnapshotStg extends Liveness
  /** Incremental staging: deleted iff absent from this full key list. */
  final case class KeyList(keys: DataFrame) extends Liveness
  /** Arrival streams: nothing is ever deleted (no key list exists). */
  case object NoDeletes extends Liveness

  def scd2Merge(hist: DataFrame, stg: DataFrame, keyCol: String,
                stateCols: Seq[String], deleteTs: String): DataFrame =
    scd2MergeImpl(hist, stg, keyCol, stateCols, deleteTs, SnapshotStg)

  /** SCD2 merge for INCREMENTAL staging (reference etl.py:236-284
    * `from_database`): stg carries only rows whose change timestamp
    * passed the watermark, so "absent from stg" no longer means deleted.
    * Deletion is detected against `liveKeys` — the source's full key
    * list, pulled separately (the reference's `stg_del` table,
    * etl.py:256-266): an open version is tombstoned only when its key
    * has vanished from `liveKeys`; keys merely unchanged-since-watermark
    * stay open untouched. At 100 TB the key list is a column-pruned scan
    * of the source, orders of magnitude lighter than re-reading payloads.
    */
  def scd2MergeIncremental(hist: DataFrame, stg: DataFrame, liveKeys: DataFrame,
                           keyCol: String, stateCols: Seq[String],
                           deleteTs: String): DataFrame =
    scd2MergeImpl(hist, stg, keyCol, stateCols, deleteTs, KeyList(liveKeys))

  /** SCD2 merge for arrival streams (no snapshot, no key list): changed
    * keys version, new keys insert, absent keys stay open — deletions
    * are structurally impossible and cost nothing to "detect".
    */
  def scd2MergeNoDeletes(hist: DataFrame, stg: DataFrame, keyCol: String,
                         stateCols: Seq[String]): DataFrame =
    scd2MergeImpl(hist, stg, keyCol, stateCols, OpenEnd, NoDeletes)

  /** PRECONDITION (all modes): staged `create_dt` values must not
    * precede the open versions' `effective_from` — snapshots/changes
    * arrive in forward order, which the pipeline's watermark ordering
    * guarantees. A redelivered OLDER snapshot would close versions with
    * `effective_to < effective_from`; the watermark stores exist to make
    * that unrepresentable, and [[graft.pipeline.EtlPipeline]] persists
    * them with every table swap.
    */
  private def scd2MergeImpl(hist: DataFrame, stg: DataFrame, keyCol: String,
                            stateCols: Seq[String], deleteTs: String,
                            liveness: Liveness): DataFrame = {
    val delTs = lit(deleteTs).cast("timestamp")
    val outCols = (col(keyCol) +: stateCols.map(col)) :+
      col("effective_from") :+ col("effective_to") :+ col("deleted_flg")

    // Normalize NULLs on the way in — three-valued logic on d_flg /
    // effective_to would otherwise drop rows from EVERY branch filter
    // (silent history loss): a NULL deleted_flg means live, a NULL
    // effective_to means open-ended.
    val hasFlag = hist.columns.contains("deleted_flg")
    val h = (if (hasFlag) hist else hist.withColumn("deleted_flg", lit(false)))
      .withColumn("deleted_flg", coalesce(col("deleted_flg"), lit(false)))
      .withColumn("effective_to", coalesce(col("effective_to"), openEndTs))
    val closed = h.filter(col("effective_to") =!= openEndTs).select(outCols: _*)
    val open = h.filter(col("effective_to") === openEndTs)

    val d = open.select(
      (col(keyCol).as("d_key") +: stateCols.map(c => col(c).as(s"d_$c"))) :+
        col("effective_from").as("d_from") :+ col("deleted_flg").as("d_flg"): _*)
    val s = stg.select(
      (col(keyCol).as("s_key") +: stateCols.map(c => col(c).as(s"s_$c"))) :+
        col("create_dt").as("s_dt"): _*)
    val j0 = d.join(s, col("d_key") === col("s_key"), "full_outer")
    // `alive`: the key still exists at the source RIGHT NOW. Full
    // snapshot → presence in stg itself; incremental → presence in the
    // separately-pulled key list (joined on EITHER side's key, so a
    // changed-then-deleted key — in stg but gone from the list — is
    // correctly dead); arrival stream → always (a constant, NOT a
    // key-list join).
    val j = liveness match {
      case SnapshotStg => j0.withColumn("alive", col("s_key").isNotNull)
      case NoDeletes   => j0.withColumn("alive", lit(true))
      case KeyList(lk) =>
        val keys = lk.select(col(keyCol).as("k_key")).distinct()
          .withColumn("k_alive", lit(true))
        j0.join(keys, coalesce(col("d_key"), col("s_key")) === col("k_key"), "left")
          .withColumn("alive", coalesce(col("k_alive"), lit(false)))
          .drop("k_key", "k_alive")
    }
    // A state difference — or an open tombstone being overwritten by a
    // live stg row (revival) — closes the current version.
    val changed = stateCols.map(c => !(col(s"d_$c") <=> col(s"s_$c")))
      .reduce(_ || _) || col("d_flg")

    // ALL twelve post-join row classes are flag cases over the SAME
    // joined row, so they fuse into one projection: an array of
    // `when(case, struct)` entries, nulls filtered, exploded. The naive
    // union-of-filtered-branches formulation is a scale trap — each
    // branch's nullity filter pushes through the full-outer join and
    // SPECIALIZES it (inner / left / right per branch), so no exchange
    // or scan is ever reused: 13 separate joins and 50 parquet scans at
    // plan level. Fused: ONE full-outer join, one scan of each side,
    // and a map-side explode — a row firing k cases emits k rows,
    // exactly the union semantics (spec-asserted row-for-row, and the
    // q14 oracle hash-matches the reference formulation).
    def caseRow(key: Column, state: String => Column, from: Column, to: Column,
                flg: Column): Column =
      struct((key.as(keyCol) +: stateCols.map(c => state(c).as(c))) :+
        from.as("effective_from") :+ to.as("effective_to") :+ flg.as("deleted_flg"): _*)

    val bothP = col("d_key").isNotNull && col("s_key").isNotNull
    val dOnly = col("d_key").isNotNull && col("s_key").isNull
    val sOnly = col("d_key").isNull
    val alive = col("alive")
    val dState = (c: String) => col(s"d_$c")
    val sState = (c: String) => col(s"s_$c")

    val cases = Seq(
      // key present on both sides
      when(bothP && !changed && alive,
        caseRow(col("d_key"), dState, col("d_from"), openEndTs, col("d_flg"))),
      when(bothP && changed,
        caseRow(col("d_key"), dState, col("d_from"), col("s_dt") - oneMicro, col("d_flg"))),
      when(bothP && changed && alive,
        caseRow(col("d_key"), sState, col("s_dt"), openEndTs, lit(false))),
      // changed AND gone from the key list within one extraction window:
      // the change still happened — record it as a CLOSED live period
      // [s_dt, deleteTs), then tombstone. (The reference resolves this
      // case only on the following run; recording it immediately keeps
      // as-of queries correct in the gap.)
      when(bothP && changed && !alive,
        caseRow(col("d_key"), sState, col("s_dt"), delTs - oneMicro, lit(false))),
      when(bothP && !changed && !alive,
        caseRow(col("d_key"), dState, col("d_from"), delTs - oneMicro, col("d_flg"))),
      when(bothP && !alive,
        caseRow(col("d_key"), sState, delTs, openEndTs, lit(true))),
      // key only in history: deleted at source (close + tombstone) or
      // merely absent from an incremental batch (kept open)
      when(dOnly && !alive && !col("d_flg"),
        caseRow(col("d_key"), dState, col("d_from"), delTs - oneMicro, col("d_flg"))),
      when(dOnly && !alive && !col("d_flg"),
        caseRow(col("d_key"), dState, delTs, openEndTs, lit(true))),
      when(dOnly && (alive || col("d_flg")),
        caseRow(col("d_key"), dState, col("d_from"), openEndTs, col("d_flg"))),
      // key only in staging: insert — alive, or created-and-deleted
      // between extractions (a closed live period + tombstone, never an
      // open row for a key the source no longer has)
      when(sOnly && alive,
        caseRow(col("s_key"), sState, col("s_dt"), openEndTs, lit(false))),
      when(sOnly && !alive,
        caseRow(col("s_key"), sState, col("s_dt"), delTs - oneMicro, lit(false))),
      when(sOnly && !alive,
        caseRow(col("s_key"), sState, delTs, openEndTs, lit(true))))

    // duplicate `when` conditions (close+tombstone pairs) must stay two
    // distinct array entries — each emits its own output row
    val fused = j
      .select(explode(filter(array(cases: _*), x => x.isNotNull)).as("r"))
      .select(col(s"r.$keyCol") +: stateCols.map(c => col(s"r.$c")) :+
        col("r.effective_from") :+ col("r.effective_to") :+ col("r.deleted_flg"): _*)

    closed.unionByName(fused)
  }
}
