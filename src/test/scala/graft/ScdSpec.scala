package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd
import graft.queries.ScdQueries

class ScdSpec extends SparkSpec {

  test("buildHistory yields contiguous, non-overlapping versions per key") {
    val hist = ScdQueries.q11(spark, sf).cache()
    // exactly one open version per user
    val open = hist.filter(col("effective_to") === lit(Scd.OpenEnd).cast("timestamp"))
    val users = hist.select("user_id").distinct().count()
    assert(open.count() == users)
    // no version starts after it ends
    assert(hist.filter(col("effective_from") > col("effective_to")).count() == 0)
  }

  test("asOfJoin matches each fact to exactly one dim version") {
    val joined = ScdQueries.q12(spark, sf)
    val dupes = joined.groupBy("event_id").count().filter(col("count") > 1)
    assert(dupes.count() == 0, "a fact matched multiple versions")
  }

  test("scd1Merge actions partition the keyspace") {
    val m = ScdQueries.q13(spark, sf).cache()
    val dwhUsers = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_custkey") < 100).count()
    val stgOnly = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") >= 100).select("user_id").distinct().count()
    val actions = m.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actions.getOrElse("I", 0L) == stgOnly)
    assert(actions.values.sum == dwhUsers + stgOnly)
  }

  test("scd2Merge preserves closed history and keeps one open row per live key") {
    val merged = ScdQueries.q14(spark, sf).cache()
    val open = merged.filter(col("effective_to") === lit(Scd.OpenEnd).cast("timestamp"))
    val perKey = open.groupBy("user_id").count().filter(col("count") > 1)
    assert(perKey.count() == 0, "multiple open versions for a key")
    assert(merged.filter(col("deleted_flg")).count() ==
      open.filter(col("deleted_flg")).count(), "tombstones must be open-ended")
  }

  test("snapshotDiff classifies I/U/D, drops unchanged, and is null-safe") {
    val s = spark
    import s.implicits._
    val older = Seq(
      (1L, 10L, Option(1.0)),  // unchanged
      (2L, 20L, Option(2.0)),  // payload changes → U
      (3L, 30L, None),         // null → value  → U (null-safe compare)
      (4L, 40L, Option(4.0))   // disappears    → D
    ).toDF("k", "n", "v")
    val newer = Seq(
      (1L, 10L, Option(1.0)),
      (2L, 21L, Option(2.0)),
      (3L, 30L, Option(3.0)),
      (5L, 50L, Option(5.0))   // appears       → I
    ).toDF("k", "n", "v")
    val d = Scd.snapshotDiff(older, newer, Seq("k"), Seq("n", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "U", 3L -> "U", 4L -> "D", 5L -> "I"))
  }

  test("q129 dim chain: PIT assignments equal a driver recomputation; plan broadcasts") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val OpenEnd = Long.MaxValue
    // versioned lookup: key → sorted (from_us, payload); resolve ts to
    // the version whose [from, next_from) half-open window contains it
    // (effective_to = next_from − 1µs ⇒ identical membership)
    def hist[P](rows: Seq[(Long, Long, Long, P)]): Map[Long, IndexedSeq[(Long, P)]] =
      rows.groupBy(_._3).map { case (k, rs) =>
        k -> rs.sortBy(r => (r._2, r._1)).map(r => (r._2, r._4)).toIndexedSeq
      }
    def resolve[P](h: Map[Long, IndexedSeq[(Long, P)]], k: Long, us: Long): Option[P] =
      h.get(k).flatMap { vs =>
        val i = vs.lastIndexWhere(_._1 <= us)
        if (i < 0) None
        else {
          val next = if (i + 1 < vs.size) vs(i + 1)._1 else OpenEnd
          if (us < next) Some(vs(i)._2) else None // degenerate same-µs version
        }
      }
    val cards = hist(ev.filter(_._1 % 3 == 0)
      .map(e => (e._1, e._2, e._3, (e._3 * 7 + e._4.length) % 50)))
    val accounts = hist(ev.filter(_._1 % 3 == 1)
      .map(e => (e._1, e._2, e._3 % 50, (e._3 * 13 + e._1) % 20)))
    val clients = hist(ev.filter(_._1 % 3 == 2)
      .map(e => (e._1, e._2, e._3 % 20, e._4)))
    val expect = ev.flatMap { case (eid, us, uid, _) =>
      for {
        acct <- resolve(cards, uid, us)
        cli  <- resolve(accounts, acct, us)
        seg  <- resolve(clients, cli, us)
      } yield (eid, uid, acct, cli, seg)
    }.toSet
    val df = ScdQueries.q129(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got === expect)
    assert(got.nonEmpty, "the chain must resolve at least one fact")
    // the scale contract (round 10): three NATIVE as-of merges — the
    // old broadcast-equi-join + BETWEEN pin fanned every fact over all
    // intervals of its 50/20-cardinality key before filtering (~1.6e10
    // rows at sf1, 119 s); the as-of chain consumes each side once.
    // (AQE's toString prints final + initial plans; count the final only)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("AsOfJoin".r.findAllIn(plan).size === 3, plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("BroadcastHashJoin"))
  }

  test("q84 diff agrees with independently recomputed snapshots") {
    val d = ScdQueries.q84(spark, sf).cache()
    // D rows carry no new-state, I rows no old-state
    assert(d.filter(col("change_type") === "D" && col("new_n_events").isNotNull).count() == 0)
    assert(d.filter(col("change_type") === "I" && col("old_n_events").isNotNull).count() == 0)
    // U rows differ in at least one payload column
    assert(d.filter(col("change_type") === "U" &&
      col("old_n_events") === col("new_n_events") &&
      col("old_max_value") === col("new_max_value")).count() == 0)
    assert(d.count() > 0)
  }

  test("q159 bitemporal: beliefs equal a driver recompute, revisions exist") {
    val out = graft.queries.ScdQueries.q159(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
    // µs-precision arithmetic: Timestamp.getTime truncates to ms while
    // the query compares full microseconds — a version within 1 ms of
    // the cut (or of another version) would make a ms oracle wrong
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val vUs = us(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    val tUs = us(java.sql.Timestamp.valueOf("2024-01-21 00:00:00"))
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .filter(r => us(r._2) <= vUs)
    val expect = ev.groupBy(_._1).map { case (u, rows) =>
      val actual = rows.maxBy(r => (us(r._2), r._3))._4
      val known = rows.filter(r =>
        us(r._2) + (r._3 % 3) * 86400000000L <= tUs)
      val believed =
        if (known.isEmpty) "<none>" else known.maxBy(r => (us(r._2), r._3))._4
      u -> ((believed, actual, if (believed != actual) 1 else 0))
    }
    assert(out === expect, "bitemporal beliefs must match the driver recompute")
    assert(out.values.exists(_._3 == 1),
      "the lateness model must produce at least one revision")
    assert(out.values.exists(_._3 == 0), "and at least one stable belief")
  }
}
