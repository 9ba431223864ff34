package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Scd

/** Property-based invariants for the SCD2 operators under arbitrary
  * change streams — the reference's trickiest semantics (etl.py:297-388)
  * must hold for ANY input, not just the fixtures. (Raw scalacheck Gen
  * with fixed seeds — the scalatestplus bridge isn't in the offline
  * dependency cache.)
  */
class ScdPropertySpec extends SparkSpec {

  private val sparkStable = spark
  import sparkStable.implicits._

  /** Deterministic samples of a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(30), Seed(42L + i)))

  private def forAllSamples[A](g: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    samples(g, n).foreach(body)

  // change stream: (key, state, secondsOffset); offsets made unique per
  // key so version boundaries are well-defined
  private val changesGen: Gen[List[(Long, String, Int)]] =
    Gen.listOf(for {
      key <- Gen.choose(1L, 5L)
      state <- Gen.oneOf("a", "b", "c")
      off <- Gen.choose(0, 1000)
    } yield (key, state, off))

  private def toDf(rows: List[(Long, String, Int)]) = {
    val dedup = rows.groupBy(r => (r._1, r._3)).map(_._2.head).toSeq
    dedup.toDF("k", "state", "off")
      .withColumn("ts", expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,off)"))
      .withColumn("event_id", monotonically_increasing_id())
      .select("k", "state", "ts", "event_id")
  }

  test("buildHistory: per key — one open end, no overlaps, no gaps") {
    forAllSamples(changesGen) { rows =>
      if (rows.nonEmpty) {
        val hist = Scd.buildHistory(toDf(rows), "k", "ts", "event_id", Seq("state"))
          .collect()
          .groupBy(_.getAs[Long]("k"))
        hist.foreach { case (_, versions) =>
          val sorted = versions.sortBy(_.getAs[java.sql.Timestamp]("effective_from").getTime)
          // exactly one open-ended version, and it is the last one
          val open = sorted.filter(
            _.getAs[java.sql.Timestamp]("effective_to").toString.startsWith("9999"))
          assert(open.length === 1)
          assert(open.head === sorted.last)
          // consecutive versions: next.from == prev.to + 1µs (no gap/overlap)
          sorted.sliding(2).foreach {
            case Array(prev, next) =>
              val prevTo = prev.getAs[java.sql.Timestamp]("effective_to")
              val nextFrom = next.getAs[java.sql.Timestamp]("effective_from")
              val prevToUs = prevTo.getTime * 1000 + prevTo.getNanos / 1000 % 1000
              val nextFromUs = nextFrom.getTime * 1000 + nextFrom.getNanos / 1000 % 1000
              assert(nextFromUs - prevToUs === 1L,
                s"gap/overlap between versions: $prevTo -> $nextFrom")
            case _ => ()
          }
        }
      }
    }
  }

  test("scd2MergeIncremental == scd2Merge when stg is the full snapshot") {
    // With liveKeys = exactly the stg key set, the incremental path's
    // "absent from key list" coincides with the full-snapshot path's
    // "absent from stg" — the two merges must agree row-for-row on ANY
    // history × snapshot. This pins the refactor: the only intended
    // divergence is when stg is a strict subset of the live keys.
    val stgGen: Gen[List[(Long, String)]] =
      Gen.listOf(for {
        key <- Gen.choose(1L, 6L)
        state <- Gen.oneOf("a", "b", "c", "d")
      } yield (key, state)).map(_.distinctBy(_._1))
    forAllSamples(Gen.zip(changesGen, stgGen)) { case (histRows, stgRows) =>
      if (histRows.nonEmpty) {
        val hist = Scd.buildHistory(toDf(histRows), "k", "ts", "event_id", Seq("state"))
        val stg = stgRows.toDF("k", "state")
          .withColumn("create_dt", lit("2024-02-01 00:00:00").cast("timestamp"))
        val full = Scd.scd2Merge(hist, stg, "k", Seq("state"),
          deleteTs = "2024-02-01 00:00:00")
        val incr = Scd.scd2MergeIncremental(hist, stg, stg.select("k"), "k",
          Seq("state"), deleteTs = "2024-02-01 00:00:00")
        assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty,
          "incremental with liveKeys==stg keys must equal the full-snapshot merge")
      }
    }
  }

  test("random snapshot sequences: the PIT view at every day reproduces that day's snapshot") {
    // The totality property behind the whole warehouse: fold ANY
    // sequence of daily snapshots through scd2Merge (creates, changes,
    // deletes, revivals, no-ops in arbitrary mixes) and the
    // point-in-time view at each day's midday must equal that day's
    // snapshot EXACTLY — history is a lossless index of every state
    // the source ever presented.
    val dayGen: Gen[Map[Long, String]] =
      Gen.listOf(Gen.zip(Gen.choose(1L, 6L), Gen.oneOf("a", "b", "c"))).map(_.toMap)
    forAllSamples(Gen.listOfN(5, dayGen), 4) { days =>
      var hist = Seq.empty[(Long, String)].toDF("k", "state")
        .withColumn("effective_from", lit(null).cast("timestamp"))
        .withColumn("effective_to", lit(null).cast("timestamp"))
        .withColumn("deleted_flg", lit(false))
      days.zipWithIndex.foreach { case (snap, i) =>
        val ts = f"2024-03-${i + 1}%02d 00:00:00"
        val stg = snap.toSeq.toDF("k", "state")
          .withColumn("create_dt", lit(ts).cast("timestamp"))
        // checkpoint per day: bounds plan depth across the fold
        hist = Scd.scd2Merge(hist, stg, "k", Seq("state"), deleteTs = ts)
          .localCheckpoint()
      }
      days.zipWithIndex.foreach { case (snap, i) =>
        val probe = lit(f"2024-03-${i + 1}%02d 12:00:00").cast("timestamp")
        val pit = hist
          .filter(col("effective_from") <= probe && col("effective_to") >= probe &&
            !col("deleted_flg"))
          .select("k", "state").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(pit === snap, s"PIT at day ${i + 1} must equal that day's snapshot")
      }
    }
  }

  test("scd2MergeIncremental tombstones changed-then-deleted and created-then-deleted keys") {
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    val openEnd = lit(Scd.OpenEnd).cast("timestamp")
    // K=1 exists (state a); the extraction window saw K=1 change to b and
    // K=2 appear — but BOTH are gone from the key list (deleted after
    // their changes, before the key-list pull)
    val hist = Seq((1L, "a", ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"), false))
      .toDF("k", "state", "effective_from", "effective_to", "deleted_flg")
    val stg = Seq((1L, "b", ts("2024-01-02 10:00:00")),
                  (2L, "x", ts("2024-01-02 11:00:00")))
      .toDF("k", "state", "create_dt")
    val liveKeys = Seq.empty[Long].toDF("k")
    val m = Scd.scd2MergeIncremental(hist, stg, liveKeys, "k", Seq("state"),
      deleteTs = "2024-01-03 00:00:00").cache()
    // K=1: closed 'a', closed live 'b' period, open tombstone
    assert(m.filter(col("k") === 1).count() == 3)
    assert(m.filter(col("k") === 1 && col("state") === "b" && !col("deleted_flg") &&
      col("effective_to") < openEnd).count() == 1, "the change must be recorded")
    assert(m.filter(col("k") === 1 && col("deleted_flg") &&
      col("effective_to") === openEnd).count() == 1, "then the key tombstones")
    // K=2: closed live period + tombstone, never an open live row
    assert(m.filter(col("k") === 2).count() == 2)
    assert(m.filter(col("k") === 2 && !col("deleted_flg") &&
      col("effective_to") === openEnd).count() == 0,
      "a key absent from the key list must not stay open live")
    assert(m.filter(col("k") === 2 && col("deleted_flg")).count() == 1)
  }

  test("scd2Merge tolerates NULL deleted_flg and NULL effective_to in the history") {
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    val nullTs = null.asInstanceOf[java.sql.Timestamp]
    // migrated history: NULL flag means live, NULL effective_to means open
    val hist = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), nullTs, null.asInstanceOf[java.lang.Boolean]),
      (2L, "b", ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"), null.asInstanceOf[java.lang.Boolean]))
      .toDF("k", "state", "effective_from", "effective_to", "deleted_flg")
    val stg = Seq((1L, "a", ts("2024-01-02 00:00:00")),
                  (2L, "b", ts("2024-01-02 00:00:00")))
      .toDF("k", "state", "create_dt")
    val m = Scd.scd2Merge(hist, stg, "k", Seq("state"), "2024-01-02 00:00:00")
    // no silent row loss: both keys survive, open and live
    assert(m.count() == 2)
    assert(m.filter(col("deleted_flg").isNull || col("effective_to").isNull).count() == 0)
    assert(m.filter(!col("deleted_flg") &&
      col("effective_to") === lit(Scd.OpenEnd).cast("timestamp")).count() == 2)
  }

  test("scd2MergeIncremental never tombstones a key present in the key list") {
    forAllSamples(changesGen) { histRows =>
      if (histRows.nonEmpty) {
        val hist = Scd.buildHistory(toDf(histRows), "k", "ts", "event_id", Seq("state"))
        // empty incremental stg, but every history key still alive
        val stg = Seq.empty[(Long, String)].toDF("k", "state")
          .withColumn("create_dt", lit("2024-02-01 00:00:00").cast("timestamp"))
        val liveKeys = hist.select("k").distinct()
        val merged = Scd.scd2MergeIncremental(hist, stg, liveKeys, "k",
          Seq("state"), deleteTs = "2024-02-01 00:00:00")
        assert(merged.filter(col("deleted_flg")).isEmpty,
          "no deletions may appear while every key is in the key list")
        assert(merged.exceptAll(hist.withColumn("deleted_flg", lit(false))).isEmpty,
          "an empty incremental batch must leave the history unchanged")
      }
    }
  }

  test("scd2Merge: exactly one open version per surviving key; stg state wins") {
    val histGen = changesGen
    val stgGen: Gen[List[(Long, String)]] =
      Gen.listOf(for {
        key <- Gen.choose(1L, 6L)
        state <- Gen.oneOf("a", "b", "c", "d")
      } yield (key, state)).map(_.distinctBy(_._1))
    forAllSamples(Gen.zip(histGen, stgGen)) { case (histRows, stgRows) =>
      if (histRows.nonEmpty) {
        val hist = Scd.buildHistory(toDf(histRows), "k", "ts", "event_id", Seq("state"))
        val stg = stgRows.toDF("k", "state")
          .withColumn("create_dt", lit("2024-02-01 00:00:00").cast("timestamp"))
        val merged = Scd.scd2Merge(hist, stg, "k", Seq("state"),
          deleteTs = "2024-02-01 00:00:00").cache()
        val open = merged.filter(col("effective_to") >= lit("9000-01-01").cast("timestamp"))
        // one open version per key (hist keys survive as tombstones)
        assert(open.groupBy("k").count().filter(col("count") =!= 1).isEmpty)
        // every stg key's open version carries the stg state, not deleted
        val stgDf = stgRows.toDF("sk", "sstate")
        val bad = open.join(stgDf, col("k") === col("sk"))
          .filter(col("state") =!= col("sstate") || col("deleted_flg"))
        assert(bad.isEmpty, "open version must reflect the stg snapshot")
        merged.unpersist(blocking = false)
      }
    }
  }
}
