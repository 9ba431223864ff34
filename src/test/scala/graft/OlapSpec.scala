package graft

import org.apache.spark.sql.functions._
import graft.queries.OlapQueries
import graft.sources.Tables

class OlapSpec extends SparkSpec {

  test("cube emits all four grouping combinations") {
    val c = OlapQueries.q34(spark, sf).cache()
    assert(c.filter(col("l_returnflag").isNull && col("l_linestatus").isNull).count() == 1)
    assert(c.filter(col("l_returnflag").isNotNull && col("l_linestatus").isNull).count() > 0)
    assert(c.filter(col("l_returnflag").isNull && col("l_linestatus").isNotNull).count() > 0)
  }

  test("salted join equals the plain join") {
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"))
    val salted = OlapQueries.q39(spark, sf).select("o_orderpriority", "n_items")
    assert(salted.exceptAll(plain.select("o_orderpriority", "n_items")).count() == 0)
  }

  test("auto-salted join measures skew, picks a factor, equals the plain join") {
    import graft.operators.SkewJoin
    // build a deliberately skewed fact: every 3rd lineitem rekeys to
    // order 1, making it the hot key
    val orders = Tables.orders(spark, sf)
    val facts = Tables.lineitem(spark, sf)
      .withColumn("k",
        when(col("l_linenumber") % 3 === 0, lit(1L)).otherwise(col("l_orderkey")))
    val p = SkewJoin.profile(facts, "k")
    assert(p.hotKeyRows > p.nRows / p.nKeys * 4,
      "synthetic hot key must dominate the average")
    val (joined, salt) = SkewJoin.autoSaltedEquiJoin(
      facts, orders, "k", "o_orderkey",
      saltSource = Seq("l_orderkey", "l_linenumber"))
    assert(salt > 1 && salt <= 64, s"measured skew must drive salting, got $salt")
    val plain = facts.join(orders, col("k") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_items"))
    val auto = joined.groupBy("o_orderpriority").agg(count(lit(1)).as("n_items"))
    assert(auto.exceptAll(plain).count() == 0 && plain.exceptAll(auto).count() == 0)
    // a unique key distribution must NOT salt (no needless dim replication)
    val (_, noSalt) = SkewJoin.autoSaltedEquiJoin(
      Tables.customer(spark, sf), orders, "c_custkey", "o_custkey",
      saltSource = Seq("c_custkey"))
    assert(noSalt == 1, s"unique keys must skip salting, got $noSalt")
  }

  test("sessionization: session count per user is bounded by event count") {
    val sess = OlapQueries.q37(spark, sf)
      .groupBy("user_id").agg(max(col("session_seq")).as("n_sessions"),
        sum(col("n_events")).as("total_events"))
    assert(sess.filter(col("n_sessions") > col("total_events")).count() == 0)
    assert(sess.count() > 0)
  }

  test("native session_window agrees with the window-function sessionization") {
    // Boundary note: q37 keeps an event EXACTLY gap after its
    // predecessor in the same session (strict >); session_window closes
    // strictly at start+gap. The corpus has no exact-30-min gaps
    // (verified), so the two definitions must coincide on it — a third
    // independent implementation agreeing with q37 and the streaming
    // FMGWS twin.
    val native = Tables.events(spark, sf)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .select("user_id", "session_start", "n_events")
    val viaWindows = OlapQueries.q37(spark, sf)
      .select("user_id", "session_start", "n_events")
    assert(native.count() == viaWindows.count())
    assert(native.exceptAll(viaWindows).count() == 0)
  }

  test("point-in-time snapshot has at most one state per user") {
    val snap = OlapQueries.q40(spark, sf)
    val dupes = snap.groupBy("user_id").count().filter(col("count") > 1)
    assert(dupes.count() == 0)
  }

  test("bloom-prefiltered semi-join equals the plain semi-join") {
    val facts = Tables.orders(spark, sf)
    val dim = Tables.customer(spark, sf)
      .filter(col("c_acctbal") < 0).select("c_custkey")
    val viaBloom = graft.operators.BloomJoin.semiJoin(
      facts, dim, "o_custkey", "c_custkey", expectedDimKeys = 10000L)
    val plain = facts.join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
    assert(viaBloom.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(viaBloom).count() == 0)
  }

  test("bloom prefilter prunes non-matching facts ahead of the join") {
    val facts = Tables.orders(spark, sf)
    val dim = Tables.customer(spark, sf)
      .filter(col("c_acctbal") < 0).select("c_custkey")
    val hits = graft.operators.BloomJoin.bloomHits(
      facts, dim, "o_custkey", "c_custkey", expectedDimKeys = 10000L).count()
    val exact = facts.join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    val total = facts.count()
    assert(hits >= exact, "a bloom filter must never produce false negatives")
    // fpp=0.01 over the non-matching remainder: the prefilter should kill
    // essentially all of it (generous 10x-fpp slack keeps this stable)
    assert(hits - exact <= math.max(10L, (total - exact) / 10),
      s"bloom pruned too little: $hits hits vs $exact exact of $total")
  }
}
