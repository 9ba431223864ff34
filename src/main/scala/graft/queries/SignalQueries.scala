package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Similarity
import graft.sources.Tables

/** Round-8 widening: signal extraction over the curated surface.
  * Rounds 1-7 built retrieval (q114 BM25), distribution audits
  * (q119/q126/q128), and the dedup/quality gates; these operators
  * combine them into the composite signals a production stack actually
  * serves: hybrid-search rank fusion (q130 — the standard lexical +
  * semantic retrieval frontend), per-type burst detection against a
  * trailing baseline (q131 — the fraud-ops alarm that pages someone),
  * tokenizer-budget coverage planning (q132 — "how big a vocabulary
  * covers 99% of token mass"), deterministic A/B conversion lift (q133 —
  * the experimentation readout over the q62 hash-assignment machinery),
  * and boilerplate template clustering (q134 — the curation gate for
  * machine-generated near-template docs that near-dup LSH under-catches
  * because their BODIES differ).
  *
  * Shared compare-surface posture (the round-7 lesson, VERDICT r7 §wrong):
  * every cross-engine column is integer arithmetic — ranks, counts,
  * FLOOR fixed-point ppm via integer DIV — never ROUND(double) and never
  * a calendar builtin beyond CAST(ts AS DATE).
  */
object SignalQueries {

  /** RRF dampening constant (Cormack et al.'s k=60 convention). */
  val RrfK = 60

  // --- q130: reciprocal-rank-fusion hybrid retrieval (lexical BM25 +
  // semantic ANN), top-20. The industry-standard hybrid-search shape:
  // two independent top-50 rankings — q114's BM25 over the literal term
  // query and a brute-force cosine ranking against a probe embedding —
  // fused by RRF: score(d) = Σ_lists 1/(k + rank_d), absent lists
  // contribute 0. Both input rankings are integer ranks (the ONLY
  // float, cosine, is consumed by ORDER BY inside the ranking — the
  // q25-proven cross-engine surface), and the fused score is exact
  // integer micro-units: floor(1e9/(60+rank)) summed with DIV — no
  // double ever reaches the output. Scale: both rankings end in a
  // distributed top-k (TakeOrdered), the fusion joins two 50-row lists
  // — driver-trivial regardless of corpus size; at 100 TB the corpus
  // cost is the two underlying scans, unchanged by fusion.
  def q130(s: SparkSession, dir: String): DataFrame = {
    val lex = CurationQueries.q114(s, dir)
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
    val e = Tables.embeddings(s, dir)
    val sem = Similarity.bruteForceTopK(
        e, e.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("sem_rnk"))
    val fused = lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_fp",
        coalesce(expr(s"1000000000 DIV ($RrfK + lex_rnk)"), lit(0L)) +
          coalesce(expr(s"1000000000 DIV ($RrfK + sem_rnk)"), lit(0L)))
      .orderBy(col("rrf_fp").desc, col("doc_id").asc)
      .limit(20)
    val w = Window.orderBy(col("rrf_fp").desc, col("doc_id").asc)
    fused.withColumn("rnk", row_number().over(w).cast("int"))
      .select(col("doc_id"), col("lex_rnk"), col("sem_rnk"),
        col("rrf_fp").cast("bigint").as("rrf_fp"), col("rnk"))
  }

  val q130Sql: String =
    s"""WITH lex AS (
       |${CurationQueries.q114Sql}
       |),
       |e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |p2 AS (SELECT v AS pv FROM e2 WHERE vec_id = 0),
       |sc2 AS (
       | SELECT e2.vec_id AS doc_id,
       |  LIST_DOT_PRODUCT(pv, v) /
       |   (SQRT(LIST_DOT_PRODUCT(pv, pv)) * SQRT(LIST_DOT_PRODUCT(v, v))) AS cos
       | FROM e2 CROSS JOIN p2 WHERE e2.vec_id <> 0),
       |sem AS (SELECT doc_id, sem_rnk FROM (
       | SELECT doc_id,
       |  CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id ASC) AS INT) AS sem_rnk
       | FROM sc2) t WHERE sem_rnk <= 50),
       |fused AS (
       | SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
       |  lex.rnk AS lex_rnk, sem.sem_rnk AS sem_rnk,
       |  CAST(COALESCE(1000000000 // ($RrfK + lex.rnk), 0) +
       |       COALESCE(1000000000 // ($RrfK + sem.sem_rnk), 0) AS BIGINT) AS rrf_fp
       | FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id),
       |top AS (SELECT * FROM fused ORDER BY rrf_fp DESC, doc_id ASC LIMIT 20)
       |SELECT doc_id, lex_rnk, sem_rnk, rrf_fp,
       | CAST(ROW_NUMBER() OVER (ORDER BY rrf_fp DESC, doc_id ASC) AS INT) AS rnk
       |FROM top""".stripMargin

  // --- q131: per-type burst detection vs a trailing 7-day baseline.
  // q128 finds the single structural break (CUSUM); this is the daily
  // ALARM surface: each (type, day) scored against the mean of the
  // trailing 7 days, emitted only when the full baseline exists. The
  // burst test 7·n ≥ 1.25·Σbase avoids division entirely on the flag
  // path and ratio_ppm is exact integer cross-multiplication
  // (7·n·1e6 DIV base7 — overflow-free while daily count < 1.3e12/type).
  // RANGE (not ROWS) frames keyed on epoch-day make missing days
  // self-excluding instead of silently shifting the window. Scale: the
  // corpus collapses to the (type, day) frame in ONE partial-aggregable
  // shuffle; the window runs over that metadata-sized frame (|types|
  // partitions × |days| rows), never the event stream. The scoring
  // finisher is StreamingFraud.burstsOf, SHARED with the streaming
  // daily-count monitor (changepointStream's output table feeds both
  // the changepoint and burst alarms) so stream = batch by construction.
  def q131(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingFraud.burstsOf(
      Tables.events(s, dir)
        .select(col("event_type"), col("ts").cast("date").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n")))

  val q131Sql: String =
    """WITH d AS (
      | SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      | FROM events GROUP BY 1, 2),
      |e AS (SELECT *, DATE_DIFF('day', DATE '1970-01-01', day) AS ed FROM d),
      |wd AS (
      | SELECT event_type, day, n,
      |  SUM(n) OVER (PARTITION BY event_type ORDER BY ed
      |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS base7,
      |  COUNT(*) OVER (PARTITION BY event_type ORDER BY ed
      |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS days7
      | FROM e)
      |SELECT event_type, day, n, CAST(base7 AS BIGINT) AS base7,
      | CAST((7 * n * 1000000) // base7 AS BIGINT) AS ratio_ppm,
      | ((7 * n * 1000000) // base7) >= 1250000 AS is_burst
      |FROM wd WHERE days7 = 7""".stripMargin

  // --- q132: tokenizer vocabulary coverage planning — the smallest
  // frequency-ranked vocabulary covering 50/90/95/99% of token mass.
  // The question every tokenizer budget decision starts from. Exactly
  // the q120/q126 posture: the corpus-scale work is ONE token groupBy;
  // the rank curve is then computed from the (count-class, #tokens)
  // histogram — distinct count VALUES are bounded by O(√total) (their
  // sum is the corpus), so the cumulative window runs over a bounded
  // frame, never a vocabulary-sized sort. Within a count class tokens
  // are interchangeable (each adds exactly c), so the minimal prefix
  // size is tok_before + ceil(deficit/c) — identical to the literal
  // rank-window answer (the oracle) for ANY tie order. All integers;
  // need = ceil(p·total/100) via (p·total+99) DIV 100.
  def q132(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(TextFunctions.wsTokens(lower(col("text")))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("c"))
    val hist = vocab.groupBy("c").agg(count(lit(1)).as("m"))
      .withColumn("mass", col("c") * col("m"))
    val w = Window.orderBy(col("c").desc).rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist
      .withColumn("mass_before", coalesce(sum("mass").over(w), lit(0L)))
      .withColumn("tok_before", coalesce(sum("m").over(w), lit(0L)))
    val tot = hist.agg(sum("mass").as("total"))
    val ps = s.range(1).selectExpr("explode(array(50, 90, 95, 99)) AS p")
    cum.crossJoin(broadcast(ps)).crossJoin(broadcast(tot))
      .withColumn("need", expr("(p * total + 99) DIV 100"))
      .filter(col("need") > col("mass_before") &&
        col("need") <= col("mass_before") + col("mass"))
      .withColumn("vocab_size", expr("tok_before + (need - mass_before + c - 1) DIV c"))
      .withColumn("covered", expr("mass_before + (vocab_size - tok_before) * c"))
      .select(col("p"), col("need").cast("bigint").as("need"),
        col("vocab_size").cast("bigint").as("vocab_size"),
        col("covered").cast("bigint").as("covered"))
  }

  val q132Sql: String =
    """WITH toks AS (
      | SELECT UNNEST(LIST_FILTER(
      |   STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+'), x -> x <> '')) AS token
      | FROM documents),
      |vocab AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
      |tot AS (SELECT SUM(c) AS total FROM vocab),
      |ranked AS (SELECT c,
      |  ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS r,
      |  SUM(c) OVER (ORDER BY c DESC, token ASC ROWS UNBOUNDED PRECEDING) AS cum
      | FROM vocab),
      |needs AS (SELECT p, CAST((p * total + 99) // 100 AS BIGINT) AS need
      | FROM (SELECT p FROM (VALUES (50), (90), (95), (99)) v(p)) ps CROSS JOIN tot)
      |SELECT p, need, CAST(MIN(r) AS BIGINT) AS vocab_size,
      | CAST(MIN(cum) AS BIGINT) AS covered
      |FROM needs JOIN ranked ON ranked.cum >= needs.need
      |GROUP BY p, need""".stripMargin

  // --- q133: deterministic A/B conversion lift. Assignment is q62's
  // multiplicative hash on user_id (reproducible across engines, runs,
  // and partitionings — never rand()), arm A = hash%100 < 50. The
  // corpus collapses to one row per user in ONE shuffle (converted =
  // ever made a high-value purchase — the raw-value comparison carries
  // no arithmetic, so the double column never enters the compare
  // surface), then a single partial-aggregable fold produces the
  // 2×2 table; rates and lift are FLOOR fixed-point ppm via integer
  // DIV. The lift is defined on the ppm-rounded rates so every factor
  // stays < 1e12 — exact in int64 at ANY corpus size, no decimal/double
  // division anywhere. Same overflow contract as q62: user ids past
  // ~3.4e9 overflow ANSI-loudly, pass a 64-bit hash column instead.
  def q133(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" && col("value") > 100, 1)
        .otherwise(0)).as("conv"))
      .withColumn("arm",
        when(pmod(col("user_id") * lit(2654435761L) + lit(104729L), lit(100L)) < 50,
          "A").otherwise("B"))
    perUser.agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("users_a"),
        sum(when(col("arm") === "A", col("conv")).otherwise(0)).cast("bigint").as("conv_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("users_b"),
        sum(when(col("arm") === "B", col("conv")).otherwise(0)).cast("bigint").as("conv_b"))
      .withColumn("rate_a_ppm", expr("(conv_a * 1000000) DIV users_a"))
      .withColumn("rate_b_ppm", expr("(conv_b * 1000000) DIV users_b"))
      .withColumn("lift_ppm",
        expr("(rate_a_ppm * 1000000) DIV NULLIF(rate_b_ppm, 0) - 1000000"))
  }

  val q133Sql: String =
    """WITH pu AS (
      | SELECT user_id,
      |  MAX(CASE WHEN event_type = 'purchase' AND value > 100
      |    THEN 1 ELSE 0 END) AS conv,
      |  CASE WHEN (user_id * 2654435761 + 104729) % 100 < 50
      |    THEN 'A' ELSE 'B' END AS arm
      | FROM events GROUP BY 1),
      |a AS (
      | SELECT
      |  CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS users_a,
      |  CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
      |  CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS users_b,
      |  CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
      | FROM pu),
      |r AS (
      | SELECT *, CAST((conv_a * 1000000) // users_a AS BIGINT) AS rate_a_ppm,
      |  CAST((conv_b * 1000000) // users_b AS BIGINT) AS rate_b_ppm
      | FROM a)
      |SELECT users_a, conv_a, users_b, conv_b, rate_a_ppm, rate_b_ppm,
      | CAST((rate_a_ppm * 1000000) // NULLIF(rate_b_ppm, 0) - 1000000 AS BIGINT)
      |   AS lift_ppm
      |FROM r""".stripMargin

  // --- q134: boilerplate template clustering by normalized 2-token
  // prefix. Machine-generated corpora carry families of docs sharing a
  // fixed opening template with differing bodies — whole-doc near-dup
  // (q22/q72) under-catches them when bodies dominate the shingle
  // set, so curation stacks gate on a head-prefix cluster first
  // (C4/Gopher drop repeated openings). One groupBy on the prefix
  // string (at scale: its xxhash64) — a single linear shuffle, no
  // pairwise anything. Docs with fewer than 2 tokens can't carry a
  // template and are excluded; clusters below 3 docs are noise.
  def q134(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        TextFunctions.wsTokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) >= 2)
      .withColumn("prefix", concat_ws(" ", slice(col("toks"), 1, 2)))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 3)
  }

  val q134Sql: String =
    """WITH t AS (
      | SELECT doc_id, lang,
      |  LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+'),
      |    x -> x <> '') AS toks
      | FROM documents),
      |p AS (
      | SELECT doc_id, lang, ARRAY_TO_STRING(LIST_SLICE(toks, 1, 2), ' ') AS prefix
      | FROM t WHERE LEN(toks) >= 2)
      |SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
      | CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      | CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |FROM p GROUP BY 1 HAVING COUNT(*) >= 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_rrf_fusion"     -> (q130 _),
    "q131_burst_days"     -> (q131 _),
    "q132_vocab_coverage" -> (q132 _),
    "q133_ab_lift"        -> (q133 _),
    "q134_template_prefix" -> (q134 _))

  val oracle: Map[String, String] = Map(
    "q130_rrf_fusion"     -> q130Sql,
    "q131_burst_days"     -> q131Sql,
    "q132_vocab_coverage" -> q132Sql,
    "q133_ab_lift"        -> q133Sql,
    "q134_template_prefix" -> q134Sql)
}
