package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.{Decontaminate, Dedup}

/** The composed corpus-curation loop — the training-data analog of
  * [[EtlPipeline.run]]: one eager call takes a raw document table to a
  * training-ready sharded corpus plus full provenance (per-stage
  * counts, per-document reject reasons, a dataset card), the pipeline a
  * reference user runs instead of wiring the individual operators.
  *
  * Stage order follows the standard curation recipe (quality gate →
  * exact dedup → near-dup canonicalization → decontamination → shard):
  * cheap map-only filters run first so every later shuffle sees a
  * smaller corpus, and decontamination runs after dedup so eval-overlap
  * work isn't spent on documents a dedup stage would drop anyway.
  *
  * Scale shape per stage:
  *  - quality gate: map-only (codegen'd TextFunctions.qualityScore).
  *  - exact dedup: ONE groupBy on xxhash64(text) — an 8-byte shuffle
  *    key instead of the full text (collision risk n²/2^65, the hashed
  *    shingle-set precedent, documented there).
  *  - near-dup: Dedup.lshVerifiedPairs (band shuffle + equi-join
  *    verify, no cross join) → dedupClusters → q95's canonical
  *    selection (longest text, tie → smallest id) with the pair list
  *    orders of magnitude below the corpus.
  *  - decontamination: eval n-grams distinct + broadcast, corpus
  *    streamed once (Decontaminate.overlapFlags).
  *  - shard: the q106 epoch shuffle — nShards bounds every shard sort.
  *
  * Everything is deterministic (seeded hashes, total-order tie-breaks),
  * so re-running the same input yields byte-identical shards — asserted
  * in CorpusPipelineSpec. All intermediates persist for the duration of
  * the call and are released before returning (including the dedup
  * operators' internal caches via [[Dedup.releaseCaches]]).
  */
object CorpusPipeline {

  /** Curation dials; defaults match the q29/q72/q76/q106 entries. */
  case class CurationConfig(
      minQuality: Double = 0.5,
      shingleK: Int = 3,
      jaccardThreshold: Double = 0.6,
      numPerm: Int = 16,
      bands: Int = 16,
      decontamNgram: Int = 5,
      nShards: Int = 16,
      epoch: Long = 0L)

  /** One row per stage: input size, survivors, drops. */
  case class StageCount(stage: String, rows_in: Long, rows_out: Long,
                        rows_dropped: Long)

  /** Eager result summary; the data itself is written under `outDir`:
    * `clean/` (shard, pos, + original columns, partitioned by shard),
    * `rejects/` (doc_id, reason), `stage_log/`, `card/` (per
    * (source, lang) when those columns exist).
    */
  case class CurationResult(nIn: Long, nClean: Long, stages: Seq[StageCount])

  def curate(spark: SparkSession, docs: DataFrame, evalDocs: Option[DataFrame],
             outDir: String,
             cfg: CurationConfig = CurationConfig(),
             idCol: String = "doc_id", textCol: String = "text"): CurationResult = {
    require(cfg.minQuality >= 0 && cfg.minQuality <= 1,
      s"minQuality must be in [0,1], got ${cfg.minQuality}")
    val stages = Seq.newBuilder[StageCount]
    val rejects = Seq.newBuilder[DataFrame]
    def stage(name: String, kept: DataFrame, dropped: DataFrame,
              nIn: Long): Long = {
      val nOut = kept.count()
      stages += StageCount(name, nIn, nOut, nIn - nOut)
      rejects += dropped.select(col(idCol), lit(name).as("reason"))
      nOut
    }

    val input = docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nIn = input.count()

    // 1. quality gate — map-only, so it runs on the raw scan; a null
    //    text scores 0 (dropped), never a null that would slip both
    //    the kept and the dropped filter
    val scored = input.withColumn("__q",
      TF.qualityScore(coalesce(col(textCol), lit(""))))
    val qKept = scored.filter(col("__q") >= cfg.minQuality).drop("__q")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n1 = stage("quality", qKept,
      scored.filter(col("__q") < cfg.minQuality), nIn)

    // 2. exact dedup — keep the smallest id per identical text
    val keep = Dedup.exact(qKept, Seq(xxhash64(col(textCol)).as("__h")),
      col(idCol)).select(col("keep_id").as(idCol))
    val eKept = qKept.join(keep, Seq(idCol), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n2 = stage("exact_dup", eKept,
      qKept.join(keep, Seq(idCol), "left_anti"), n1)

    // 3. near-dup canonicalization — LSH-verified pairs, connected
    //    components, longest-text representative per cluster (q95)
    val pairs = Dedup.lshVerifiedPairs(eKept, idCol, textCol,
      cfg.shingleK, cfg.jaccardThreshold, cfg.numPerm, cfg.bands)
    val clusters = Dedup.dedupClusters(pairs, "id_a", "id_b")
    val canon = clusters
      .join(eKept.select(col(idCol).as("node"),
        length(col(textCol)).as("__len")), Seq("node"))
      .groupBy("cluster")
      .agg(max_by(col("node"), struct(col("__len"), -col("node"))).as("node"))
      .select(col("node"))
    val nearDropped = clusters.select("node")
      .join(canon, Seq("node"), "left_anti")
      .select(col("node").as(idCol))
    val nKept = eKept.join(nearDropped, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n3 = stage("near_dup", nKept,
      eKept.join(nearDropped, Seq(idCol), "left_semi"), n2)

    // 4. decontamination — any shared eval word-n-gram disqualifies
    val (cKept, nClean) = evalDocs match {
      case Some(ev) =>
        val flagged = Decontaminate
          .overlapFlags(nKept, ev, idCol, textCol, cfg.decontamNgram)
          .select(col(idCol))
        val kept = nKept.join(flagged, Seq(idCol), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n4 = stage("contaminated", kept,
          nKept.join(flagged, Seq(idCol), "left_semi"), n3)
        (kept, n4)
      case None => (nKept, n3)
    }

    // 5. shard assignment — deterministic epoch shuffle, payload joined
    //    back on the id
    val sharded = graft.queries.PipelineQueries
      .epochShuffle(cKept, idCol, cfg.nShards, cfg.epoch)
      .join(cKept, Seq(idCol))

    // eager writes (snapshot semantics: overwrite = the run's output)
    sharded.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/clean")
    rejects.result().reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/rejects")
    val sp = spark
    import sp.implicits._
    stages.result().toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/stage_log")
    if (Seq("source", "lang").forall(docs.columns.contains)) {
      cKept.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col(textCol))).as("n_tokens"),
          sum(length(col(textCol)).cast("long")).as("n_chars_total"))
        .write.mode("overwrite").parquet(s"$outDir/card")
    }

    Seq(input, qKept, eKept, nKept).foreach(_.unpersist(blocking = false))
    if (cKept ne nKept) cKept.unpersist(blocking = false)
    Dedup.releaseCaches()
    CurationResult(nIn, nClean, stages.result())
  }
}
