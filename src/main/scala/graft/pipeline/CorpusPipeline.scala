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
  * exact dedup → [optional DSIR importance gate] → near-dup
  * canonicalization → decontamination → shard):
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

  /** Curation dials; defaults match the q29/q72/q76/q106 entries.
    * `spanRewriteTokens = Some(n)` inserts the C4 span-rewrite stage
    * (q81's plan executed by [[Dedup.removeSpans]], q185) after exact
    * dedup: later occurrences of every n-token span are REMOVED from
    * the text (documents emptied by the rewrite drop, rejects reason
    * `span_rewrite` — the stage name). It runs before near-dup so shared
    * boilerplate spans can't glue unrelated documents into one LSH
    * cluster.
    *
    * `adaptiveBanding = true` replaces the fixed (numPerm, bands) for
    * the near-dup stage with [[Dedup.adaptiveBanding]]'s measured
    * bucket-census choice (recall pinned by `bandsForRecall` at the
    * same threshold). BACKFILL-ONLY dial: [[curateIncrement]] keeps the
    * explicit cfg values because every later batch must band exactly
    * like the STORED index — run the advisor at backfill, then carry
    * its choice into the incremental cfg.
    */
  case class CurationConfig(
      minQuality: Double = 0.5,
      shingleK: Int = 3,
      jaccardThreshold: Double = 0.6,
      numPerm: Int = 16,
      bands: Int = 16,
      decontamNgram: Int = 5,
      nShards: Int = 16,
      epoch: Long = 0L,
      spanRewriteTokens: Option[Int] = None,
      adaptiveBanding: Boolean = false,
      // Incremental near-dup engine: true (default) = the linear-output
      // assignment mode (Dedup.assignIncrementEdges — verify stops at
      // each group's first true edge, output is one row per affected
      // doc); false = the pair mode (Dedup.dedupIncrement — every
      // verified pair enumerated, the r12 shape). Kept-set equality of
      // the two modes is spec-pinned; the dial exists so a deployment
      // that consumes the pair list itself (audit trails) can keep it.
      incrementAssign: Boolean = true)

  /** Optional DSIR importance gate (q158's operator as a curation
    * stage): keep documents whose domain-match score against the
    * `isTarget` rows reaches `minScoreMicro`. Documents with no vocab
    * bigram carry no domain evidence and DROP (logged like any reject
    * — selection refuses to pass what it cannot score).
    */
  case class ImportanceConfig(isTarget: org.apache.spark.sql.Column,
                              minScoreMicro: Long,
                              vocabSize: Int = 2048)

  /** Optional SemDeDup stage (q189's operator as a curation stage —
    * the paper's consumption point: embedding-level pruning AFTER
    * lexical near-dup canonicalization has collapsed the exact/shingle
    * duplicates). `embeddings` maps the corpus id space to vectors
    * (the testdata's vec_id is an id into doc_id space); a surviving
    * doc WITHOUT an embedding passes through — semantic dedup removes
    * only proven duplicates, unlike the DSIR gate, which drops what it
    * cannot score (selection vs dedup semantics, both documented).
    * `nClusters = 0` keeps [[Similarity.semDedup]]'s censused
    * derivation.
    */
  case class SemDedupConfig(embeddings: DataFrame,
                            threshold: Double = 0.35,
                            vecIdCol: String = "vec_id",
                            vecCol: String = "embedding",
                            nClusters: Int = 0)

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
             idCol: String = "doc_id", textCol: String = "text",
             importance: Option[ImportanceConfig] = None,
             semdedup: Option[SemDedupConfig] = None): CurationResult = {
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

    // 2.2 (optional) span rewrite — execute q81's removal plan on the
    //     exact-deduped corpus (identical texts are already collapsed,
    //     so the window never sees byte-duplicate span floods); a doc
    //     whose every cell was a later occurrence comes back empty and
    //     drops here rather than polluting downstream stages
    val (sKept, n2a, sFrame) = cfg.spanRewriteTokens match {
      case Some(st) =>
        val rewritten = Dedup.removeSpans(eKept, idCol, textCol, st)
          .drop("n_spans_kept", "n_spans_removed")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // coalesce: a NULL text (passed through removeSpans unchanged)
        // must land in the REJECT branch — a bare `> 0` / `=== 0` pair
        // is NULL for it on both sides and the doc would vanish from
        // the ledger entirely, breaking the stage-count reconciliation
        val keptPred = coalesce(length(trim(col(textCol))) > 0, lit(false))
        val kept = rewritten.filter(keptPred)
        val n = stage("span_rewrite", kept, rewritten.filter(!keptPred), n2)
        (kept, n, Some(rewritten))
      case None => (eKept, n2, None)
    }

    // 2.5 (optional) importance gate — DSIR domain-match selection
    //     (operators.Importance, q158). Runs on the exact-deduped
    //     corpus so duplicated texts cannot skew the feature model,
    //     and before the LSH stage so near-dup shuffles see only
    //     selected documents.
    val (iKept, n2b) = importance match {
      case Some(ic) =>
        val keepIds = graft.operators.Importance
          .dsirScore(sKept, idCol, textCol, ic.isTarget, ic.vocabSize)
          .filter(col("score_micro") >= ic.minScoreMicro)
          .select(col(idCol))
        val kept = sKept.join(keepIds, Seq(idCol), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = stage("importance", kept,
          sKept.join(keepIds, Seq(idCol), "left_anti"), n2a)
        (kept, n)
      case None => (sKept, n2a)
    }

    // 3. near-dup canonicalization — LSH-verified pairs, connected
    //    components, longest-text representative per cluster (q95);
    //    banding from the measured census when the dial asks for it
    val (numPerm, bands, densityHint) =
      if (cfg.adaptiveBanding) {
        val c = Dedup.adaptiveBanding(iKept, idCol, textCol,
          cfg.shingleK, cfg.jaccardThreshold)
        (c.numPerm, c.bands, Some(c.estPairsPerDoc))
      } else (cfg.numPerm, cfg.bands, None)
    val pairs = Dedup.lshVerifiedPairs(iKept, idCol, textCol,
      cfg.shingleK, cfg.jaccardThreshold, numPerm, bands,
      candidatesPerDocHint = densityHint)
    val clusters = Dedup.dedupClusters(pairs, "id_a", "id_b")
    val canon = clusters
      .join(iKept.select(col(idCol).as("node"),
        length(col(textCol)).as("__len")), Seq("node"))
      .groupBy("cluster")
      .agg(max_by(col("node"), struct(col("__len"), -col("node"))).as("node"))
      .select(col("node"))
    val nearDropped = clusters.select("node")
      .join(canon, Seq("node"), "left_anti")
      .select(col("node").as(idCol))
    val nKept = iKept.join(nearDropped, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n3 = stage("near_dup", nKept,
      iKept.join(nearDropped, Seq(idCol), "left_semi"), n2b)

    // 3.5 (optional) SemDeDup — embedding-level pruning of the
    //     lexically-canonicalized survivors (the paper's pipeline
    //     position: shingle near-dup already collapsed the literal
    //     copies, this removes semantic re-tellings LSH structurally
    //     misses). Only docs WITH an embedding are judged; the prune
    //     runs on exactly the surviving subset so a dropped doc can
    //     never dominate a kept one.
    val (mKept, n3a) = semdedup match {
      case Some(sc) =>
        val vecs = sc.embeddings
          .select(col(sc.vecIdCol).as(idCol), col(sc.vecCol))
          .join(nKept.select(idCol), Seq(idCol), "left_semi")
        // one sizing pass doubles as the 1:1 precondition check: a
        // duplicate vec_id would feed semDedup duplicate ids and make
        // the (csim, id) dominance order self-referential for that doc
        val sz = vecs.agg(count(lit(1)), count_distinct(col(idCol))).head()
        require(sz.getLong(0) == sz.getLong(1),
          s"SemDeDup needs exactly one embedding per doc: " +
            s"${sz.getLong(0) - sz.getLong(1)} duplicate ${sc.vecIdCol} row(s)")
        // KMeans needs >= 2 rows; below that there is nothing to prune
        val dropIds =
          if (sz.getLong(0) < 2) vecs.select(col(idCol)).limit(0)
          else graft.operators.Similarity
            .semDedup(vecs, idCol, sc.vecCol, sc.threshold, sc.nClusters)
            .filter(!col("kept")).select(col(idCol))
        val kept = nKept.join(dropIds, Seq(idCol), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = stage("semdedup", kept,
          nKept.join(dropIds, Seq(idCol), "left_semi"), n3)
        (kept, n)
      case None => (nKept, n3)
    }

    // 4. decontamination — any shared eval word-n-gram disqualifies
    val (cKept, nClean) = evalDocs match {
      case Some(ev) =>
        val flagged = Decontaminate
          .overlapFlags(mKept, ev, idCol, textCol, cfg.decontamNgram)
          .select(col(idCol))
        val kept = mKept.join(flagged, Seq(idCol), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n4 = stage("contaminated", kept,
          mKept.join(flagged, Seq(idCol), "left_semi"), n3a)
        (kept, n4)
      case None => (mKept, n3a)
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
    sFrame.foreach(_.unpersist(blocking = false))
    if (iKept ne sKept) iKept.unpersist(blocking = false)
    if (mKept ne nKept) mKept.unpersist(blocking = false)
    if (cKept ne mKept) cKept.unpersist(blocking = false)
    Dedup.releaseCaches()
    graft.operators.Similarity.releaseCaches()
    CurationResult(nIn, nClean, stages.result())
  }

  /** The STEADY-STATE curation loop — [[curate]] is the one-time
    * backfill; this is what runs on each ingest batch at 100 TB,
    * mirroring [[EtlPipeline.runFromTables]]'s incremental posture: the
    * existing corpus participates ONLY through its stored metadata
    * tables (the seen-content hash registry for exact dedup, the q85
    * LSH index of the CLEAN docs for near-dup), never by re-reading
    * its text.
    *
    * State lives under `stateDir` as batch-partitioned parquet
    * (`clean/ index_bands/ index_sets/ text_hashes/ rejects/
    * stage_log/`, each with a `batch=<id>` subdirectory per call); the
    * first call bootstraps empty state, so the backfill is just the
    * first increment. `clean/batch=<id>` doubles as the COMMIT MARKER
    * (written last): a COMPLETED id is refused on re-run (the
    * EtlPipeline duplicate-business-date precedent), while a CRASHED
    * batch leaves metadata partials but no marker — retrying the SAME
    * id is safe, because every state read excludes the in-flight id's
    * partials and the final writes overwrite them.
    *
    * Dedup policy is FIRST-SEEN-WINS (the q67/dedupStream semantics):
    * a batch doc that matches the stored corpus drops, whatever its
    * length — unlike the backfill's global longest-text canonical,
    * which cannot be honored without rewriting history. Batch-internal
    * clusters still pick the longest-text representative. Consequence:
    * re-delivering the same CONTENT under fresh ids yields zero new
    * documents (spec-asserted idempotence).
    *
    * New ids must be new — stored ids colliding with the batch fail
    * loudly (the [[Dedup.dedupIncrement]] precondition).
    */
  def curateIncrement(spark: SparkSession, newDocs: DataFrame,
                      evalDocs: Option[DataFrame], stateDir: String,
                      batchId: String,
                      cfg: CurationConfig = CurationConfig(),
                      idCol: String = "doc_id", textCol: String = "text"): CurationResult = {
    // A per-batch census could choose a DIFFERENT banding than the
    // stored index was built with — the batch would band-bucket
    // incompatibly and silently miss every cross-batch near-dup. Run
    // the advisor at backfill; carry its (numPerm, bands) here.
    require(!cfg.adaptiveBanding,
      "adaptiveBanding is a backfill-only dial: the stored index fixes " +
        "(numPerm, bands) for every increment — run Dedup.adaptiveBanding at " +
        "backfill and pass its choice explicitly")
    // Leading letter/underscore: the id round-trips partition-value
    // type inference. A numeric-looking id ("001") comes back from the
    // `batch=001` directory as integer 1, so the crash-retry
    // self-exclusion filter below (`cast("string") =!= batchId`
    // comparing "1" to "001") would silently keep the partial rows and
    // fail the ids-must-be-new check with a misleading error.
    require(batchId.matches("[A-Za-z_][A-Za-z0-9_.-]*"),
      s"batchId must start with a letter/underscore and use only " +
        s"[A-Za-z0-9_.-] (a numeric-looking id does not survive partition " +
        s"type inference), got '$batchId'")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(stateDir), spark.sparkContext.hadoopConfiguration)
    def part(table: String) = s"$stateDir/$table/batch=$batchId"
    // `clean/batch=<id>` is the COMMIT MARKER: it is written last, so a
    // crashed batch leaves metadata partials but no clean dir — the
    // retry below ignores and overwrites them (stateTable filters out
    // the current batch id), while a COMPLETED batch id is refused.
    require(!fs.exists(new org.apache.hadoop.fs.Path(part("clean"))),
      s"batch '$batchId' already ingested into $stateDir — re-running a batch id " +
        "would double-count; pick a new id (or delete the batch= directories to redo)")
    def stateTable(table: String): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/$table")
      if (fs.exists(p) && fs.listStatus(p).nonEmpty)
        Some(spark.read.parquet(s"$stateDir/$table")
          .filter(col("batch").cast("string") =!= batchId)
          .drop("batch"))
      else None
    }

    val stages = Seq.newBuilder[StageCount]
    val rejects = Seq.newBuilder[DataFrame]
    def stage(name: String, kept: DataFrame, dropped: DataFrame,
              nIn: Long): Long = {
      val nOut = kept.count()
      stages += StageCount(name, nIn, nOut, nIn - nOut)
      rejects += dropped.select(col(idCol), lit(name).as("reason"))
      nOut
    }

    val input = newDocs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nIn = input.count()
    val storedHashes = stateTable("text_hashes")
    storedHashes.foreach { h =>
      val clash = input.select(col(idCol)).join(h.select(col(idCol)), Seq(idCol), "left_semi").count()
      require(clash == 0,
        s"$clash batch ids already exist in the corpus state — ingest ids must be new")
    }

    // 1. quality gate
    val scored = input.withColumn("__q",
      TF.qualityScore(coalesce(col(textCol), lit(""))))
    val qKept = scored.filter(col("__q") >= cfg.minQuality).drop("__q")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n1 = stage("quality", qKept,
      scored.filter(col("__q") < cfg.minQuality), nIn)

    // 2. exact dedup — within the batch, then against the stored corpus
    //    hash table (an 8-byte-key anti join; the corpus text never loads)
    val hashed = qKept.withColumn("__h", xxhash64(col(textCol)))
    val keep = Dedup.exact(hashed, Seq(col("__h")), col(idCol))
      .select(col("keep_id").as(idCol))
    val batchKept = hashed.join(keep, Seq(idCol), "left_semi")
    val eKept = storedHashes match {
      case Some(h) => batchKept.join(h.select(col("__h")), Seq("__h"), "left_anti")
      case None    => batchKept
    }
    val eKeptP = eKept.drop("__h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n2 = stage("exact_dup", eKeptP,
      qKept.join(eKeptP.select(col(idCol)), Seq(idCol), "left_anti"), n1)

    // 3. near-dup vs the stored LSH index + within the batch. Corpus
    //    matches drop the batch side (first-seen wins); batch-internal
    //    clusters keep the longest text. Default engine: the ASSIGNMENT
    //    mode — one verified edge per (batch doc, corpus doc) with
    //    first-true-edge early exit and stage-B scoped to survivors by
    //    construction, so the steady-state loop never bills the
    //    quadratic within-cluster pair mass (the r13 sf10 crossover:
    //    419 s assignment vs 474 s pair, 450× fewer rows). The stored
    //    corpus is pairwise near-dup-free by this very loop, so its
    //    cluster table is all singletons — the empty frame below IS the
    //    maintained table, and stage A's coalesce labels each index doc
    //    as its own representative.
    val (vsCorpusDrop, innerPairs) =
      (stateTable("index_bands"), stateTable("index_sets")) match {
        case (Some(bands), Some(sets)) if cfg.incrementAssign =>
          val edges = Dedup.assignIncrementEdges(bands, sets,
            eKeptP.select(col(idCol).as("node"), col(idCol).as("cluster"))
              .limit(0),
            eKeptP, idCol, textCol, cfg.shingleK, cfg.jaccardThreshold,
            cfg.numPerm, cfg.bands, contractedBatchOnly = true)
          // stage-B labels of surviving docs are their own ids, so the
          // batch channel is already the survivor-survivor pair list
          (edges.corpus.select(col("ea").as(idCol)).distinct(),
            edges.batch.select(col("ea").as("id_a"), col("eb").as("id_b")))
        case st =>
          val pairs = st match {
            case (Some(bands), Some(sets)) =>
              Dedup.dedupIncrement(bands, sets, eKeptP, idCol, textCol,
                cfg.shingleK, cfg.jaccardThreshold, cfg.numPerm, cfg.bands)
            case _ =>
              Dedup.lshVerifiedPairs(eKeptP, idCol, textCol,
                cfg.shingleK, cfg.jaccardThreshold, cfg.numPerm, cfg.bands)
          }
          val batchIds = eKeptP.select(col(idCol))
          val aInBatch = pairs.select(col("id_a").as(idCol))
            .join(batchIds, Seq(idCol), "left_semi").select(col(idCol).as("id_a"))
          val bInBatch = pairs.select(col("id_b").as(idCol))
            .join(batchIds, Seq(idCol), "left_semi").select(col(idCol).as("id_b"))
          val tagged = pairs
            .join(aInBatch.distinct().withColumn("__a_new", lit(1)), Seq("id_a"), "left")
            .join(bInBatch.distinct().withColumn("__b_new", lit(1)), Seq("id_b"), "left")
          // any batch doc paired with a corpus doc drops immediately
          val corpusDrop = tagged
            .filter(col("__a_new").isNull || col("__b_new").isNull)
            .select(when(col("__a_new").isNotNull, col("id_a"))
              .otherwise(col("id_b")).as(idCol)).distinct()
          // batch-internal pairs among the remaining docs cluster as in curate()
          val inner = tagged
            .filter(col("__a_new").isNotNull && col("__b_new").isNotNull)
            .join(corpusDrop.select(col(idCol).as("id_a")), Seq("id_a"), "left_anti")
            .join(corpusDrop.select(col(idCol).as("id_b")), Seq("id_b"), "left_anti")
            .select("id_a", "id_b")
          (corpusDrop, inner)
      }
    val clusters = Dedup.dedupClusters(innerPairs, "id_a", "id_b")
    val canon = clusters
      .join(eKeptP.select(col(idCol).as("node"),
        length(col(textCol)).as("__len")), Seq("node"))
      .groupBy("cluster")
      .agg(max_by(col("node"), struct(col("__len"), -col("node"))).as("node"))
      .select(col("node"))
    val nearDropped = clusters.select("node")
      .join(canon, Seq("node"), "left_anti")
      .select(col("node").as(idCol))
      .unionByName(vsCorpusDrop)
    val nKept = eKeptP.join(nearDropped, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n3 = stage("near_dup", nKept,
      eKeptP.join(nearDropped, Seq(idCol), "left_semi"), n2)

    // 4. decontamination
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

    // 5. commit the batch: metadata the NEXT batch will dedup against
    //    (bands / sets / text hashes) first, the clean shards LAST —
    //    clean's existence is the batch's commit marker
    val (nbRaw, nsRaw) = Dedup.nearDupIndex(cKept, idCol, textCol,
      cfg.shingleK, cfg.numPerm, cfg.bands)
    nbRaw.write.mode("overwrite").parquet(part("index_bands"))
    nsRaw.write.mode("overwrite").parquet(part("index_sets"))
    // text_hashes is the SEEN-CONTENT registry, not the clean set: every
    // doc admitted past the quality gate registers, kept OR dropped.
    // Re-delivered content then always exact-drops against it — without
    // this, a transitive-cluster member whose only above-threshold
    // partners were themselves dropped would re-enter on re-delivery
    // (its canonical is below threshold from it; only its dropped twin
    // matched). 16 bytes per seen doc — linear, tiny state.
    qKept.select(col(idCol), xxhash64(col(textCol)).as("__h"))
      .write.mode("overwrite").parquet(part("text_hashes"))
    rejects.result().reduce(_ unionByName _)
      .write.mode("overwrite").parquet(part("rejects"))
    val sp = spark
    import sp.implicits._
    stages.result().toDF().coalesce(1)
      .write.mode("overwrite").parquet(part("stage_log"))
    graft.queries.PipelineQueries
      .epochShuffle(cKept, idCol, cfg.nShards, cfg.epoch)
      .join(cKept, Seq(idCol))
      .write.mode("overwrite").parquet(part("clean"))

    Seq(input, qKept, eKeptP, nKept).foreach(_.unpersist(blocking = false))
    if (cKept ne nKept) cKept.unpersist(blocking = false)
    Dedup.releaseCaches()
    CurationResult(nIn, nClean, stages.result())
  }

  /** The mixture-assembly result: `allocations` — one row per source
    * (source, src_tokens, target_tokens, alloc_tokens, full_epochs,
    * frac_rate_ppm); `sampled` — the input docs that made the mixture,
    * each with `n_copies` (>= 1): how many times the doc appears in
    * the assembled training set.
    */
  case class MixturePlan(allocations: DataFrame, sampled: DataFrame)

  /** Training-mixture assembly — the step AFTER [[curate]]: spend a
    * global token budget across sources under temperature-scaled
    * (alpha = 0.5) weights with a repetition cap. The allocation math
    * IS the q166/q172 advisor surface (CorpusPipelineSpec asserts the
    * frames agree row-for-row), EXECUTED as a repetition-aware sample:
    *
    *  - full epochs are exact — alloc DIV src_tokens copies of every
    *    doc in the source;
    *  - the fractional remainder samples by seeded hash threshold
    *    (xxhash64(doc_id, seed) % 1e6 < rate_ppm): expected token mass
    *    = the remainder, deterministic given the seed, and — unlike a
    *    per-source sort to a running-sum cutoff — requires NO ordered
    *    window over a corpus-sized partition, so the plan stays one
    *    broadcast join + map filter at any scale (the per-source sort
    *    would serialize a 100 TB source through one sort; expectation
    *    budgeting is the documented trade).
    *
    * Tokens are the n_chars DIV 4 proxy (q172's). Input needs
    * (source, doc_id, n_chars) columns — [[curate]]'s clean output
    * qualifies. Long bound: budgetTokens * s_scaled must fit a long —
    * safe through ~25 T tokens per source (q172's documented bound).
    */
  /** The temperature-scaled (alpha = 0.5) per-source token allocation
    * frame — ONE definition shared by the oracle-checked advisor
    * (`OpsQueries.q172` derives its surface from this) and the
    * executor ([[assembleMixture]] samples by it), so the formula can
    * never diverge between the gate and the pipeline. Columns:
    * (source, src_tokens, target_tokens, alloc_tokens, full_epochs,
    * frac_rate_ppm); all exact integers (q166's integer-sqrt posture).
    */
  def mixtureAllocations(docs: DataFrame, budgetTokens: Long,
                         maxEpochs: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    docs.groupBy("source")
      .agg(sum(expr("n_chars DIV 4")).cast("long").as("src_tokens"))
      .filter(col("src_tokens") > 0)
      .withColumn("s_scaled",
        floor(lit(1000.0) * sqrt(col("src_tokens").cast("double"))).cast("long"))
      .withColumn("denom", sum("s_scaled").over(wAll).cast("long"))
      .withColumn("target_tokens", expr(s"($budgetTokens * s_scaled) DIV denom"))
      .withColumn("alloc_tokens",
        least(col("target_tokens"), expr(s"$maxEpochs * src_tokens")).cast("long"))
      .withColumn("full_epochs", expr("alloc_tokens DIV src_tokens"))
      .withColumn("frac_rate_ppm",
        expr("((alloc_tokens % src_tokens) * 1000000) DIV src_tokens"))
      .select(col("source"), col("src_tokens"), col("target_tokens"),
        col("alloc_tokens"), col("full_epochs"), col("frac_rate_ppm"))
  }

  def assembleMixture(docs: DataFrame, budgetTokens: Long,
                      maxEpochs: Long = 4L, seed: Long = 42L): MixturePlan = {
    val allocations = mixtureAllocations(docs, budgetTokens, maxEpochs)
    val sampled = docs
      .join(broadcast(allocations
        .select(col("source"), col("full_epochs"), col("frac_rate_ppm"))), "source")
      .withColumn("__u", pmod(xxhash64(col("doc_id"), lit(seed)), lit(1000000L)))
      .withColumn("n_copies",
        (col("full_epochs") +
          when(col("__u") < col("frac_rate_ppm"), lit(1L)).otherwise(lit(0L)))
          .cast("long"))
      .filter(col("n_copies") > 0)
      .drop("__u", "full_epochs", "frac_rate_ppm")
    MixturePlan(allocations, sampled)
  }
}
