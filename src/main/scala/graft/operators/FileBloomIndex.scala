package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file bloom index for POINT lookups — the hash-key complement of
  * [[ZOrder.fileIndex]]'s min/max envelopes (which skip RANGE scans but
  * are useless for `key = x` on a high-cardinality column scattered
  * through every file's value range). One row per parquet file holding
  * a bloom over the file's keys; a point read consults the index and
  * opens only the files that may contain the key — the lakehouse
  * bloom-skipping mechanic (Parquet column-index blooms, Delta bloom
  * indexes) as an explicit table.
  *
  * Scale accounting: the index costs ~`n·ln(1/fpp)/ln²2` bits per file
  * (~1.2 MB per 1M-row file at 1% — about 1% of the data's footprint).
  * It is therefore a TABLE, not driver state: the probe evaluates
  * `mightContain` DISTRIBUTED over the index rows and collects only the
  * matching file names (file-count-sized), never the blooms themselves.
  * Keys are `xxhash64` of the key column, so any input type (and null)
  * indexes uniformly; false positives only ever cost extra file reads —
  * the residual filter keeps the result exact, false negatives are
  * impossible (spec-asserted equality with the full scan).
  */
object FileBloomIndex {

  class BloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0,1), got $expectedItems / $fpp")
    def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    def reduce(b: BloomFilter, k: Long): BloomFilter = { b.putLong(k); b }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter = { a.mergeInPlace(b); a }
    def finish(r: BloomFilter): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      r.writeTo(bos)
      bos.toByteArray
    }
    def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the index: (file, n_rows, bloom, key_type) — one aggregation
    * pass over the table, partial blooms merged map-side like any
    * Aggregator. `key_type` records the key column's data type so
    * point reads can cast their probe literal without re-listing the
    * data directory. Size `expectedItemsPerFile` to the layout's
    * rows-per-file; overshooting wastes bytes, undershooting raises
    * fpp, never correctness.
    */
  def bloomIndex(spark: SparkSession, path: String, keyCol: String,
                 expectedItemsPerFile: Long = 1000000L,
                 fpp: Double = 0.01): DataFrame = {
    val agg = udaf(new BloomAgg(expectedItemsPerFile, fpp), Encoders.scalaLong)
    val data = spark.read.parquet(path)
    data
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), agg(xxhash64(col(keyCol))).as("bloom"))
      .withColumn("key_type", lit(data.schema(keyCol).dataType.catalogString))
      .withColumn("key_col", lit(keyCol))
  }

  /** Advisor-sized build — the q181 measure→act loop closed: instead of
    * the caller-guessed `expectedItemsPerFile` default, run a per-file
    * distinct-key census (one `approx_count_distinct` pass, map-side
    * partials — priced like the build's own aggregation) and size every
    * bloom to the LARGEST file's key count plus `headroom`. Sizing to
    * the max means no file's bloom is undersized (the target fpp holds
    * everywhere); a 1M-row guess over 10k-key files would waste ~100×
    * the index bytes, and a 10k guess over 1M-key files would blow the
    * fpp through the ceiling — both silent today, both measured here.
    * The census runs approx_count_distinct at rsd 0.02, so the default
    * 10% headroom sits ≥5σ above the estimator's error (undersizing
    * probability ~3e-7 per build, vs ~2% had the default 5% rsd been
    * paired with 10% headroom); an over-estimate only costs bytes,
    * never correctness (the q181 `m_bits = n·ln(1/p)/ln²2`
    * relationship — more bits at fixed keys = lower fpp).
    *
    * Returns the index plus the measured sizing so callers can log the
    * decision (the advisor posture: measurements are surfaced, not
    * swallowed).
    */
  def bloomIndexSized(spark: SparkSession, path: String, keyCol: String,
                      fpp: Double = 0.01,
                      headroom: Double = 0.10): (DataFrame, Long) = {
    require(headroom >= 0, s"headroom must be non-negative, got $headroom")
    val census = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(approx_count_distinct(col(keyCol), 0.02).as("n_keys"))
      .agg(max(col("n_keys"))).head()
    val maxKeys = if (census.isNullAt(0)) 1L else math.max(1L, census.getLong(0))
    val sized = math.max(1L, (maxKeys * (1.0 + headroom)).ceil.toLong)
    (bloomIndex(spark, path, keyCol, sized, fpp), sized)
  }

  /** Incrementally refresh the index after ingest: bloom ONLY the
    * files not yet covered, keep existing rows for still-present
    * files, and drop rows for files that vanished (compaction /
    * retention delete). The scan cost is proportional to the NEW data
    * — the lakehouse steady state, where a per-batch full [[bloomIndex]]
    * rebuild would pay O(corpus) per ingest. File identity comes from
    * the same `input_file_name()` form the build writes, compared
    * against the reader's `inputFiles` listing (metadata-sized — no
    * data scan to learn the file set). A 0-row file never gets an
    * index row (a groupBy build has nothing to bloom; point reads
    * never need it) and is re-examined on each update — a zero-row
    * scan, metadata-bounded.
    *
    * Pass the STORED index table (read back from wherever it
    * persists), not the unmaterialized [[bloomIndex]] plan: a cached
    * build plan still reads the data path, and Spark re-caches by
    * path on write — an append would silently turn "existing" into a
    * full rebuild of the grown directory (same caveat as
    * [[prunedPointRead]]).
    */
  def updateIndex(spark: SparkSession, path: String, existing: DataFrame,
                  keyCol: String, expectedItemsPerFile: Long = 1000000L,
                  fpp: Double = 0.01,
                  assumeLegacyKeyCol: Boolean = false): DataFrame = {
    // guard on the MAX non-null key_col, not an arbitrary row: an index
    // migrated once from a pre-key_col build is a MIX of null (carried
    // rows) and populated key_col rows, and take(1) would make the guard
    // nondeterministic. max skips nulls; build/backfill write ONE literal
    // per update so a populated index can only ever hold one value.
    //
    // Legacy rows (null key_col, or a pre-metadata index with no
    // key_col column at all) carry blooms whose build column is
    // UNVERIFIABLE. Backfilling them with the current keyCol would
    // launder that uncertainty into confident, permanent metadata that
    // the max-guard then trusts forever — prunedPointRead/forgetKey
    // would prune on blooms possibly hashing a different column
    // (silent false "definitely absent"). So backfill requires the
    // caller's EXPLICIT assertion (assumeLegacyKeyCol=true = "I know
    // the legacy index was built on this keyCol"); the default refuses
    // and demands a rebuild. Destructive callers (forgetKey) never
    // assert it.
    if (existing.columns.contains("key_col")) {
      val r = existing.agg(max("key_col"),
        (count(lit(1)) - count(col("key_col"))).as("n_legacy")).head()
      if (!r.isNullAt(0))
        require(r.getString(0) == keyCol,
          s"index was built on '${r.getString(0)}' but updated with '$keyCol' — " +
            "rebuild instead")
      require(r.getLong(1) == 0 || assumeLegacyKeyCol,
        s"index holds ${r.getLong(1)} rows with no recorded key_col (pre-metadata " +
          s"build) — rebuild it, or pass assumeLegacyKeyCol=true only if it was " +
          s"verifiably built on '$keyCol'")
    } else {
      require(existing.isEmpty || assumeLegacyKeyCol,
        s"index predates key_col metadata — rebuild it, or pass " +
          s"assumeLegacyKeyCol=true only if it was verifiably built on '$keyCol'")
    }
    val data = spark.read.parquet(path)
    val keyTypeStr = data.schema(keyCol).dataType.catalogString
    val present = data.inputFiles.toSet
    val covered = {
      import spark.implicits._
      existing.select("file").as[String].collect().toSet
    }
    val newFiles = present.diff(covered).toSeq.sorted
    val kept = {
      import spark.implicits._
      val presentDf = present.toSeq.toDF("file")
      val base = existing.join(presentDf, "file")
      // backfill the metadata columns on carried rows so the stored index
      // is UNIFORM after one update — pre-key_col rows otherwise carry
      // nulls forever (via allowMissingColumns) and keep the guard and
      // prunedPointRead's type resolution row-order-dependent
      val withType =
        if (base.columns.contains("key_type"))
          base.withColumn("key_type", coalesce(col("key_type"), lit(keyTypeStr)))
        else base.withColumn("key_type", lit(keyTypeStr))
      if (withType.columns.contains("key_col"))
        withType.withColumn("key_col", coalesce(col("key_col"), lit(keyCol)))
      else withType.withColumn("key_col", lit(keyCol))
    }
    if (newFiles.isEmpty) kept
    else {
      val agg = udaf(new BloomAgg(expectedItemsPerFile, fpp), Encoders.scalaLong)
      // schema supplied from the table read above — no second footer pass
      val fresh = spark.read.schema(data.schema).parquet(newFiles: _*)
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n_rows"), agg(xxhash64(col(keyCol))).as("bloom"))
        .withColumn("key_type", lit(keyTypeStr))
        .withColumn("key_col", lit(keyCol))
      kept.unionByName(fresh)
    }
  }

  /** Point read through the index: open only files whose bloom may
    * contain `key`. The probe hash uses the SAME Spark `xxhash64` as
    * the build — evaluated on the literal CAST TO THE STORED COLUMN'S
    * TYPE, because Spark hash functions are type-sensitive: an Int
    * probe against a Long column would hash differently and produce
    * silent bloom false negatives, breaking the no-false-negatives
    * contract. The membership test runs distributed over the index,
    * and only matching file NAMES reach the driver. `key` must be
    * non-null: NULL never equals the residual predicate and has no
    * meaningful bloom membership.
    */
  def prunedPointRead(spark: SparkSession, path: String, index: DataFrame,
                      keyCol: String, key: Any): DataFrame = {
    require(key != null, "prunedPointRead needs a non-null key")
    // resolve the stored column type from the index itself (one tiny
    // read of the stored index table) — re-opening the data path would
    // pay a full file listing + footer pass per point lookup just to
    // learn a constant. Fall back to the data path for pre-key_type
    // indexes AND for an empty index (zero files → zero index rows →
    // take(1) empty; the read must still return an empty typed frame,
    // not throw). Note the probe evaluates the index plan — pass the
    // STORED index table, not an unmaterialized build pipeline.
    val keyType = {
      // resolve via MAX over the metadata columns, not take(1): a
      // once-migrated index may hold nulls on carried rows, and an
      // arbitrary-row read would nondeterministically miss the stored
      // value (updateIndex backfills, but an index written before that
      // fix can still be mixed)
      val stored =
        if (index.columns.contains("key_type")) {
          val r =
            if (index.columns.contains("key_col"))
              index.agg(max("key_type"), max("key_col")).head()
            else index.agg(max("key_type")).head()
          if (r.isNullAt(0)) None
          else {
            // the stored type is only meaningful for the column the
            // index was BUILT on — probing a different column with it
            // would silently prune on the wrong key semantics
            if (r.length > 1 && !r.isNullAt(1)) {
              val built = r.getString(1)
              require(built == keyCol,
                s"index was built on '$built' but probed with '$keyCol' — " +
                  "rebuild the index on the probe column")
            }
            Some(org.apache.spark.sql.types.DataType.fromDDL(r.getString(0)))
          }
        } else None
      stored.getOrElse(spark.read.parquet(path).schema(keyCol).dataType)
    }
    val probe = lit(key).cast(keyType)
    val hk = spark.range(1).select(xxhash64(probe)).head().getLong(0)
    import spark.implicits._
    val keep = index.select(col("file"), col("bloom"))
      .as[(String, Array[Byte])]
      .filter { case (_, bytes) =>
        BloomFilter.readFrom(new ByteArrayInputStream(bytes)).mightContainLong(hk)
      }
      .map(_._1).collect()
    val base =
      if (keep.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(keep.toIndexedSeq: _*)
    base.filter(col(keyCol) === probe)
  }
}
