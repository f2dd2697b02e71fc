package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.storage.StorageLevel

import graft.functions.Hashes

/**
 * Incremental near-duplicate detection: documents arrive in micro-batches,
 * each batch is matched against everything already indexed (plus itself),
 * and the index grows by exactly the new batch — the streaming form of
 * `dedup_minhash_lsh`, and the reference's incremental-maintenance
 * contract (`/root/reference/index.js:173-249`: every write updates the
 * stored emissions) applied to an LSH index.
 *
 * Index layout (parquet, append-only — a batch never rewrites history):
 *   `bands/` (doc_id, band, bh)  — MinHash band postings, the collision key
 *   `docs/`  (doc_id, ts)        — hashed shingle sets for the exact verify
 *
 * Per batch: (1) one signature evaluation per new doc; (2) new×index
 * candidates from an equi-join of the batch's bands against the stored
 * postings — the shuffle moves the BATCH (small) against a pruned read of
 * the store, never the corpus; (3) new×new candidates within the batch;
 * (4) exact shingle-set Jaccard verify on candidates only; (5) append the
 * batch's bands + shingle sets. Store buckets hotter than `maxBandDf` are
 * dropped from candidate generation exactly like the batch pipeline's
 * posting core (df² noise; a true near-dup still collides in its other
 * bands).
 *
 * Equivalence: processing a corpus in ANY batch split yields the same
 * flagged pair set as the one-shot batch pipeline over the full corpus
 * (asserted in StreamingSpec), because "collides in some band" and the
 * verify threshold are both split-invariant below the df cap.
 */
final class StreamingNearDupIndex(
    spark: SparkSession,
    dir: String,
    threshold: Double = 0.5,
    maxBandDf: Int = 200) {

  private val bandsPath = s"$dir/bands"
  private val docsPath = s"$dir/docs"

  private def storeExists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(bandsPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Exact verify: shingle-set Jaccard over candidate `(i, j)` pairs with
    * per-side sets attached as `ts_i`/`ts_j`. */
  private def verified(cand: DataFrame): DataFrame =
    cand
      .withColumn("nt_i", size(col("ts_i")))
      .withColumn("nt_j", size(col("ts_j")))
      .withColumn("inter", size(array_intersect(col("ts_i"), col("ts_j"))))
      .filter(col("nt_i") + col("nt_j") - col("inter") > 0)
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("nt_i") + col("nt_j") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))

  /** Match one batch against the index and itself, then append it to the
    * index. Returns the flagged pairs `(i, j, jaccard)` with `i` the
    * earlier doc (index side, or the smaller id within the batch). */
  def applyBatch(batch: DataFrame): DataFrame = {
    Hashes.register(spark)
    // sub-shingle docs collide on constant signatures but can never pass
    // the verify — drop them before banding, like the batch pipeline
    val feat = batch.filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        expr("minhash_bands(text)").as("mb"),
        expr("shingle_hashes(text)").as("ts"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val newBands = feat.select(col("doc_id"),
        posexplode(col("mb")).as(Seq("band", "bh")))
      val newSets = feat.select(col("doc_id"), col("ts"))

      val newVsIndex: Option[DataFrame] = if (storeExists) {
        val oldBands = spark.read.parquet(bandsPath)
        // prune hot STORE buckets before the join (count-only pass, same
        // order-of-operations as the batch posting core: never collect a
        // hot bucket's members)
        val hot = oldBands.groupBy("band", "bh").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxBandDf).select("band", "bh")
        val cand = oldBands.join(hot, Seq("band", "bh"), "left_anti")
          .select(col("band"), col("bh"), col("doc_id").as("i"))
          .join(newBands.select(col("band"), col("bh"), col("doc_id").as("j")),
            Seq("band", "bh"))
          .select("i", "j").distinct()
        val oldSets = spark.read.parquet(docsPath)
        Some(verified(cand
          .join(oldSets.select(col("doc_id").as("i"), col("ts").as("ts_i")), Seq("i"))
          .join(newSets.select(col("doc_id").as("j"), col("ts").as("ts_j")), Seq("j"))))
      } else None

      // within-batch: same banding, canonical i < j
      val batchCand = newBands.select(col("band"), col("bh"), col("doc_id").as("i"))
        .join(newBands.select(col("band"), col("bh"), col("doc_id").as("j")),
          Seq("band", "bh"))
        .filter(col("i") < col("j"))
        .select("i", "j").distinct()
      val withinBatch = verified(batchCand
        .join(newSets.select(col("doc_id").as("i"), col("ts").as("ts_i")), Seq("i"))
        .join(newSets.select(col("doc_id").as("j"), col("ts").as("ts_j")), Seq("j")))

      val flagged = newVsIndex.map(_.unionByName(withinBatch)).getOrElse(withinBatch)
        .localCheckpoint(true) // materialize BEFORE the store grows below
      // append-only index growth; a batch never rewrites history
      newBands.write.mode("append").parquet(bandsPath)
      newSets.write.mode("append").parquet(docsPath)
      flagged
    } finally feat.unpersist(blocking = false)
  }

  /** Attach to a document stream; flagged pairs append to `outPath`. */
  def writer(docs: DataFrame, outPath: String): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch).write.mode("append").parquet(outPath)
      }
}
