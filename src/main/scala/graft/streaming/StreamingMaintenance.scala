package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import graft.engine.{AggView, MapIndex, MaterializedView, ViewStore}

/**
 * Streaming view maintenance: the push-based write path of the reference
 * (an Index IS a writable stream — `index.js:121-123,173-249`) expressed
 * as Structured Streaming.
 *
 * Each micro-batch is split into upserts and tombstones (`{key,
 * deleted:true}`, `index.js:178,187-205`) and applied through
 * [[MaterializedView.refresh]] — the same delete-then-insert contract the
 * reference runs per entry, amortized per batch. Cascaded indexes
 * (`index.pipe(secondary)`, `index.js:250-253`) chain inside the same
 * `foreachBatch`, so downstream views lag by exactly one micro-batch —
 * the streaming analog of the reference's event-loop-asynchronous
 * propagation (`tests/test-replication.js:29-35`).
 *
 * Scale note: `foreachBatch` makes every batch plain batch Spark, so the
 * refresh inherits the broadcast anti-join upsert (changed keys are small
 * per batch; the big view is scanned, never shuffled).
 */
final class StreamingMapIndex(
    index: MapIndex,
    store: ViewStore,
    cascades: Seq[MapIndex] = Nil) {

  /** Apply one batch of source entries (with optional `deleted` column). */
  def applyBatch(batch: DataFrame): Unit = {
    val hasTombstones = batch.columns.contains("deleted")
    val upserts =
      if (hasTombstones) batch.filter(!coalesce(col("deleted"), lit(false))) else batch
    val deletes =
      if (hasTombstones)
        Some(batch.filter(coalesce(col("deleted"), lit(false)))
          .select(col("key").cast("string").as("src_key")))
      else None
    val vBefore = store.latestVersion(index.name)
    val view = vBefore match {
      case Some(_) => store.load(index).refresh(upserts, deletes)
      case None    => index.materialize(upserts, store) // first batch bootstraps
    }
    // cascade (incremental propagation, O17): an established downstream
    // catches up by replaying THIS batch's CDC sidecar — an O(delta)
    // read, no upstream scan. (The previous shape re-read the whole
    // upstream view per micro-batch for the semi-joined cascadeSource —
    // a full scan per batch, which defeats micro-batching at scale.)
    cascades.foreach { next =>
      (store.latestVersion(next.name), vBefore) match {
        // replay needs the (v0, v0+1] endpoints addressable — on a
        // grace-0 store v0 is already reclaimed, so fall through to the
        // full rebuild instead of failing the batch
        case (Some(_), Some(v0)) if store.readableVersions(index.name).contains(v0) =>
          view.cascadeChangesInto(next, v0, v0 + 1)
        case _ => // downstream (or upstream) bootstrap: full snapshot feed
          next.materialize(view.cascadeSource, store)
      }
    }
  }

  /** Attach to a stream of source entries; caller picks trigger/checkpoint. */
  def writer(entries: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    entries.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch) }
}

/**
 * Streaming maintenance of a base view PLUS its grouped-aggregate state
 * ([[graft.engine.AggView]] — the completed reduce half): each
 * micro-batch runs the joint refresh, so the materialized aggregates are
 * continuously current (zero-batch lag) and maintenance cost per batch is
 * delta-bounded — count/sum delta-merge, min/max touched-group recompute.
 * This is the streaming shape of the reference's "reduce on write"
 * ambition its `count`/`group(finish)` stubs pointed at
 * (`/root/reference/index.js:64,148-150`).
 */
final class StreamingAggMapIndex(
    index: MapIndex,
    store: ViewStore,
    stateName: String) {

  def applyBatch(batch: DataFrame): Unit = {
    val hasTombstones = batch.columns.contains("deleted")
    val upserts =
      if (hasTombstones) batch.filter(!coalesce(col("deleted"), lit(false))) else batch
    val deletes =
      if (hasTombstones)
        Some(batch.filter(coalesce(col("deleted"), lit(false)))
          .select(col("key").cast("string").as("src_key")))
      else None
    store.latestVersion(index.name) match {
      case Some(_) =>
        val base = store.load(index)
        AggView.attach(base.spark, store, stateName).refresh(base, upserts, deletes)
      case None => // first batch bootstraps base and state together
        AggView.build(index.materialize(upserts, store), stateName)
    }
    ()
  }

  def writer(entries: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    entries.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch) }
}

/**
 * Streaming maintenance over the bucket-partitioned store: identical
 * micro-batch contract, but each batch's delete-then-insert touches only
 * the buckets holding the changed keys (meta back-pointer lookup) — the
 * configuration a 100 TB deployment runs, where rewriting the whole view
 * per micro-batch is not an option.
 *
 * Cascades (`index.pipe(secondary)`, `index.js:250-253`) chain per
 * micro-batch exactly like the flat path: the downstream refresh is scoped
 * to the upstream keys this batch touched, so it too rewrites only the
 * buckets those keys live in — incremental propagation end to end
 * (`tests/test-replication.js:27-51`).
 */
final class BucketedStreamingMapIndex(
    index: MapIndex,
    store: graft.engine.BucketedViewStore,
    cascades: Seq[MapIndex] = Nil,
    /** Run a compaction epoch ([[graft.engine.BucketedViewStore.compact]])
      * after every N micro-batches (0 = never). A long-running stream of
      * small batches is exactly the tiny-refresh workload that accretes
      * salted file slices inside live buckets; periodic folding keeps the
      * per-read file count bounded for the life of the stream, at the
      * cost of one no-change epoch per N batches. The cascade's O(delta)
      * catch-up is unaffected: it always replays exactly the latest
      * refresh epoch, and a compaction epoch's sidecar is empty. */
    compactEvery: Int = 0) {

  private var batchesApplied = 0L

  def applyBatch(batch: DataFrame): Unit = {
    val hasTombstones = batch.columns.contains("deleted")
    val upserts =
      if (hasTombstones) batch.filter(!coalesce(col("deleted"), lit(false))) else batch
    val deletes =
      if (hasTombstones)
        Some(batch.filter(coalesce(col("deleted"), lit(false)))
          .select(col("key").cast("string").as("src_key")))
      else None
    val fresh = store.manifest(index.name).isEmpty
    if (fresh) store.materialize(index, upserts)
    else store.refresh(index, upserts, deletes)
    cascades.foreach { next =>
      if (store.manifest(next.name).isEmpty || fresh)
        store.materialize(next, MaterializedView.cascadeSourceOf(store.df(index.name)))
      else {
        // an established downstream catches up from THIS batch's CDC
        // sidecar: O(delta) read, no bucket scan at all. (The previous
        // shape semi-joined the FULL upstream relation per micro-batch —
        // emissions are bucketed by emit_key, so a changed src_key's rows
        // span buckets and nothing prunes; at 100 TB that is a full-view
        // scan per batch.)
        val e1 = store.epoch(index.name)
        val (changedSource, touched) =
          MaterializedView.replayDelta(store.changesBetween(index.name, e1 - 1, e1))
        store.refresh(next, changedSource, Some(touched))
      }
    }
    batchesApplied += 1
    if (compactEvery > 0 && batchesApplied % compactEvery == 0) {
      store.compact(index.name)
      cascades.foreach(c => if (!store.manifest(c.name).isEmpty) store.compact(c.name))
    }
  }

  def writer(entries: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    entries.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch) }
}

/**
 * Streaming maintenance of the EXACT incremental near-dup pair graph
 * ([[graft.operators.PairGraphIndex]]): each micro-batch of documents
 * (optional `deleted` tombstones) updates the stored text/posting/size
 * views and the pair relation in O(batch · df); the pair graph after ANY
 * batch split equals the one-shot batch build over the same final corpus
 * — the dedup-index analog of the engine's view-maintenance contract.
 * First batch bootstraps via [[graft.operators.PairGraphIndex.build]].
 */
final class StreamingPairGraph(graph: graft.operators.PairGraphIndex,
    /** optionally maintain the components LABELING one relation further
      * downstream: after each batch's pair refresh, the labeling is
      * updated from the pair graph's own edge CDC
      * ([[graft.operators.ComponentsIndex]]) — the full maintenance
      * chain docs → pairs → clusters runs per micro-batch, each stage
      * consuming the previous stage's O(delta) feed. */
    components: Option[graft.operators.ComponentsIndex] = None) {
  def applyBatch(batch: DataFrame): Unit = {
    // foreachBatch hands a DataFrame rooted in the STREAM's cloned
    // session (cloned at start, possibly before the graph ever
    // registered its key-extraction functions) — register on the
    // batch's own session so `shingle_hashes`/`winnow_hashes` resolve
    // regardless of what ran before the stream started
    graft.functions.Hashes.register(batch.sparkSession)
    val hasTombstones = batch.columns.contains("deleted")
    val upserts =
      if (hasTombstones) batch.filter(!coalesce(col("deleted"), lit(false))) else batch
    val dels =
      if (hasTombstones)
        Some(batch.filter(coalesce(col("deleted"), lit(false))).select("doc_id"))
      else None
    val ups = upserts.select("doc_id", "text")
    val before = if (graph.isBuilt) Some(graph.pairsVersion) else None
    if (!graph.isBuilt) {
      graph.build(ups)
      dels.foreach(d => graph.refresh(ups.limit(0), Some(d)))
    } else graph.refresh(ups, dels)
    components.foreach { ci =>
      before match {
        case None =>
          // a labeling that predates its own pair graph can hold rows no
          // feed will ever retract — refuse rather than serve them stale
          require(!ci.isBuilt,
            "components index predates its pair graph; rebuild it against this graph")
          ci.build(graph.pairs) // bootstrap on the current pairs
        case Some(v0) =>
          if (!ci.isBuilt) ci.build(graph.pairs)
          else ci.refresh( // the batch's whole edge delta (one refresh =
            // one pair version; sidecar retention covers it); dirty-region
            // edges come bucket-pruned from the dual-keyed pair view
            graph.pairsChanges(v0, graph.pairsVersion), graph.incidentPairs _)
      }
    }
  }

  def writer(docs: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch) }
}

/** Streaming exact deduplication for an ingest pipeline: keep the
  * first-ARRIVING document per content hash within the watermark window.
  * With out-of-order arrival the kept doc may not be the
  * event-time-earliest — this diverges from the batch `dedup_exact`
  * keeper rule (min doc_id); a pipeline needing the batch rule exactly
  * reconciles in the batch backstop pass. `dropDuplicatesWithinWatermark`
  * bounds the dedup state — a hash is only held until the watermark
  * passes it, so state is proportional to the window, not the corpus. */
object StreamingDedup {
  def firstPerContent(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}

/** Event-time analytics over a stream: windowed aggregation with
  * watermarked late-data handling — the capability layer the reference's
  * ordering-only write path never had (SURVEY.md §2.2 streaming row). */
object StreamingEvents {

  /**
   * Stream-stream interval join: each purchase joins the clicks of the
   * same user within the preceding hour. Watermarks on BOTH sides plus
   * the time-range condition bound the join state — Spark evicts click
   * state older than (watermark − interval), so state is proportional to
   * the window, not the stream history.
   */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", "30 minutes")
    val p = purchases
      .select(col("user_id"), col("ts").as("purchase_ts"), col("event_id"))
      .withWatermark("purchase_ts", "30 minutes")
    p.join(c,
      col("c_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("event_id"), col("user_id"), col("purchase_ts"),
        col("click_ts"), col("click_value"))
  }

  /** Tumbling 1-hour counts/sums per event type; late data beyond the
    * watermark is dropped by Spark's state eviction. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("cnt"), col("sum_value"))

  def run(events: DataFrame, queryName: String): Unit = {
    val q = hourlyAgg(events).writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
