package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, NumericType, StructType, TimestampNTZType, TimestampType}

/**
 * Time-sliced incrementally-maintained windowed aggregate with WATERMARK
 * EVICTION — the "trailing-N-days metrics per group, always fresh" shape,
 * where maintenance cost is bounded by the change batch and retention cost
 * by the expired slices, never by accumulated history.
 *
 * The reference's map/reduce pair has no time dimension: its `group`
 * (`/root/reference/index.js:64-74`) folds the whole stored index, so a
 * retention policy there is "re-run over an ever-growing LevelDB". This
 * family completes the architecture for the append-mostly event workloads
 * a 100 TB store actually runs:
 *
 *  - State is PARTITIONED BY TIME SLICE ([[SliceStore]]): one versioned
 *    sub-relation per slice holding `emit_key, cnt, sum_value, min_value,
 *    max_value` for emissions whose ts falls in `[start, start+slice)`.
 *  - A refresh folds the batch's ±1-weighted partials grouped by
 *    `(slice, group)` and rewrites ONLY touched slices — all staged in
 *    ONE Spark job then published by per-slice directory RENAME
 *    ([[ViewStore.adoptStaged]]): k touched slices cost one job plus k
 *    metadata moves. An upsert that MOVES an event across a slice
 *    boundary (the shared `%37` +1 h batch does) retracts from the old
 *    slice and lands in the new one.
 *  - `cnt`/`sum` merge retractably; `min`/`max` are recomputed from the
 *    post-refresh base, but only for touched `(slice, group)` pairs —
 *    one more scan of the base, semi-joined down to the delta's groups.
 *  - [[evictBefore]] advances the watermark and DROPS expired slice
 *    directories — O(expired slices) metadata work, zero bytes of
 *    surviving state rewritten. This is the file-level analog of
 *    partition-drop retention in a table format — the only retention
 *    shape that holds at 100 TB (a delete-predicate rewrite of a year of
 *    state does not). Late changes below the watermark are REFUSED
 *    loudly; the watermark persists BEFORE the drops, so a crash
 *    mid-eviction fails closed.
 *
 * Serving composes slice aggregates: any slice-ALIGNED window is the
 * group-wise merge of its slices' partials (cnt/sum add, min/max
 * combine) — the pre-aggregation contract of every time-series store.
 * Sub-slice boundaries are rejected rather than silently rounded.
 *
 * Emission contract: the base [[MapIndex]] emits `emit_key` = group and
 * `emit_value = struct(ts: timestamp, v: numeric)` — validated at build.
 */
final class WindowedAggView private[engine] (
    private[engine] val store: SliceStore) extends Serializable {

  def spark: SparkSession = store.spark
  def rootDir: String = store.rootDir
  def sliceSeconds: Long = store.sliceSeconds
  def watermark: Long = store.watermark
  def liveSlices: Seq[Long] = store.liveSlices
  /** Serving layout: live `(start, width)` pairs, shadowed members
    * excluded ([[SliceStore.effectiveSliceWidths]]). */
  def effectiveSlices: Seq[(Long, Long)] = store.effectiveSliceWidths

  /** One slice's state: `emit_key, cnt, sum_value, min_value, max_value`. */
  def sliceState(start: Long): DataFrame = store.sliceState(start)

  /** Full live state with its slice column (`slice_start` epoch seconds). */
  def state: DataFrame = store.state

  /** ONE group's per-slice series — the metric-dashboard serve ("this
    * metric, daily"). The equality predicate pushes through the slice
    * union into every slice scan, where the `(slice_start, emit_key)`
    * clustering makes it a file/row-group-pruned point read per slice. */
  def history(groupKey: String): DataFrame =
    store.stateWhere(Some(col("emit_key") === groupKey))

  /** A slice's current version (refreshes are per-slice versioned swaps). */
  def sliceVersion(start: Long): Int = store.sliceVersion(start)

  /** Time travel on ONE slice: its state as of a retained version —
    * pre-refresh reads of touched slices until grace GC passes them. */
  def sliceStateAsOf(start: Long, version: Int): DataFrame =
    store.sliceStateAsOf(start, version)

  /** One slice's aggregate CDC feed over `(fromV, toV]` — which groups'
    * aggregates changed, old row as delete and new row as insert
    * ([[SliceStore.sliceChanges]]): the cache-invalidation /
    * downstream-notification surface. */
  def sliceChanges(start: Long, fromV: Int, toV: Int): DataFrame =
    store.sliceChanges(start, fromV, toV)

  /** Group-wise aggregate over the slice-ALIGNED window `[start, end)`
    * (epoch seconds). Merges the covered slices' partials — no event
    * rescan. Windows reaching below the watermark are refused: evicted
    * slices would silently under-count them. */
  def window(startSec: Long, endSec: Long): DataFrame =
    store.windowStates(startSec, endSec)
      .groupBy("emit_key")
      .agg(sum("cnt").as("cnt"),
        sum("sum_value").cast(WindowedAggView.SumType).as("sum_value"),
        min("min_value").as("min_value"), max("max_value").as("max_value"))

  /** Trailing `n`-slice window ending at (and including) the newest live
    * slice — the "last 7 days as of now" serve. */
  def trailing(n: Int): DataFrame = {
    val (s0, e0) = store.trailingBounds(n)
    window(s0, e0)
  }

  /** Advance the watermark and drop expired slices; see
    * [[SliceStore.evictBefore]]. Returns the evicted slice starts. */
  def evictBefore(boundarySec: Long): Seq[Long] = store.evictBefore(boundarySec)

  /** Heal crash-leftover member slices shadowed by a coarse slice
    * ([[SliceStore.dropShadowed]]); readers already skip them. */
  def dropShadowed(): Seq[Long] = store.dropShadowed()

  /**
   * ROLLUP AGING: rewrite every slice ending at or below `boundarySec`
   * (on the `toWidth` grid) into `toWidth`-wide slices by merging their
   * partials group-wise — cnt/sum add, min/max combine, all exact, so
   * aged history serves the same answers at 1/(toWidth/slice) the slice
   * count and file count. The range freezes first ([[SliceStore.frozen]]):
   * fine-grained retractions below it refuse from then on. Tiered
   * retention at 100 TB is exactly this: days → weeks → months, each
   * tier dropped wholesale by [[evictBefore]] when it expires. Returns
   * the coarse slice starts written.
   */
  def coarsen(boundarySec: Long, toWidth: Long): Seq[Long] = {
    val groups = store.coarsenGroups(boundarySec, toWidth)
    if (groups.isEmpty) return Seq.empty
    // every member in ONE scan, bucketed to its coarse start in-plan
    val toCoarse = map(groups.flatMap { case (cs, ms) =>
      ms.flatMap(m => Seq(lit(m), lit(cs))) }: _*)
    val merged = store.readSlices(groups.flatMap(_._2))
      .withColumn("slice_start", element_at(toCoarse, col("slice_start")))
      .groupBy("slice_start", "emit_key")
      .agg(sum("cnt").as("cnt"),
        sum("sum_value").cast(WindowedAggView.SumType).as("sum_value"),
        min("min_value").as("min_value"), max("max_value").as("max_value"))
    store.publishCoarsened(merged, groups, toWidth, boundarySec)
    groups.map(_._1)
  }

  /**
   * Refresh the base view AND this windowed state from one change batch
   * (the [[MaterializedView.refresh]] contract), returning both
   * post-refresh handles. Cost: the base refresh, one scan of each of
   * pre-base/batch/post-base, the touched slices' state reads, and ONE
   * staged write job publishing every touched slice.
   */
  def refresh(
      base: MaterializedView,
      upserts: DataFrame,
      deleteKeys: Option[DataFrame] = None): (MaterializedView, WindowedAggView) = {
    WindowedAggView.requireEmissionShape(base.df)
    // pin the pre-refresh snapshot path BEFORE the base swap (the store's
    // graceVersions >= 1 keeps it readable under the swap)
    val preDf = base.df
    val post = base.refresh(upserts, deleteKeys)
    val postDf = post.df
    val upsertKeys = base.index.touchedKeys(upserts)
    val changed = deleteKeys match {
      case Some(d) => upsertKeys.union(d.toDF("src_key")).distinct()
      case None    => upsertKeys
    }
    val oldEmis = preDf.join(broadcast(changed), Seq("src_key"), "left_semi")
    val newEmis = base.index.emissions(upserts)
    val delta = WindowedAggView.partials(this, oldEmis, negate = true)
      .unionByName(WindowedAggView.partials(this, newEmis, negate = false))
      .groupBy("slice_start", "emit_key")
      .agg(sum("d_cnt").as("d_cnt"),
        sum("d_sum").cast(WindowedAggView.SumType).as("d_sum"))
      .persist()
    try {
      val touched = delta.select("slice_start").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      if (touched.isEmpty) return (post, this)
      store.requireRefreshable(touched)
      val live = liveSlices.toSet
      // current state of the touched slices, one scan (a brand-new slice
      // has none)
      val touchedLive = touched.filter(live)
      val oldStates =
        if (touchedLive.nonEmpty) store.readSlices(touchedLive)
        else delta.select(col("slice_start"), col("emit_key"),
          lit(0L).as("cnt"),
          lit(null).cast(WindowedAggView.SumType).as("sum_value"),
          lit(null).cast("double").as("min_value"),
          lit(null).cast("double").as("max_value")).filter(lit(false))
      // min/max are not retractable: recompute from the refreshed base,
      // but ONLY for touched (slice, group) pairs — one semi-joined scan
      val touchedPairs = delta.select("slice_start", "emit_key")
      val mm = WindowedAggView.sliced(this, postDf)
        .join(broadcast(touchedPairs), Seq("slice_start", "emit_key"), "left_semi")
        .groupBy("slice_start", "emit_key")
        .agg(min("v").as("mm_min"), max("v").as("mm_max"))
      val zero = lit(0).cast(WindowedAggView.SumType)
      val mergedCnt = oldStates
        .join(delta, Seq("slice_start", "emit_key"), "full_outer")
        .select(col("slice_start"), col("emit_key"),
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
          (coalesce(col("sum_value"), zero) + coalesce(col("d_sum"), zero))
            .cast(WindowedAggView.SumType).as("sum_value"),
          col("min_value"), col("max_value"),
          col("d_cnt").isNotNull.as("_touched"))
        .filter(col("cnt") > 0) // a group whose count reaches zero vanishes
      val updated = mergedCnt
        .join(mm, Seq("slice_start", "emit_key"), "left_outer")
        .select(col("slice_start"), col("emit_key"), col("cnt"), col("sum_value"),
          when(col("_touched"), col("mm_min")).otherwise(col("min_value")).as("min_value"),
          when(col("_touched"), col("mm_max")).otherwise(col("max_value")).as("max_value"))
      // CDC sidecar per touched slice: delete of each touched group's old
      // aggregate row, insert of its new one (groups whose count reached
      // zero appear as deletes only) — the AggView state-delta contract,
      // here slice-partitioned and version-stamped at read
      // ([[sliceChanges]])
      val cdc = oldStates
        .join(broadcast(touchedPairs), Seq("slice_start", "emit_key"), "left_semi")
        .withColumn("change_type", lit("delete"))
        .unionByName(updated
          .join(broadcast(touchedPairs), Seq("slice_start", "emit_key"), "left_semi")
          .withColumn("change_type", lit("insert")))
      store.stageAndPublish(updated, touched, Some(cdc))
      (post, this)
    } finally delta.unpersist()
  }
}

object WindowedAggView {
  /** Same exact-merge DECIMAL contract as [[AggView.SumType]]. */
  private[engine] val SumType = DecimalType(28, 4)

  /** Slice start (epoch seconds) of an emission timestamp. Integer floor
    * over truncated seconds equals floor over fractional seconds for the
    * non-negative epochs this engine stores, so the DuckDB oracle's
    * `floor(epoch(ts)/w)*w` lands on the same boundary. */
  private[engine] def sliceOf(w: Long, ts: org.apache.spark.sql.Column) =
    // the cast is a no-op for timestamps, reads NTZ wall-clocks as UTC
    // instants (sessions run UTC), and maps DATE to midnight UTC, so
    // every accepted ts type slices on the same grid the oracle's
    // epoch() arithmetic does
    (floor(unix_seconds(ts.cast("timestamp")) / w).cast("long") * w)

  private[engine] def sliced(v: WindowedAggView, emissions: DataFrame): DataFrame =
    emissions.select(
      sliceOf(v.sliceSeconds, col("emit_value.ts")).as("slice_start"),
      col("emit_key"),
      col("emit_value.v").as("v"))

  private[engine] def partials(
      v: WindowedAggView, emissions: DataFrame, negate: Boolean): DataFrame = {
    val x = col("emit_value.v").cast(DecimalType(18, 4))
    emissions.select(
      sliceOf(v.sliceSeconds, col("emit_value.ts")).as("slice_start"),
      col("emit_key"),
      lit(if (negate) -1L else 1L).as("d_cnt"),
      (if (negate) -x else x).as("d_sum"))
  }

  /** Fail at build time, not mid-maintenance: the windowed family needs
    * `emit_value = struct(ts: timestamp|timestamp_ntz|date, v: numeric)` (dates slice
    * on their UTC midnights — see [[sliceOf]]). */
  private[engine] def requireEmissionShape(emissions: DataFrame): Unit =
    emissions.schema("emit_value").dataType match {
      case s: StructType
        if s.fieldNames.contains("ts") && s.fieldNames.contains("v") &&
           Seq(TimestampType, TimestampNTZType, DateType).contains(s("ts").dataType) &&
           s("v").dataType.isInstanceOf[NumericType] => ()
      case other => throw new IllegalArgumentException(
        "WindowedAggView requires emit_value = struct(ts: timestamp|timestamp_ntz|date, v: numeric), " +
          s"got $other")
    }

  /** Full build from the base view's current snapshot: one aggregate job,
    * one staged write, k slice publishes. */
  def build(base: MaterializedView, rootDir: String, sliceSeconds: Long): WindowedAggView = {
    requireEmissionShape(base.df)
    val v = new WindowedAggView(new SliceStore(base.spark, rootDir, sliceSeconds))
    val full = sliced(v, base.df)
      .groupBy("slice_start", "emit_key")
      .agg(count(lit(1)).as("cnt"),
        coalesce(sum(col("v").cast(DecimalType(18, 4))), lit(0))
          .cast(SumType).as("sum_value"),
        min("v").as("min_value"), max("v").as("max_value"))
      .persist()
    try {
      val present = full.select("slice_start").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      require(present.nonEmpty, "windowed build over an empty base view")
      v.store.stageAndPublish(full, present)
      v
    } finally full.unpersist()
  }

  /** Handle to an already-materialized windowed state (resume paths). The
    * caller must reopen with the slice width it was built with — widths
    * are layout, not config, so a mismatch is detected against the stored
    * slice boundaries rather than silently misreading them. */
  def attach(spark: SparkSession, rootDir: String, sliceSeconds: Long): WindowedAggView = {
    val v = new WindowedAggView(new SliceStore(spark, rootDir, sliceSeconds))
    v.store.requireAlignedSlices()
    v
  }
}
