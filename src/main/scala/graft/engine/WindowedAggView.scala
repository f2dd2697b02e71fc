package graft.engine

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType, StructType, TimestampType}

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
 *  - State is PARTITIONED BY TIME SLICE: one versioned sub-relation per
 *    slice (`s<epochSec>/v<N>` under this view's root, each a normal
 *    [[ViewStore]] view) holding `emit_key, cnt, sum_value, min_value,
 *    max_value` for emissions whose ts falls in `[start, start+slice)`.
 *  - A refresh folds the batch's ±1-weighted partials grouped by
 *    `(slice, group)` and rewrites ONLY touched slices — and all touched
 *    slices are staged in ONE Spark job (dynamic `partitionBy` on the
 *    slice column) then published by per-slice directory RENAME
 *    ([[ViewStore.adoptStaged]]): k touched slices cost one job plus k
 *    metadata moves. An upsert that MOVES an event across a slice
 *    boundary (the shared `%37` +1 h batch does) retracts from the old
 *    slice and lands in the new one.
 *  - `cnt`/`sum` merge retractably; `min`/`max` are recomputed from the
 *    post-refresh base, but only for touched `(slice, group)` pairs —
 *    one more scan of the base, semi-joined down to the delta's groups.
 *  - [[evictBefore]] advances the watermark and DROPS expired slice
 *    directories — O(expired slices) metadata work, zero bytes of
 *    surviving state rewritten (the spec pins surviving slice versions
 *    across an eviction). This is the file-level analog of partition-drop
 *    retention in a table format — the only retention shape that holds at
 *    100 TB (a delete-predicate rewrite of a year of state does not).
 *  - Late changes BELOW the watermark are REFUSED loudly: their old-slice
 *    retractions would target evicted state and silently double-count on
 *    replay. The error names the offending slices. The watermark is
 *    persisted BEFORE the drops, so a crash mid-eviction fails closed.
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
    val spark: SparkSession,
    val rootDir: String,
    val sliceSeconds: Long) extends Serializable {

  require(sliceSeconds > 0, s"sliceSeconds must be positive, got $sliceSeconds")

  /** Per-slice versioned storage: slice `s<epochSec>` is an ordinary
    * versioned view, so slice refreshes get the claim/swap/GC contract
    * and slice history gets the usual grace-version time travel. */
  private[engine] val slices = new ViewStore(spark, rootDir)

  private def sliceName(start: Long): String = s"s$start"
  private def watermarkFile: Path = Paths.get(rootDir, "_WATERMARK")

  /** Eviction horizon (epoch seconds): slices starting below it are gone
    * and changes below it are refused. `Long.MinValue` = never evicted. */
  def watermark: Long =
    if (Files.exists(watermarkFile)) Files.readString(watermarkFile).trim.toLong
    else Long.MinValue

  /** Live slice starts (epoch seconds), ascending. */
  def liveSlices: Seq[Long] = {
    val dir = Paths.get(rootDir)
    if (!Files.exists(dir)) Seq.empty
    else {
      val out = Seq.newBuilder[Long]
      val stream = Files.list(dir)
      try stream.iterator().forEachRemaining { p =>
        val n = p.getFileName.toString
        val digits = if (n.startsWith("s-")) n.drop(2) else n.drop(1)
        if (n.startsWith("s") && digits.nonEmpty && digits.forall(_.isDigit) &&
            Files.exists(p.resolve("_LATEST")))
          out += n.drop(1).toLong
      } finally stream.close()
      out.result().sorted
    }
  }

  /** One slice's state: `emit_key, cnt, sum_value, min_value, max_value`. */
  def sliceState(start: Long): DataFrame =
    spark.read.parquet(slices.latestPath(sliceName(start)))

  /** Full live state with its slice column (`slice_start` epoch seconds). */
  def state: DataFrame = {
    val live = liveSlices
    require(live.nonEmpty, s"windowed view at $rootDir has no live slices")
    live.map(s0 => sliceState(s0).withColumn("slice_start", lit(s0)))
      .reduce(_.unionByName(_))
  }

  /** Group-wise aggregate over the slice-ALIGNED window `[start, end)`
    * (epoch seconds). Merges the covered slices' partials — no event
    * rescan. Windows reaching below the watermark are refused: evicted
    * slices would silently under-count them. */
  def window(startSec: Long, endSec: Long): DataFrame = {
    require(startSec % sliceSeconds == 0 && endSec % sliceSeconds == 0,
      s"window [$startSec,$endSec) is not aligned to $sliceSeconds-second slices; " +
        "pre-aggregated slice state cannot answer sub-slice boundaries exactly")
    require(startSec < endSec, s"empty window [$startSec,$endSec)")
    require(startSec >= watermark,
      s"window start $startSec reaches below the eviction watermark ${watermark}; " +
        "those slices are gone and the result would silently under-count")
    val live = liveSlices
    require(live.nonEmpty, s"windowed view at $rootDir has no live slices")
    val in = live.filter(s0 => s0 >= startSec && s0 < endSec)
    val u =
      if (in.isEmpty) sliceState(live.head).filter(lit(false))
      else in.map(sliceState).reduce(_.unionByName(_))
    u.groupBy("emit_key")
      .agg(sum("cnt").as("cnt"),
        sum("sum_value").cast(WindowedAggView.SumType).as("sum_value"),
        min("min_value").as("min_value"), max("max_value").as("max_value"))
  }

  /** Trailing `n`-slice window ending at (and including) the newest live
    * slice — the "last 7 days as of now" serve. */
  def trailing(n: Int): DataFrame = {
    require(n > 0, s"trailing window must cover at least one slice, got $n")
    val live = liveSlices
    require(live.nonEmpty, s"windowed view at $rootDir has no live slices")
    val end = live.max + sliceSeconds
    window(math.max(end - n.toLong * sliceSeconds, watermark), end)
  }

  /**
   * Advance the watermark to `boundarySec` (slice-aligned, monotone) and
   * drop every slice strictly below it. Returns the evicted slice starts.
   * The watermark file is written FIRST so a crash between the write and
   * the drops fails CLOSED: late refreshes below the boundary are already
   * refused, and re-running evictBefore completes the drops.
   */
  def evictBefore(boundarySec: Long): Seq[Long] = {
    require(boundarySec % sliceSeconds == 0,
      s"eviction boundary $boundarySec is not aligned to $sliceSeconds-second slices")
    require(boundarySec >= watermark,
      s"watermark must advance monotonically: have ${watermark}, got $boundarySec")
    val expired = liveSlices.filter(_ < boundarySec)
    Files.createDirectories(Paths.get(rootDir))
    Files.writeString(watermarkFile, boundarySec.toString)
    expired.foreach(s0 => slices.dropView(sliceName(s0)))
    expired
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
      val wm = watermark
      val late = touched.filter(_ < wm)
      require(late.isEmpty,
        s"change batch touches evicted slices ${late.mkString(",")} below the " +
          s"watermark $wm — their retractions would target dropped state and " +
          "double-count on replay; route late data to a fresh build instead")
      val live = liveSlices.toSet
      // current state of the touched slices (a brand-new slice has none)
      val oldStates = touched.filter(live)
        .map(s0 => sliceState(s0).withColumn("slice_start", lit(s0)))
        .reduceOption(_.unionByName(_))
        .getOrElse(delta.select(col("slice_start"), col("emit_key"),
          lit(0L).as("cnt"),
          lit(null).cast(WindowedAggView.SumType).as("sum_value"),
          lit(null).cast("double").as("min_value"),
          lit(null).cast("double").as("max_value")).filter(lit(false)))
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
      stageAndPublish(updated, touched)
      (post, this)
    } finally delta.unpersist()
  }

  /** Stage every touched slice's new content in ONE Spark job (dynamic
    * `partitionBy` on the slice column), then publish each subdir by
    * rename under the per-slice version contract. A touched slice with no
    * staged subdir was EMPTIED by the batch — its directory is dropped,
    * the same way an all-groups-vanished flat state writes zero rows. */
  private def stageAndPublish(updated: DataFrame, touched: Seq[Long]): Unit = {
    Files.createDirectories(Paths.get(rootDir))
    val staging = Files.createTempDirectory(Paths.get(rootDir), "_staging-")
    try {
      val dataDir = staging.resolve("d")
      updated
        .repartitionByRange(col("slice_start"), col("emit_key"))
        .sortWithinPartitions("slice_start", "emit_key")
        .write.mode("overwrite").option("compression", "zstd")
        .partitionBy("slice_start").parquet(dataDir.toString)
      touched.foreach { s0 =>
        val sub = dataDir.resolve(s"slice_start=$s0")
        if (Files.exists(sub)) slices.adoptStaged(sliceName(s0), sub)
        else slices.dropView(sliceName(s0))
      }
    } finally slices.deleteTree(staging)
  }
}

object WindowedAggView {
  /** Same exact-merge DECIMAL contract as [[AggView.SumType]]. */
  private[engine] val SumType = DecimalType(28, 4)

  /** Slice start (epoch seconds) of an emission timestamp. Integer floor
    * over truncated seconds equals floor over fractional seconds for the
    * non-negative epochs this engine stores, so the DuckDB oracle's
    * `floor(epoch(ts)/w)*w` lands on the same boundary. */
  private def sliceOf(v: WindowedAggView, ts: org.apache.spark.sql.Column) =
    (floor(unix_seconds(ts) / v.sliceSeconds).cast("long") * v.sliceSeconds)

  private[engine] def sliced(v: WindowedAggView, emissions: DataFrame): DataFrame =
    emissions.select(
      sliceOf(v, col("emit_value.ts")).as("slice_start"),
      col("emit_key"),
      col("emit_value.v").as("v"))

  private[engine] def partials(
      v: WindowedAggView, emissions: DataFrame, negate: Boolean): DataFrame = {
    val x = col("emit_value.v").cast(DecimalType(18, 4))
    emissions.select(
      sliceOf(v, col("emit_value.ts")).as("slice_start"),
      col("emit_key"),
      lit(if (negate) -1L else 1L).as("d_cnt"),
      (if (negate) -x else x).as("d_sum"))
  }

  /** Fail at build time, not mid-maintenance: the windowed family needs
    * `emit_value = struct(ts: timestamp, v: numeric)`. */
  private[engine] def requireEmissionShape(emissions: DataFrame): Unit =
    emissions.schema("emit_value").dataType match {
      case s: StructType
        if s.fieldNames.contains("ts") && s.fieldNames.contains("v") &&
           s("ts").dataType == TimestampType &&
           s("v").dataType.isInstanceOf[NumericType] => ()
      case other => throw new IllegalArgumentException(
        "WindowedAggView requires emit_value = struct(ts: timestamp, v: numeric), " +
          s"got $other")
    }

  /** Full build from the base view's current snapshot: one aggregate job,
    * one staged write, k slice publishes. */
  def build(base: MaterializedView, rootDir: String, sliceSeconds: Long): WindowedAggView = {
    requireEmissionShape(base.df)
    val v = new WindowedAggView(base.spark, rootDir, sliceSeconds)
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
      v.stageAndPublish(full, present)
      v
    } finally full.unpersist()
  }

  /** Handle to an already-materialized windowed state (resume paths). The
    * caller must reopen with the slice width it was built with — widths
    * are layout, not config, so a mismatch is detected against the stored
    * slice boundaries rather than silently misreading them. */
  def attach(spark: SparkSession, rootDir: String, sliceSeconds: Long): WindowedAggView = {
    val v = new WindowedAggView(spark, rootDir, sliceSeconds)
    val off = v.liveSlices.filter(_ % sliceSeconds != 0)
    require(off.isEmpty,
      s"stored slices ${off.take(3).mkString(",")}… are not aligned to " +
        s"$sliceSeconds-second slices — this view was built with a different width")
    v
  }
}
