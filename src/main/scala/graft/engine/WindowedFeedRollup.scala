package graft.engine

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Feed-driven windowed rollup — the WINDOWED × JOIN-IVM composition: a
 * time-sliced `(cnt, vcnt, sum)` state maintained PURELY from a
 * maintained relation's CDC feed ([[JoinView.changes]] et al.), never
 * reading the relation itself. The feed's delete rows carry the FULL old
 * values (the delete-then-insert contract every store sidecar keeps), so
 * retraction needs no pre-refresh snapshot scan at all: a fold is
 * O(feed), grouped by `(slice, group)`, touching only those slices —
 * strictly cheaper than the base-view-coupled [[WindowedAggView]]
 * refresh, at the price of the non-retractable aggregates (min/max need
 * a base to rebuild from; this family deliberately carries only the
 * retractable ones, plus the non-null value count `vcnt` so an all-NULL
 * group's sum serves as SQL NULL — the [[JoinAggView]] rule).
 *
 * Idempotence: the consumed-epoch marker (`_FEED_EPOCH`) refuses
 * re-applying a feed range already folded. Unlike [[JoinAggView]]'s
 * in-state watermark sentinel, the marker is NOT crash-atomic with the
 * multi-slice publish (slices swap independently); a crash between the
 * last slice publish and the marker write leaves a half-applied fold
 * that a re-apply would double-count — rebuild from the upstream
 * snapshot in that case. The single-relation design with the
 * crash-consistent sentinel remains [[JoinAggView]]; this class trades
 * that for slice-partitioned retention.
 */
final class WindowedFeedRollup private[engine] (
    private[engine] val store: SliceStore) extends Serializable {

  def spark: SparkSession = store.spark
  def sliceSeconds: Long = store.sliceSeconds
  def liveSlices: Seq[Long] = store.liveSlices
  def evictBefore(boundarySec: Long): Seq[Long] = store.evictBefore(boundarySec)

  private def markerFile = Paths.get(store.rootDir, "_FEED_EPOCH")

  /** Highest upstream epoch folded into this state. */
  def consumedEpoch: Int =
    if (Files.exists(markerFile)) Files.readString(markerFile).trim.toInt
    else Int.MinValue

  /** Full live state: `slice_start, slice_w, emit_key, cnt, vcnt,
    * sum_value` (sum NULL when the group's non-null value count is 0). */
  def state: DataFrame =
    store.state.select(col("slice_start"), col("slice_w"), col("emit_key"),
      col("cnt"), col("vcnt"),
      when(col("vcnt") > 0, col("sum_value")).as("sum_value"))

  /** Group-wise rollup over the slice-ALIGNED window `[start, end)`. */
  def window(startSec: Long, endSec: Long): DataFrame =
    store.windowStates(startSec, endSec)
      .groupBy("emit_key")
      .agg(sum("cnt").as("cnt"), sum("vcnt").as("vcnt"),
        sum("sum_value").cast(WindowedAggView.SumType).as("_s"))
      .select(col("emit_key"), col("cnt"), col("vcnt"),
        when(col("vcnt") > 0, col("_s")).as("sum_value"))

  /**
   * Fold one CDC feed range (rows tagged `change_type` ∈ {insert,
   * delete}) up to upstream epoch `toEpoch`. `tsCol`/`groupCol`/
   * `valueCol` address the feed's payload (e.g.
   * `col("emit_value.o_orderdate")`). Touches only the slices the feed
   * reaches; refuses ranges at or below the consumed epoch and slices
   * below the watermark/frozen horizons.
   */
  def applyChanges(feed: DataFrame, toEpoch: Int,
      tsCol: Column, groupCol: Column, valueCol: Column): WindowedFeedRollup = {
    require(toEpoch > consumedEpoch,
      s"feed range up to epoch $toEpoch already folded (consumed=$consumedEpoch) " +
        "— re-applying a delta double-counts; fold only fresh ranges")
    val w = when(col("change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val v = valueCol.cast(org.apache.spark.sql.types.DecimalType(18, 4))
    val delta = feed.select(
        WindowedAggView.sliceOf(sliceSeconds, tsCol).as("slice_start"),
        groupCol.as("emit_key"), w.as("w"), v.as("v"))
      .groupBy("slice_start", "emit_key")
      .agg(sum("w").as("d_cnt"),
        sum(when(col("v").isNotNull, col("w")).otherwise(0L)).as("d_vcnt"),
        sum(coalesce(col("v"), lit(0)) * col("w"))
          .cast(WindowedAggView.SumType).as("d_sum"))
      .persist()
    try {
      val touched = delta.select("slice_start").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      if (touched.isEmpty) { Files.writeString(markerFile, toEpoch.toString); return this }
      store.requireRefreshable(touched)
      val live = liveSlices.toSet
      val zero = lit(0).cast(WindowedAggView.SumType)
      val touchedLive = touched.filter(live)
      val oldStates =
        if (touchedLive.nonEmpty) store.readSlices(touchedLive)
        else delta.select(col("slice_start"), col("emit_key"),
          lit(0L).as("cnt"), lit(0L).as("vcnt"), zero.as("sum_value"))
          .filter(lit(false))
      val updated = oldStates
        .join(delta, Seq("slice_start", "emit_key"), "full_outer")
        .select(col("slice_start"), col("emit_key"),
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
          (coalesce(col("vcnt"), lit(0L)) + coalesce(col("d_vcnt"), lit(0L))).as("vcnt"),
          (coalesce(col("sum_value"), zero) + coalesce(col("d_sum"), zero))
            .cast(WindowedAggView.SumType).as("sum_value"))
        .filter(col("cnt") > 0)
      store.stageAndPublish(updated, touched)
      Files.writeString(markerFile, toEpoch.toString)
      this
    } finally delta.unpersist()
  }
}

object WindowedFeedRollup {
  /** Build from the upstream's CURRENT snapshot, stamping its epoch —
    * subsequent folds consume `changes(epoch, later]`. */
  def build(snapshot: DataFrame, tsCol: Column, groupCol: Column, valueCol: Column,
      spark: SparkSession, rootDir: String, sliceSeconds: Long,
      upstreamEpoch: Int): WindowedFeedRollup = {
    val v = new WindowedFeedRollup(new SliceStore(spark, rootDir, sliceSeconds))
    val x = valueCol.cast(org.apache.spark.sql.types.DecimalType(18, 4))
    val full = snapshot.select(
        WindowedAggView.sliceOf(sliceSeconds, tsCol).as("slice_start"),
        groupCol.as("emit_key"), x.as("v"))
      .groupBy("slice_start", "emit_key")
      .agg(count(lit(1)).as("cnt"), count(col("v")).as("vcnt"),
        coalesce(sum(col("v")), lit(0))
          .cast(WindowedAggView.SumType).as("sum_value"))
      .persist()
    try {
      val present = full.select("slice_start").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      require(present.nonEmpty, "feed rollup build over an empty snapshot")
      v.store.stageAndPublish(full, present)
      Files.writeString(Paths.get(rootDir, "_FEED_EPOCH"), upstreamEpoch.toString)
      v
    } finally full.unpersist()
  }

  def attach(spark: SparkSession, rootDir: String, sliceSeconds: Long): WindowedFeedRollup = {
    val v = new WindowedFeedRollup(new SliceStore(spark, rootDir, sliceSeconds))
    v.store.requireAlignedSlices()
    v
  }
}
