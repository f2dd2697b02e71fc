package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Time-sliced maintained QUANTILE SKETCHES with watermark eviction — the
 * windowed twin of [[SketchQuantileView]] on the [[WindowedAggView]]
 * slice layout: one mergeable sketch ([[graft.functions.QuantileSketch]])
 * per `(slice, group)`, so ANY slice-aligned window's quantiles are a
 * sketch MERGE across its slices — the corpus is never re-read, and the
 * merge is associative, so the same per-slice state answers "p95 last
 * day", "p95 last week", and "p95 last quarter". Merging pre-aggregated
 * time partials is the textbook reason mergeable sketches exist; holding
 * them per-slice adds the retention story: [[evictBefore]] drops expired
 * slice directories wholesale, exactly like the agg family.
 *
 * Maintenance per refresh, from the same change batch:
 *  - `(slice, group)` pairs touched by a RETRACTION (an upserted or
 *    deleted source key's old emission) REBUILD their sketch from the
 *    post-refresh base — sketches are not retractable; the rebuild scan
 *    is semi-joined down to the dirty pairs (the same compaction/deletion
 *    asymmetry [[SketchQuantileView]] documents).
 *  - insert-only pairs fold the batch's new values into the stored
 *    sketch via `qsketch_merge` — O(delta), no base read.
 * Both classes of updated pairs land in the same ONE staged write job
 * ([[SliceStore.stageAndPublish]]).
 *
 * Emission contract: `emit_key` = group, `emit_value = struct(ts, v)` —
 * the [[WindowedAggView.requireEmissionShape]] check.
 */
final class WindowedSketchView private[engine] (
    private[engine] val store: SliceStore,
    val k: Int) extends Serializable {

  graft.functions.QuantileSketch.register(store.spark)

  def spark: SparkSession = store.spark
  def sliceSeconds: Long = store.sliceSeconds
  def watermark: Long = store.watermark
  def liveSlices: Seq[Long] = store.liveSlices
  /** Serving layout: live `(start, width)` pairs, shadowed members
    * excluded ([[SliceStore.effectiveSliceWidths]]). */
  def effectiveSlices: Seq[(Long, Long)] = store.effectiveSliceWidths

  /** Per-slice state: `emit_key, sketch: binary`. */
  def sliceState(start: Long): DataFrame = store.sliceState(start)

  def evictBefore(boundarySec: Long): Seq[Long] = store.evictBefore(boundarySec)

  /** ROLLUP AGING for sketches: members' sketches MERGE into the coarse
    * slice (associative, no corpus read — mergeability again), the range
    * freezes, and aged quantile history serves at the coarse width. Same
    * grid/shadow/heal contract as the agg family
    * ([[SliceStore.publishCoarsened]]). */
  def coarsen(boundarySec: Long, toWidth: Long): Seq[Long] = {
    val groups = store.coarsenGroups(boundarySec, toWidth)
    if (groups.isEmpty) return Seq.empty
    val merged = groups.map { case (cs, members) =>
      members.map(sliceState).reduce(_.unionByName(_))
        .groupBy("emit_key")
        .agg(expr("qsketch_merge(sketch)").as("sketch"))
        .withColumn("slice_start", lit(cs))
    }.reduce(_.unionByName(_))
    store.publishCoarsened(merged, groups, toWidth, boundarySec)
    groups.map(_._1)
  }

  /** One merged sketch per group over the slice-ALIGNED window
    * `[start, end)` — |covered slices| merges per group, zero base reads. */
  def windowSketches(startSec: Long, endSec: Long): DataFrame =
    store.windowStates(startSec, endSec)
      .groupBy("emit_key")
      .agg(expr("qsketch_merge(sketch)").as("sketch"))

  /** Decoded serve over the window: exact fold count `n` plus the
    * requested quantile estimates, one column per `(name, p)`. */
  def quantiles(startSec: Long, endSec: Long, ps: Seq[(String, Double)]): DataFrame =
    windowSketches(startSec, endSec).select(
      Seq(col("emit_key"), expr("qsketch_n(sketch)").as("n")) ++
        ps.map { case (nm, p) => expr(s"qsketch_quantile(sketch, $p)").as(nm) }: _*)

  /** Trailing `n`-slice quantile serve ending at the newest live slice. */
  def trailingQuantiles(n: Int, ps: Seq[(String, Double)]): DataFrame = {
    val (s0, e0) = store.trailingBounds(n)
    quantiles(s0, e0, ps)
  }

  /**
   * Refresh the base view AND the sliced sketch state from one change
   * batch. Dirty pairs (any retraction) rebuild from the post-refresh
   * base; insert-only pairs merge O(delta); untouched pairs of touched
   * slices are carried through the staged rewrite unchanged.
   */
  def refresh(
      base: MaterializedView,
      upserts: DataFrame,
      deleteKeys: Option[DataFrame] = None): (MaterializedView, WindowedSketchView) = {
    WindowedAggView.requireEmissionShape(base.df)
    val preDf = base.df
    val post = base.refresh(upserts, deleteKeys)
    val postDf = post.df
    val upsertKeys = base.index.touchedKeys(upserts)
    val changed = deleteKeys match {
      case Some(d) => upsertKeys.union(d.toDF("src_key")).distinct()
      case None    => upsertKeys
    }
    val w = store.sliceSeconds
    def slicedOf(emis: DataFrame): DataFrame = emis.select(
      WindowedAggView.sliceOf(w, col("emit_value.ts")).as("slice_start"),
      col("emit_key"),
      col("emit_value.v").cast("double").as("v"))
    // dirty pairs: any (slice, group) holding a retracted old emission
    val dirty = slicedOf(preDf.join(broadcast(changed), Seq("src_key"), "left_semi"))
      .select("slice_start", "emit_key").distinct().persist()
    // the batch's new values, pre-sketched per (slice, group)
    val newSk = slicedOf(base.index.emissions(upserts))
      .groupBy("slice_start", "emit_key")
      .agg(expr(s"qsketch(v, $k)").as("sketch"))
      .persist()
    try {
      val touched = dirty.select("slice_start")
        .union(newSk.select("slice_start")).distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      if (touched.isEmpty) return (post, this)
      store.requireRefreshable(touched)
      val live = liveSlices.toSet
      val oldStates = touched.filter(live)
        .map(s0 => sliceState(s0).withColumn("slice_start", lit(s0)))
        .reduceOption(_.unionByName(_))
        .getOrElse(newSk.filter(lit(false))
          .select(col("slice_start"), col("emit_key"), col("sketch")))
      // rebuild path: dirty pairs re-sketched from the refreshed base
      val rebuilt = slicedOf(postDf)
        .join(broadcast(dirty), Seq("slice_start", "emit_key"), "left_semi")
        .groupBy("slice_start", "emit_key")
        .agg(expr(s"qsketch(v, $k)").as("sketch"))
      // merge path: stored sketches of non-dirty pairs + the batch's new
      // sketches of non-dirty pairs, folded associatively per pair (a
      // pair present in only one side passes through the merge unchanged)
      val keepOld = oldStates
        .join(broadcast(dirty), Seq("slice_start", "emit_key"), "left_anti")
      val addNew = newSk
        .join(broadcast(dirty), Seq("slice_start", "emit_key"), "left_anti")
      val merged = keepOld.unionByName(addNew)
        .groupBy("slice_start", "emit_key")
        .agg(expr("qsketch_merge(sketch)").as("sketch"))
      store.stageAndPublish(merged.unionByName(rebuilt), touched)
      (post, this)
    } finally { dirty.unpersist(); newSk.unpersist() }
  }
}

object WindowedSketchView {
  /** Full build: one sketch-aggregate job over the base, one staged
    * write, k slice publishes. */
  def build(base: MaterializedView, rootDir: String, sliceSeconds: Long,
      k: Int = graft.functions.QuantileSketch.DefaultK): WindowedSketchView = {
    WindowedAggView.requireEmissionShape(base.df)
    val v = new WindowedSketchView(
      new SliceStore(base.spark, rootDir, sliceSeconds), k)
    val full = base.df.select(
        WindowedAggView.sliceOf(sliceSeconds, col("emit_value.ts")).as("slice_start"),
        col("emit_key"),
        col("emit_value.v").cast("double").as("v"))
      .groupBy("slice_start", "emit_key")
      .agg(expr(s"qsketch(v, $k)").as("sketch"))
      .persist()
    try {
      val present = full.select("slice_start").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      require(present.nonEmpty, "windowed sketch build over an empty base view")
      v.store.stageAndPublish(full, present)
      v
    } finally full.unpersist()
  }

  /** Reopen handle; width and k must match the build (k mismatches fail
    * loudly at the first merge — sketches carry their k). */
  def attach(spark: SparkSession, rootDir: String, sliceSeconds: Long,
      k: Int = graft.functions.QuantileSketch.DefaultK): WindowedSketchView = {
    val v = new WindowedSketchView(new SliceStore(spark, rootDir, sliceSeconds), k)
    v.store.requireAlignedSlices()
    v
  }
}
