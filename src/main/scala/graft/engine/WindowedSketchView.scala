package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Shared core of the time-sliced MERGEABLE-STATE families: one serialized
 * mergeable summary (quantile sketch, KMV distinct state, …) per
 * `(slice, group)` on the [[SliceStore]] layout, so ANY slice-aligned
 * window is a state MERGE across its slices — the corpus is never
 * re-read, and associativity makes the same per-slice state answer "last
 * day", "last week", and "last quarter". Merging pre-aggregated time
 * partials is the textbook reason mergeable summaries exist; holding
 * them per-slice adds the retention story (watermark eviction drops
 * expired slices wholesale) and the aging story ([[coarsen]] merges aged
 * members into wider tiers with zero corpus reads).
 *
 * Maintenance per refresh, from the same change batch:
 *  - `(slice, group)` pairs touched by a RETRACTION (an upserted or
 *    deleted source key's old emission) REBUILD their state from the
 *    post-refresh base — compacting/trimming summaries are not
 *    retractable; the rebuild scan is semi-joined down to the dirty
 *    pairs (the compaction/deletion asymmetry [[SketchQuantileView]]
 *    documents).
 *  - insert-only pairs fold the batch's fresh summary into the stored
 *    one via the merge aggregate — O(delta), no base read.
 * Both classes of updated pairs land in the same ONE staged write job
 * ([[SliceStore.stageAndPublish]]).
 *
 * Concrete members supply the SQL spellings of the build and merge
 * aggregates over the conventional columns (`v` → `sketch`); emission
 * contract: `emit_key` = group, `emit_value = struct(ts, v)` —
 * the [[WindowedAggView.requireEmissionShape]] check.
 */
sealed abstract class WindowedMergeableView private[engine] (
    private[engine] val store: SliceStore) extends Serializable {

  /** SQL aggregate expression folding the named column into a fresh
    * state (the k parameter is the concrete view's business). */
  protected def buildAgg(valueCol: String): String
  /** SQL aggregate merging column `sketch` states. */
  protected def mergeAggSql: String

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

  /** Heal crash-leftover member slices shadowed by a coarse slice. */
  def dropShadowed(): Seq[Long] = store.dropShadowed()

  /** ROLLUP AGING: members' states MERGE into the coarse slice
    * (associative, no corpus read), the range freezes, and aged history
    * serves at the coarse width. Same grid/shadow/heal contract as the
    * agg family ([[SliceStore.publishCoarsened]]). */
  def coarsen(boundarySec: Long, toWidth: Long): Seq[Long] = {
    val groups = store.coarsenGroups(boundarySec, toWidth)
    if (groups.isEmpty) return Seq.empty
    // every member in ONE scan, bucketed to its coarse start in-plan
    val toCoarse = map(groups.flatMap { case (cs, ms) =>
      ms.flatMap(m => Seq(lit(m), lit(cs))) }: _*)
    val merged = store.readSlices(groups.flatMap(_._2))
      .withColumn("slice_start", element_at(toCoarse, col("slice_start")))
      .groupBy("slice_start", "emit_key")
      .agg(expr(s"$mergeAggSql(sketch)").as("sketch"))
    store.publishCoarsened(merged, groups, toWidth, boundarySec)
    groups.map(_._1)
  }

  /** One merged state per group over the slice-ALIGNED window
    * `[start, end)` — |covered slices| merges per group, zero base reads. */
  def windowSketches(startSec: Long, endSec: Long): DataFrame =
    store.windowStates(startSec, endSec)
      .groupBy("emit_key")
      .agg(expr(s"$mergeAggSql(sketch)").as("sketch"))

  /**
   * Refresh the base view AND the sliced state from one change batch.
   * Dirty pairs (any retraction) rebuild from the post-refresh base;
   * insert-only pairs merge O(delta); untouched pairs of touched slices
   * are carried through the staged rewrite unchanged.
   */
  def refresh(
      base: MaterializedView,
      upserts: DataFrame,
      deleteKeys: Option[DataFrame] = None): (MaterializedView, this.type) = {
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
    // the batch's new values, pre-summarized per (slice, group)
    val newSk = slicedOf(base.index.emissions(upserts))
      .groupBy("slice_start", "emit_key")
      .agg(expr(buildAgg("v")).as("sketch"))
      .persist()
    try {
      val touched = dirty.select("slice_start")
        .union(newSk.select("slice_start")).distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      if (touched.isEmpty) return (post, this)
      store.requireRefreshable(touched)
      val live = liveSlices.toSet
      val touchedLive = touched.filter(live)
      val oldStates =
        if (touchedLive.nonEmpty) store.readSlices(touchedLive)
          .select(col("slice_start"), col("emit_key"), col("sketch"))
        else newSk.filter(lit(false))
          .select(col("slice_start"), col("emit_key"), col("sketch"))
      // rebuild path: dirty pairs re-summarized from the refreshed base
      val rebuilt = slicedOf(postDf)
        .join(broadcast(dirty), Seq("slice_start", "emit_key"), "left_semi")
        .groupBy("slice_start", "emit_key")
        .agg(expr(buildAgg("v")).as("sketch"))
      // merge path: stored states of non-dirty pairs + the batch's new
      // states of non-dirty pairs, folded associatively per pair (a pair
      // present in only one side passes through the merge unchanged)
      val keepOld = oldStates
        .join(broadcast(dirty), Seq("slice_start", "emit_key"), "left_anti")
      val addNew = newSk
        .join(broadcast(dirty), Seq("slice_start", "emit_key"), "left_anti")
      val merged = keepOld.unionByName(addNew)
        .groupBy("slice_start", "emit_key")
        .agg(expr(s"$mergeAggSql(sketch)").as("sketch"))
      store.stageAndPublish(merged.unionByName(rebuilt), touched)
      (post, this)
    } finally { dirty.unpersist(); newSk.unpersist() }
  }

  /** Shared full-build body: one summarize job over the base, one staged
    * write, k slice publishes. */
  protected def buildFrom(base: MaterializedView): this.type = {
    WindowedAggView.requireEmissionShape(base.df)
    val full = base.df.select(
        WindowedAggView.sliceOf(sliceSeconds, col("emit_value.ts")).as("slice_start"),
        col("emit_key"),
        col("emit_value.v").cast("double").as("v"))
      .groupBy("slice_start", "emit_key")
      .agg(expr(buildAgg("v")).as("sketch"))
      .persist()
    try {
      val present = full.select("slice_start").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      require(present.nonEmpty, "windowed mergeable build over an empty base view")
      store.stageAndPublish(full, present)
      this
    } finally full.unpersist()
  }
}

/**
 * Time-sliced maintained QUANTILE SKETCHES — the windowed twin of
 * [[SketchQuantileView]]: per-(slice, group)
 * [[graft.functions.QuantileSketch]] states, windows decoded to
 * quantiles after the slice merge. See [[WindowedMergeableView]] for the
 * maintenance/eviction/aging contract.
 */
final class WindowedSketchView private[engine] (
    store: SliceStore,
    val k: Int) extends WindowedMergeableView(store) {

  graft.functions.QuantileSketch.register(store.spark)

  override protected def buildAgg(c: String): String = s"qsketch($c, $k)"
  override protected def mergeAggSql: String = "qsketch_merge"

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
}

object WindowedSketchView {
  def build(base: MaterializedView, rootDir: String, sliceSeconds: Long,
      k: Int = graft.functions.QuantileSketch.DefaultK): WindowedSketchView = {
    val v = new WindowedSketchView(
      new SliceStore(base.spark, rootDir, sliceSeconds), k)
    v.buildFrom(base)
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

/**
 * Time-sliced maintained DISTINCT COUNTS via KMV states
 * ([[graft.functions.KmvSketch]]) — distinct is the canonical
 * NON-ADDITIVE aggregate (per-day exact distinct counts cannot sum into
 * "distinct users last 7 days"), so the windowed serve exists ONLY
 * because the per-slice state is a mergeable summary: the window merge
 * unions hash sets, exact below k and ~1/sqrt(k-2) relative error past
 * it. See [[WindowedMergeableView]] for the maintenance/eviction/aging
 * contract.
 */
final class WindowedDistinctView private[engine] (
    store: SliceStore,
    val k: Int) extends WindowedMergeableView(store) {

  graft.functions.KmvSketch.register(store.spark)

  override protected def buildAgg(c: String): String = s"kmv_sketch($c, $k)"
  override protected def mergeAggSql: String = "kmv_merge"

  /** Decoded serve over the window: the distinct estimate per group plus
    * the exact-regime flag (`kmv_full` false ⇒ the estimate IS exact). */
  def distinct(startSec: Long, endSec: Long): DataFrame =
    windowSketches(startSec, endSec).select(
      col("emit_key"),
      expr("kmv_estimate(sketch)").as("distinct_est"),
      expr("kmv_full(sketch)").as("estimated"))

  /** Trailing `n`-slice distinct serve ending at the newest live slice. */
  def trailingDistinct(n: Int): DataFrame = {
    val (s0, e0) = store.trailingBounds(n)
    distinct(s0, e0)
  }
}

/**
 * Time-sliced maintained FREQUENT ITEMS via Misra-Gries states
 * ([[graft.functions.MgSketch]]) — the third member of the mergeable
 * trio (quantiles, distinct, frequent items). The MG guarantee COMPOSES
 * across the slice merge: every item with window frequency > n/(k+1)
 * survives the merged candidates regardless of slice layout or merge
 * order, so "top value-buckets last 7 days" serves from per-day states
 * with no event rescan. Candidates are a SUPERSET: final answers come
 * from the candidates-then-exact-verify pattern the one-shot
 * `heavy_hitters` gates established. See [[WindowedMergeableView]] for
 * the maintenance/eviction/aging contract.
 */
final class WindowedTopFreqView private[engine] (
    store: SliceStore,
    val k: Int) extends WindowedMergeableView(store) {

  graft.functions.MgSketch.register(store.spark)

  override protected def buildAgg(c: String): String = s"mg_sketch($c, $k)"
  override protected def mergeAggSql: String = "mg_merge"

  /** Candidate items per group over the window, one row per candidate,
    * with the exact window fold count `n` (survivors are guaranteed to
    * include every item with frequency > n/(k+1)). */
  def candidates(startSec: Long, endSec: Long): DataFrame =
    windowSketches(startSec, endSec).select(
      col("emit_key"),
      expr("mg_n(sketch)").as("n"),
      explode(expr("mg_items(sketch)")).as("item"))

  /** Trailing `n`-slice candidate serve ending at the newest live slice. */
  def trailingCandidates(slices: Int): DataFrame = {
    val (s0, e0) = store.trailingBounds(slices)
    candidates(s0, e0)
  }
}

object WindowedTopFreqView {
  def build(base: MaterializedView, rootDir: String, sliceSeconds: Long,
      k: Int = graft.functions.MgSketch.DefaultK): WindowedTopFreqView = {
    val v = new WindowedTopFreqView(
      new SliceStore(base.spark, rootDir, sliceSeconds), k)
    v.buildFrom(base)
  }

  def attach(spark: SparkSession, rootDir: String, sliceSeconds: Long,
      k: Int = graft.functions.MgSketch.DefaultK): WindowedTopFreqView = {
    val v = new WindowedTopFreqView(new SliceStore(spark, rootDir, sliceSeconds), k)
    v.store.requireAlignedSlices()
    v
  }
}

object WindowedDistinctView {
  def build(base: MaterializedView, rootDir: String, sliceSeconds: Long,
      k: Int = graft.functions.KmvSketch.DefaultK): WindowedDistinctView = {
    val v = new WindowedDistinctView(
      new SliceStore(base.spark, rootDir, sliceSeconds), k)
    v.buildFrom(base)
  }

  def attach(spark: SparkSession, rootDir: String, sliceSeconds: Long,
      k: Int = graft.functions.KmvSketch.DefaultK): WindowedDistinctView = {
    val v = new WindowedDistinctView(new SliceStore(spark, rootDir, sliceSeconds), k)
    v.store.requireAlignedSlices()
    v
  }
}
