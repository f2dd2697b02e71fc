package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.BucketedViewStore.RefreshStats

/** Maintained per-group QUANTILE SKETCHES over a bucketed map view —
  * the unknown-domain companion to the engine's exact refcount quantile
  * states: the discrete state needs a small vocabulary, the grid state a
  * caller-chosen width; the [[graft.functions.QuantileSketch]] compactor
  * stack needs neither, at a deterministic worst-case rank error
  * (≈ log2(n/k)/k — under 2.5 % of n at the default k for a billion
  * rows per group).
  *
  * State: one row per group holding the serialized sketch — size
  * independent of the corpus and of the value range, stored as its own
  * map view in the same bucketed store (CDC, time travel, compaction
  * apply to the sketch state itself).
  *
  * Maintenance splits the change batch by what a compacting sketch CAN
  * absorb (the published mergeability/deletion asymmetry):
  *  - groups whose batch is INSERT-ONLY fold O(delta): the batch's rows
  *    sketch locally and merge into the stored sketch (`qsketch_merge`
  *    — merge order never affects the error bound);
  *  - groups the batch RETRACTS FROM (tombstones, or upserts replacing
  *    old rows) REBUILD from the post-refresh base view — a compaction
  *    cannot retract what it already discarded, so the documented rule
  *    is rebuild-on-delete, bucket-pruned to ONLY the affected groups'
  *    base buckets ([[BucketedViewStore.getAll]]), never a corpus scan.
  *
  * The dirty-group split comes from the base view's OWN refresh sidecar
  * (deletes carry their emit key), the same O(delta) source every other
  * maintained consumer reads.
  */
final class SketchQuantileView(
    val store: BucketedViewStore,
    base: MapIndex,
    val stateName: String,
    k: Int = graft.functions.QuantileSketch.DefaultK) {

  graft.functions.QuantileSketch.register(store.spark)

  private def stateIdx = MapIndex.columns(stateName)(
    col("emit_key").cast("string"),
    array(MapIndex.emit(col("emit_key"), struct(col("sketch")))))

  /** Per-group sketch of an (emit_key, emit_value) relation. */
  private def sketchOf(rows: DataFrame): DataFrame =
    rows.groupBy(col("emit_key"))
      .agg(expr(s"qsketch(CAST(emit_value AS DOUBLE), $k)").as("sketch"))

  /** Materialize base + state from a source batch (epoch 0). */
  def build(source: DataFrame): Unit = {
    store.materialize(base, source)
    store.materialize(stateIdx,
      sketchOf(store.df(base.name).select("emit_key", "emit_value")))
  }

  /** One joint base + state refresh (upserts + tombstoned source keys —
    * the ordinary store contract). Returns the STATE view's stats. */
  def refresh(ups: DataFrame, dels: Option[DataFrame]): RefreshStats = {
    store.refresh(base, ups, dels)
    val e = store.epoch(base.name)
    val feed = store.changesBetween(base.name, e - 1, e).persist()
    val delGroups = feed.filter(col("change_type") === "delete")
      .select("emit_key").distinct()
    val insGroups = feed.filter(col("change_type") === "insert")
      .select("emit_key").distinct()
    // retraction-touched groups: rebuild from the post-refresh base,
    // bucket-pruned to exactly those groups
    val rebuilt = sketchOf(store.getAll(base.name, delGroups)
      .select("emit_key", "emit_value"))
    // insert-only groups: stored sketch ⊕ batch sketch, O(delta)
    val mergeGroups = insGroups.join(delGroups, Seq("emit_key"), "left_anti")
    val batchSketch = sketchOf(feed.filter(col("change_type") === "insert")
      .join(mergeGroups, Seq("emit_key"), "left_semi")
      .select("emit_key", "emit_value"))
    val oldSketch = store.getAll(stateName, mergeGroups)
      .select(col("emit_key"), col("emit_value.sketch").as("sketch"))
    val merged = oldSketch.unionByName(batchSketch)
      .groupBy("emit_key")
      .agg(expr("qsketch_merge(sketch)").as("sketch"))
    // groups whose every row retracted vanish (explicit tombstone: they
    // re-emit nothing through ownership delete-then-insert)
    val vanished = delGroups
      .join(rebuilt.select("emit_key"), Seq("emit_key"), "left_anti")
      .select(col("emit_key").cast("string").as("src_key"))
    val stats = store.refresh(stateIdx,
      rebuilt.unionByName(merged), Some(vanished))
    feed.unpersist()
    stats
  }

  /** Current state: `emit_key (group), sketch (binary)`. */
  def state: DataFrame =
    store.df(stateName)
      .select(col("emit_key"), col("emit_value.sketch").as("sketch"))

  /** The state plus one merged TOTAL row (`emit_key = totalKey`) — the
    * rollup a mergeable sketch exists for: the global distribution is
    * |groups| sketch merges over the state rows alone (each ≤ a few
    * hundred KB), NEVER a corpus re-read — at 100 TB the (group, ALL)
    * quantile surface costs the same as serving the state. The merge
    * order cannot move an estimate outside the deterministic rank bound
    * (the compactor-stack mergeability contract), so the rollup row
    * carries the same ≈log2(n/k)/k guarantee as the per-group rows. */
  def stateRollup(totalKey: String = "ALL"): DataFrame = {
    val per = state
    val total = per
      .agg(expr("qsketch_merge(sketch)").as("sketch"))
      .select(lit(totalKey).as("emit_key"), col("sketch"))
    per.unionByName(total)
  }

  /** Served quantiles: one row per group with the exact folded count
    * and the sketch estimate per requested percentile. */
  def quantiles(ps: Seq[(String, Double)]): DataFrame =
    quantilesOf(state, ps)

  /** [[quantiles]] over the per-group state PLUS the merged-total row —
    * both lattice levels served from one state, no base read. */
  def quantilesRollup(ps: Seq[(String, Double)],
      totalKey: String = "ALL"): DataFrame =
    quantilesOf(stateRollup(totalKey), ps)

  private def quantilesOf(s: DataFrame, ps: Seq[(String, Double)]): DataFrame =
    s.select(
      Seq(col("emit_key"), expr("qsketch_n(sketch)").as("n")) ++
        ps.map { case (nm, p) => expr(s"qsketch_quantile(sketch, $p)").as(nm) }: _*)

  def epoch: Int = store.epoch(stateName)
}
