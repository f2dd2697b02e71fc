package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.BucketedViewStore.RefreshStats

/** A maintained GROUP-BY rollup OVER a maintained equi-join ([[JoinView]])
  * — the aggregate-over-join composition a star-schema warehouse serves
  * ("revenue by order priority, always fresh"). The reference's cascade
  * (O17, `/root/reference/index.js:250-253`) pipes one view's OUTPUT into
  * another index; this is that composition applied to the engine's two
  * richest views: the rollup is a downstream consumer of the join view's
  * CDC sidecar, exactly like a cascaded index.
  *
  * Maintenance reads NOTHING but deltas: a join-view refresh (either
  * side) persists delete/insert rows of the joined relation
  * ([[JoinView.changes]]); [[catchUp]] folds that feed into per-group
  * `(cnt, sum)` state with the retractable delta-merge
  * ([[AggView.maintain]]'s cnt/sum half) — deletes at weight −1, inserts
  * at +1 — touching only the state buckets of dirty groups. Cost per
  * catch-up is O(|join delta| + |dirty groups' buckets|), independent of
  * |L|, |R| and the join size: at 100 TB a 1 % change batch flows
  * base-delta → join-delta → group-delta without any full scan at any
  * level. Sums are carried in DECIMAL so the merge is exact and
  * associative ([[AggView.SumType]] contract); avg derives as sum/cnt.
  *
  * The state lives in the SAME bucketed store as the join view, as its
  * own map view (src_key = emit key = group key, one emission per group),
  * so CDC, time travel and compaction apply to the rollup itself.
  */
final class JoinAggView(
    val jv: JoinView,
    val stateName: String,
    groupCol: String,
    valueCol: String) {

  private def store = jv.store

  private def stateIdx = MapIndex.columns(stateName)(
    col("emit_key").cast("string"),
    array(MapIndex.emit(col("emit_key"),
      struct(col("cnt"), col("sum_value")))))

  private def aggregateOf(rows: DataFrame): DataFrame =
    rows.groupBy(col(groupCol).cast("string").as("emit_key"))
      .agg(count(lit(1)).as("cnt"),
        coalesce(sum(col(valueCol).cast(DecimalType(18, 4))), lit(0))
          .cast(AggView.SumType).as("sum_value"))

  /** Join epochs already folded into the state (build snapshot = the
    * join view's epoch at build time). */
  private var consumedEpoch: Int = 0

  /** Materialize the rollup from the join view's CURRENT snapshot (the
    * one full-scan moment; everything after is delta-fed). */
  def build(): Unit = {
    store.materialize(stateIdx, aggregateOf(jv.df))
    consumedEpoch = jv.epoch
  }

  /** Current rollup: `emit_key (group), cnt, sum_value`. */
  def state: DataFrame =
    store.df(stateName).select(col("emit_key"),
      col("emit_value.cnt").as("cnt"),
      col("emit_value.sum_value").as("sum_value"))

  /** Fold the join view's CDC feed `(consumed, jv.epoch]` into the state:
    * one delta-sized aggregation, a bucket-pruned read of ONLY the dirty
    * groups' current state, and a state refresh scoped to those groups
    * (delete-then-insert; a group whose count reaches zero vanishes).
    * Returns the state store's refresh stats so callers — and the spec's
    * I/O-bound assertion — can see the dirty-buckets-only economics. */
  def catchUp(): RefreshStats = {
    val to = jv.epoch
    require(to > consumedEpoch,
      s"rollup '$stateName' already current at join epoch $to")
    val feed = jv.changes(consumedEpoch, to)
    val delta = feed.select(
        col(s"emit_value.$groupCol").cast("string").as("emit_key"),
        when(col("change_type") === "insert", 1L).otherwise(-1L).as("d_cnt"),
        (when(col("change_type") === "insert",
            col(s"emit_value.$valueCol").cast(DecimalType(18, 4)))
          .otherwise(-col(s"emit_value.$valueCol").cast(DecimalType(18, 4))))
          .as("d_sum"))
      .groupBy("emit_key")
      .agg(sum("d_cnt").as("d_cnt"),
        sum("d_sum").cast(AggView.SumType).as("d_sum"))
      .persist() // feeds the touched-key set AND the merge below
    if (delta.isEmpty) { // epoch bumped but the join delta was empty
      delta.unpersist()
      consumedEpoch = to
      return BucketedViewStore.RefreshStats(0, 0, store.numBuckets)
    }
    val touched = delta.select("emit_key")
    val old = store.getAll(stateName, touched)
      .select(col("emit_key"),
        col("emit_value.cnt").as("cnt"),
        col("emit_value.sum_value").as("sum_value"))
    val merged = old.join(delta, Seq("emit_key"), "full_outer")
      .select(col("emit_key"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("sum_value"), lit(0).cast(AggView.SumType))
          + coalesce(col("d_sum"), lit(0).cast(AggView.SumType)))
          .cast(AggView.SumType).as("sum_value"))
      .filter(col("cnt") > 0)
    val stats = store.refresh(stateIdx, merged,
      Some(touched.select(col("emit_key").cast("string").as("src_key"))))
    delta.unpersist()
    consumedEpoch = to
    stats
  }
}

object JoinAggView {
  /** Handle to an already-materialized rollup (durable-store reopen):
    * trusts the on-disk state to be current with the join view, so the
    * caller must gate attachment behind its build unit's completion
    * marker ([[Views.unitDone]]). */
  def attach(jv: JoinView, stateName: String,
      groupCol: String, valueCol: String): JoinAggView = {
    val v = new JoinAggView(jv, stateName, groupCol, valueCol)
    v.consumedEpoch = jv.epoch
    v
  }
}
