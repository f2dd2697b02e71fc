package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.BucketedViewStore.RefreshStats

/** Maintained per-join-key QUANTILE SKETCHES over any maintained
  * relation of the join family — the [[SketchQuantileView]] machinery
  * composed with IVM: "the distribution of order value per priority,
  * over live-priority enriched orders, always fresh". The state is one
  * serialized [[graft.functions.QuantileSketch]] per JOIN KEY group,
  * folded purely from the upstream relation's CDC sidecar like every
  * other downstream consumer ([[JoinAggView]] pattern), with the
  * published mergeability/deletion asymmetry:
  *
  *  - groups whose batch is INSERT-ONLY fold O(delta): the delta's rows
  *    sketch locally and merge into the stored sketch (`qsketch_merge`);
  *  - groups the batch RETRACTS FROM rebuild from the relation's
  *    CURRENT rows — read BUCKET-PRUNED through the upstream's
  *    [[KeyAddressable.byKeys]] (the group IS the join key, so the
  *    rebuild reads exactly the dirty keys' clustered buckets, never
  *    the relation). That addressability is WHY the group key is the
  *    join key: an arbitrary group column would force a predicate scan
  *    of the whole relation per retraction batch.
  *
  * The catch-up watermark persists INSIDE the state as a sentinel row
  * ([[JoinAggView.WatermarkKey]]) whose `sketch` bytes are the
  * big-endian consumed epoch — committed atomically with the state
  * rows, re-read by [[JoinSketchView.attach]], idempotent per epoch
  * (the [[JoinAggView]] durability contract). The rollup serve
  * ([[quantilesRollup]]) merges the per-key sketches into a global row
  * from state alone. Padded upstreams are refused: a pad's flipping
  * ownership would make retraction splits ambiguous.
  */
final class JoinSketchView(
    val jv: MaintainedRelation with KeyAddressable,
    val stateName: String,
    valueCol: String,
    k: Int = graft.functions.QuantileSketch.DefaultK) {

  import JoinAggView.WatermarkKey

  require(!jv.padsRight,
    s"maintained relation '${jv.name}' pads right rows; sketch state " +
      "cannot attribute a pad's retraction to a join-key group")

  graft.functions.QuantileSketch.register(jv.store.spark)

  private def store = jv.store

  private def stateIdx = MapIndex.columns(stateName)(
    col("emit_key").cast("string"),
    array(MapIndex.emit(col("emit_key"), struct(col("sketch")))))

  /** Per-key sketch of a `(emit_key, v)` relation. */
  private def sketchOf(rows: DataFrame): DataFrame =
    rows.groupBy(col("emit_key"))
      .agg(expr(s"qsketch(CAST(v AS DOUBLE), $k)").as("sketch"))

  private def keyed(rows: DataFrame): DataFrame =
    rows.select(jv.spelledKey.as("emit_key"), col(valueCol).as("v"))

  /** Watermark sentinel: the consumed epoch as the sketch bytes. */
  private def wmRow(epoch: Int): DataFrame =
    store.spark.range(1).select(
      lit(WatermarkKey).as("emit_key"),
      lit(java.nio.ByteBuffer.allocate(8).putLong(epoch.toLong).array())
        .as("sketch"))

  private var consumed: Int = 0

  /** Materialize the state from the relation's CURRENT snapshot. */
  def build(): Unit = {
    val e = jv.epoch
    store.materialize(stateIdx,
      sketchOf(keyed(jv.df)).unionByName(wmRow(e)))
    consumed = e
  }

  /** Fold the relation's CDC feed `(consumed, jv.epoch]`: insert-only
    * keys merge O(delta); retraction-touched keys rebuild from the
    * upstream's CURRENT rows, read bucket-pruned by key. Idempotent. */
  def catchUp(): RefreshStats = {
    val to = jv.epoch
    require(to >= consumed,
      s"sketch state '$stateName' watermark $consumed is ahead of epoch $to")
    if (to == consumed) return RefreshStats(0, 0, store.numBuckets)
    val feed = jv.changes(consumed, to)
      .select(jv.unsaltKey(col("emit_key")).as("emit_key"),
        col(s"emit_value.$valueCol").as("v"), col("change_type"))
      .persist()
    val delKeys = feed.filter(col("change_type") === "delete")
      .select("emit_key").distinct()
    val insKeys = feed.filter(col("change_type") === "insert")
      .select("emit_key").distinct()
    val rebuilt = sketchOf(keyed(jv.byKeys(delKeys))
      .join(delKeys, Seq("emit_key"), "left_semi"))
    val mergeKeys = insKeys.join(delKeys, Seq("emit_key"), "left_anti")
    val batchSketch = sketchOf(feed.filter(col("change_type") === "insert")
      .join(mergeKeys, Seq("emit_key"), "left_semi")
      .select("emit_key", "v"))
    val oldSketch = store.getAll(stateName, mergeKeys)
      .select(col("emit_key"), col("emit_value.sketch").as("sketch"))
    val merged = oldSketch.unionByName(batchSketch)
      .groupBy("emit_key")
      .agg(expr("qsketch_merge(sketch)").as("sketch"))
    val vanished = delKeys
      .join(rebuilt.select("emit_key"), Seq("emit_key"), "left_anti")
      .select(col("emit_key").cast("string").as("src_key"))
    val stats = store.refresh(stateIdx,
      rebuilt.unionByName(merged).unionByName(wmRow(to)), Some(vanished))
    feed.unpersist()
    consumed = to
    stats
  }

  /** Current state: `emit_key (spelled join key), sketch (binary)`. */
  def state: DataFrame =
    store.df(stateName)
      .filter(col("emit_key") =!= WatermarkKey)
      .select(col("emit_key"), col("emit_value.sketch").as("sketch"))

  /** Served quantiles per key: exact folded n + estimates. */
  def quantiles(ps: Seq[(String, Double)]): DataFrame =
    quantilesOf(state, ps)

  /** Per-key PLUS the merged-total row ([[SketchQuantileView
    * .stateRollup]] semantics) — both levels from state alone. */
  def quantilesRollup(ps: Seq[(String, Double)],
      totalKey: String = "ALL"): DataFrame = {
    val per = state
    val total = per.agg(expr("qsketch_merge(sketch)").as("sketch"))
      .select(lit(totalKey).as("emit_key"), col("sketch"))
    quantilesOf(per.unionByName(total), ps)
  }

  private def quantilesOf(s: DataFrame, ps: Seq[(String, Double)]): DataFrame =
    s.select(
      Seq(col("emit_key"), expr("qsketch_n(sketch)").as("n")) ++
        ps.map { case (nm, p) => expr(s"qsketch_quantile(sketch, $p)").as(nm) }: _*)
}

object JoinSketchView {
  /** Reopen an already-materialized sketch state from its persisted
    * watermark (the epoch encoded in the sentinel row's sketch bytes —
    * never trusted from driver memory). */
  def attach(jv: MaintainedRelation with KeyAddressable, stateName: String,
      valueCol: String,
      k: Int = graft.functions.QuantileSketch.DefaultK): JoinSketchView = {
    val v = new JoinSketchView(jv, stateName, valueCol, k)
    val rows = jv.store.get(stateName, JoinAggView.WatermarkKey)
      .select(col("emit_value.sketch")).collect()
    require(rows.nonEmpty,
      s"sketch state '$stateName' has no persisted watermark; rebuild it")
    v.consumed = java.nio.ByteBuffer
      .wrap(rows.head.getAs[Array[Byte]](0)).getLong.toInt
    v
  }
}
