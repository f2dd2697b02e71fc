package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.BucketedViewStore.RefreshStats

/** The measure list of a maintained rollup — the [[JoinKey]] magnet
  * pattern: a single column (`"o_totalprice"`) and a list
  * (`Seq("o_totalprice", "c_acctbal")`) are both accepted at every call
  * site via the companion's implicit conversions. Real rollups are
  * multi-measure (TPC-H Q1 carries four sums and two averages); folding
  * them as N parallel single-measure views would cost N× the CDC fold
  * and N× the state I/O — one [[JoinAggView]] with N measures folds ONE
  * pass into ONE state row per group. */
final case class Measures(parts: Seq[String]) {
  require(parts.nonEmpty, "a rollup needs at least one measure column")
  require(parts.distinct.size == parts.size,
    s"measure columns must be distinct, got ${parts.mkString(", ")}")
  def size: Int = parts.size
  override def toString: String = parts.mkString("(", ",", ")")
}

object Measures {
  import scala.language.implicitConversions
  implicit def fromString(c: String): Measures = Measures(Seq(c))
  implicit def fromSeq(cs: Seq[String]): Measures = Measures(cs)
}

/** A maintained GROUP-BY rollup OVER any [[MaintainedRelation]] — the
  * aggregate-over-join composition a star-schema warehouse serves
  * ("revenue by order priority, always fresh"), and over an
  * [[AsOfJoinView]] the last-touch attribution rollup. The reference's
  * cascade (O17, `/root/reference/index.js:250-253`) pipes one view's
  * OUTPUT into another index; this is that composition applied to the
  * engine's richest views: the rollup is a downstream consumer of the
  * upstream view's CDC sidecar, exactly like a cascaded index.
  *
  * Maintenance reads NOTHING but deltas: a join-view refresh (either
  * side) persists delete/insert rows of the joined relation
  * ([[JoinView.changes]]); [[catchUp]] folds that feed into per-group
  * state with the retractable delta-merge ([[AggView.maintain]]'s
  * cnt/sum half) — deletes at weight −1, inserts at +1 — touching only
  * the state buckets of dirty groups. Cost per catch-up is O(|join
  * delta| + |dirty groups' buckets|), independent of |L|, |R| and the
  * join size: at 100 TB a 1 % change batch flows base-delta →
  * join-delta → group-delta without any full scan at any level. Sums
  * are carried in DECIMAL so the merge is exact and associative
  * ([[AggView.SumType]] contract); avg derives as sum/cnt.
  *
  * MEASURES may be MULTIPLE ([[Measures]] — pass a `Seq[String]`): all
  * measures fold in the SAME single pass over the SAME CDC feed into
  * the SAME one state row per group, each carrying its own per-measure
  * `(vcnt, sum)` pair so the NULL-sum rule below holds independently
  * per measure. A single measure keeps the historical field spelling
  * (`vcnt`, `sum_value`) — byte-compatible with every existing store;
  * multiple measures spell `vcnt_<col>` / `sum_<col>`.
  *
  * DURABILITY: the catch-up watermark (the join epoch already folded in)
  * is persisted INSIDE the state view as a sentinel row
  * ([[JoinAggView.WatermarkKey]]) written in the SAME materialize/refresh
  * as the state rows — watermark and state commit atomically under one
  * manifest swap, so a process restart between a join refresh and the
  * rollup catch-up can never serve a silently-stale rollup:
  * [[JoinAggView.attach]] reads the watermark from disk and the next
  * [[catchUp]] folds exactly the unconsumed epochs. [[catchUp]] is
  * idempotent per epoch (already-current → no-op).
  *
  * NULL GROUPS: a null group key (reachable when rolling up a left_outer
  * [[JoinView]] by a right-side column, or a padded view by an
  * opposite-side column — a right-pad's left columns are all null) is
  * coalesced to a sentinel
  * ([[JoinAggView.NullGroupKey]]) before keying the state — null can
  * neither key a store bucket nor survive the dirty-group semi-join —
  * and mapped back to null at serve time, so SQL's null-group semantics
  * hold end to end. NULL SUMS: SQL's SUM over an all-null group is NULL
  * (not 0) — each measure's non-null value count (`vcnt`) retracts that
  * distinction under deletes, per measure.
  *
  * With `trackValues = true` a second refcount state (`stateName__vals`,
  * one row per live (group, value) with the value's multiplicity — the
  * same deletion-safe machinery as the engine's maintained distinct-count
  * and percentile states) is kept from the same CDC feed, serving exact
  * per-group `min` / `max` / `distinct-count` — the aggregates the plain
  * `(cnt, sum)` state cannot retract under deletes. The companion tracks
  * the FIRST measure (min/max/distinct of a secondary measure: make it
  * first, or run a second rollup). State size is |groups| · |distinct
  * values per group|: bounded for discrete/bounded-precision domains,
  * the documented contract of the refcount family. Each state carries
  * its own watermark, so a crash between the two folds self-heals: the
  * lagging state folds the wider range on the next catch-up, the
  * current one no-ops.
  *
  * The state lives in the SAME bucketed store as the join view, as its
  * own map view (src_key = emit key = group key, one emission per group),
  * so CDC, time travel and compaction apply to the rollup itself.
  */
final class JoinAggView(
    val jv: MaintainedRelation,
    val stateName: String,
    groupCol: String,
    measures: Measures,
    trackValues: Boolean = false) {

  import JoinAggView.{NullGroupKey, WatermarkKey, ValSep}

  /** The measure columns, in fold order. */
  private val ms: Seq[String] = measures.parts
  private val single = ms.size == 1

  /** Per-measure state field spellings — the single-measure names are
    * the historical layout (zero migration for every existing store). */
  private def vcntF(m: String) = if (single) "vcnt" else s"vcnt_$m"
  private def sumF(m: String) = if (single) "sum_value" else s"sum_$m"
  private[engine] def stateFields: Seq[String] =
    "cnt" +: ms.flatMap(m => Seq(vcntF(m), sumF(m)))

  // a padded view (full_outer / right_outer) splits its CDC across the
  // owned relation and the right-pad twin; [[feedBetween]] folds BOTH —
  // the twin refreshes in lockstep with the owned relation, so one
  // watermark governs the union. A pad healing into a real join row is
  // a twin delete + an owned insert in the same epoch: the fold sees
  // the retraction and the arrival as ordinary ±1 rows.

  private def store = jv.store
  private def valsName = s"${stateName}__vals"

  /** State-key spelling of a group value (null → sentinel). */
  private def groupKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(c.cast("string"), lit(NullGroupKey))

  /** Serve-side inverse of [[groupKey]]. */
  private def unkey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c === NullGroupKey, lit(null).cast("string")).otherwise(c)

  private def stateIdx = MapIndex.columns(stateName)(
    col("emit_key").cast("string"),
    array(MapIndex.emit(col("emit_key"),
      struct(stateFields.map(col): _*))))

  /** Refcount state: one row per (group, value), keyed by their joint
    * spelling, the group and DECIMAL value carried as struct fields so
    * serving never parses the key. */
  private def valsIdx = MapIndex.columns(valsName)(
    col("emit_key").cast("string"),
    array(MapIndex.emit(col("emit_key"),
      struct(col("grp"), col("v"), col("cnt")))))

  private def valKey(grp: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws(ValSep, grp, v.cast("string"))

  private def aggregateOf(rows: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +: ms.flatMap(m => Seq(
      // non-null value count: SQL's SUM over an all-null group is
      // NULL, and only this count can retract that under deletes
      count(col(m)).as(vcntF(m)),
      coalesce(sum(col(m).cast(DecimalType(18, 4))), lit(0))
        .cast(AggView.SumType).as(sumF(m))))
    rows.groupBy(groupKey(col(groupCol)).as("emit_key"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Full refcount recompute (build path; first measure). Null values
    * drop out — SQL's min/max/count(DISTINCT) all ignore them. */
  private def valsOf(rows: DataFrame): DataFrame =
    rows.select(groupKey(col(groupCol)).as("grp"),
        col(ms.head).cast(DecimalType(18, 4)).as("v"))
      .filter(col("v").isNotNull)
      .groupBy("grp", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("emit_key", valKey(col("grp"), col("v")))

  /** The watermark sentinel row in the MAIN state's schema: `cnt` carries
    * the consumed join epoch (each measure's vcnt 0, sum 0). Committing
    * it with the state rows is what makes the watermark crash-consistent. */
  private def wmRow(epoch: Int): DataFrame =
    store.spark.range(1).select(
      Seq(lit(WatermarkKey).as("emit_key"), lit(epoch.toLong).as("cnt")) ++
        ms.flatMap(m => Seq(lit(0L).as(vcntF(m)),
          lit(0).cast(AggView.SumType).as(sumF(m)))): _*)

  /** Watermark row in the vals state's schema. */
  private def wmValsRow(epoch: Int): DataFrame =
    store.spark.range(1).select(
      lit(WatermarkKey).as("emit_key"),
      lit(WatermarkKey).as("grp"),
      lit(null).cast(DecimalType(18, 4)).as("v"),
      lit(epoch.toLong).as("cnt"))

  /** In-memory mirrors of the persisted watermarks (source of truth is
    * the sentinel row on disk; these only skip the read on the hot
    * path). */
  private var consumedMain: Int = 0
  private var consumedVals: Int = 0

  /** Materialize the rollup from the join view's CURRENT snapshot (the
    * one full-scan moment; everything after is delta-fed). */
  def build(): Unit = {
    val e = jv.epoch
    store.materialize(stateIdx, aggregateOf(jv.df).unionByName(wmRow(e)))
    consumedMain = e
    if (trackValues) {
      store.materialize(valsIdx,
        valsOf(jv.df).select("emit_key", "grp", "v", "cnt")
          .unionByName(wmValsRow(e)))
      consumedVals = e
    }
  }

  /** Current rollup: `emit_key (group), cnt`, then per measure its sum —
    * one measure serves the historical `sum_value` column; several serve
    * `vcnt_<col>, sum_<col>` pairs (the vcnt IS SQL's `count(col)`).
    * Each sum is NULL when its measure holds no non-null values in the
    * group — SQL SUM semantics, independently per measure. */
  def state: DataFrame = {
    val base = store.df(stateName).filter(col("emit_key") =!= WatermarkKey)
    if (single)
      base.select(unkey(col("emit_key")).as("emit_key"),
        col("emit_value.cnt").as("cnt"),
        when(col("emit_value.vcnt") > 0, col("emit_value.sum_value"))
          .as("sum_value"))
    else
      base.select(
        Seq(unkey(col("emit_key")).as("emit_key"),
          col("emit_value.cnt").as("cnt")) ++
          ms.flatMap(m => Seq(
            col(s"emit_value.${vcntF(m)}").as(vcntF(m)),
            when(col(s"emit_value.${vcntF(m)}") > 0,
              col(s"emit_value.${sumF(m)}")).as(sumF(m)))): _*)
  }

  /** The refcount (group, value) state: `emit_key (group), value, cnt`. */
  def valueState: DataFrame = {
    require(trackValues, s"rollup '$stateName' was not built with trackValues")
    store.df(valsName)
      .filter(col("emit_key") =!= WatermarkKey)
      .select(unkey(col("emit_value.grp")).as("emit_key"),
        col("emit_value.v").as("value"),
        col("emit_value.cnt").as("cnt"))
  }

  /** Exact deletion-safe min / max / distinct-count per group, served
    * from the refcount state alone (vocabulary-sized — the join is never
    * re-read). */
  def multiState: DataFrame =
    valueState.groupBy("emit_key")
      .agg(min("value").as("min_value"), max("value").as("max_value"),
        count(lit(1)).as("n_distinct"))

  /** Fold the join view's CDC feed `(consumed, jv.epoch]` into the
    * state(s): one delta-sized aggregation per state, a bucket-pruned
    * read of ONLY the dirty keys' current state, and a state refresh
    * scoped to those keys (delete-then-insert; a key whose count reaches
    * zero vanishes). The watermark sentinel rides in the same refresh,
    * so serving can never observe state without its matching watermark.
    * Idempotent: already-current states no-op. Returns the MAIN state
    * store's refresh stats (the spec's I/O-bound assertion target). */
  def catchUp(): RefreshStats = {
    val to = jv.epoch
    val mainStats = foldMain(to)
    if (trackValues) foldVals(to)
    mainStats
  }

  private def feedBetween(from: Int, to: Int): DataFrame = {
    val owned = jv.changes(from, to)
    if (jv.padsRight) owned.unionByName(jv.rpadChanges(from, to)) else owned
  }

  private def foldMain(to: Int): RefreshStats = {
    require(to >= consumedMain,
      s"rollup '$stateName' watermark $consumedMain is ahead of join epoch $to")
    if (to == consumedMain) // already current: idempotent no-op
      return RefreshStats(0, 0, store.numBuckets)
    val sgn = when(col("change_type") === "insert", 1L).otherwise(-1L)
    val dAggs = sum("d_cnt").as("d_cnt") +: ms.flatMap(m => Seq(
      sum(s"d_${vcntF(m)}").as(s"d_${vcntF(m)}"),
      sum(s"d_${sumF(m)}").cast(AggView.SumType).as(s"d_${sumF(m)}")))
    val delta = feedBetween(consumedMain, to).select(
        Seq(groupKey(col(s"emit_value.$groupCol")).as("emit_key"),
          sgn.as("d_cnt")) ++
          ms.flatMap { m =>
            val v = col(s"emit_value.$m").cast(DecimalType(18, 4))
            Seq((sgn * when(v.isNotNull, 1L).otherwise(0L)).as(s"d_${vcntF(m)}"),
              (sgn * coalesce(v, lit(0).cast(DecimalType(18, 4))))
                .as(s"d_${sumF(m)}"))
          }: _*)
      .groupBy("emit_key")
      .agg(dAggs.head, dAggs.tail: _*)
      .persist() // feeds the touched-key set AND the merge below
    val stats =
      if (delta.isEmpty)
        // the join delta was empty, but the watermark still advances ON
        // DISK: leaving it behind would eventually age the replay range
        // past the store's sidecar retention for a reopening process
        store.refresh(stateIdx, wmRow(to), None)
      else {
        val touched = delta.select("emit_key")
        val old = store.getAll(stateName, touched)
          .select(col("emit_key") +:
            stateFields.map(f => col(s"emit_value.$f").as(f)): _*)
        val merged = old.join(delta, Seq("emit_key"), "full_outer")
          .select(
            Seq(col("emit_key"),
              (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
                .as("cnt")) ++
              ms.flatMap(m => Seq(
                (coalesce(col(vcntF(m)), lit(0L))
                  + coalesce(col(s"d_${vcntF(m)}"), lit(0L))).as(vcntF(m)),
                (coalesce(col(sumF(m)), lit(0).cast(AggView.SumType))
                  + coalesce(col(s"d_${sumF(m)}"), lit(0).cast(AggView.SumType)))
                  .cast(AggView.SumType).as(sumF(m)))): _*)
          .filter(col("cnt") > 0)
        store.refresh(stateIdx, merged.unionByName(wmRow(to)),
          Some(touched.select(col("emit_key").cast("string").as("src_key"))))
      }
    delta.unpersist()
    consumedMain = to
    stats
  }

  private def foldVals(to: Int): Unit = {
    require(to >= consumedVals,
      s"rollup '$valsName' watermark $consumedVals is ahead of join epoch $to")
    if (to == consumedVals) return
    val delta = feedBetween(consumedVals, to).select(
        groupKey(col(s"emit_value.$groupCol")).as("grp"),
        col(s"emit_value.${ms.head}").cast(DecimalType(18, 4)).as("v"),
        when(col("change_type") === "insert", 1L).otherwise(-1L).as("d_cnt"))
      .filter(col("v").isNotNull)
      .groupBy("grp", "v")
      .agg(sum("d_cnt").as("d_cnt"))
      .withColumn("emit_key", valKey(col("grp"), col("v")))
      .persist()
    if (delta.isEmpty) store.refresh(valsIdx, wmValsRow(to), None)
    else {
      val touched = delta.select("emit_key")
      val old = store.getAll(valsName, touched)
        .select(col("emit_key"), col("emit_value.cnt").as("cnt"))
      val merged = old.join(delta, Seq("emit_key"), "full_outer")
        .select(col("emit_key"), col("grp"), col("v"),
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"))
        .filter(col("cnt") > 0)
      // a (group, value) resurfacing only in `old` has null grp/v fields
      // from the outer join — but cnt > 0 with d_cnt null means nothing
      // changed for it, and it is only here because its key was touched;
      // re-spell its fields from the key is unnecessary: touched keys
      // come FROM the delta, so grp/v are always present on survivors
      store.refresh(valsIdx,
        merged.select("emit_key", "grp", "v", "cnt").unionByName(wmValsRow(to)),
        Some(touched.select(col("emit_key").cast("string").as("src_key"))))
    }
    delta.unpersist()
    consumedVals = to
  }
}

object JoinAggView {
  /** Sentinel emit_key of the persisted watermark row (U+0000 prefix —
    * outside any cast-to-string group domain). */
  val WatermarkKey = "\u0000__watermark"

  /** Sentinel spelling of a NULL group key in the state. */
  val NullGroupKey = "\u0000__null"

  /** Separator inside refcount state keys. */
  private val ValSep = "\u0001"

  /** Read a state view's persisted watermark (the consumed join epoch). */
  private def readWatermark(store: BucketedViewStore, name: String): Int = {
    val rows = store.get(name, WatermarkKey)
      .select(col("emit_value.cnt")).collect()
    require(rows.nonEmpty,
      s"state view '$name' has no persisted watermark — built by a " +
        "pre-watermark version or never materialized; rebuild it")
    rows.head.getLong(0).toInt
  }

  /** Verify a persisted state view carries the struct fields THIS engine
    * version folds — fail at attach with the rebuild-it message, not
    * mid-catch-up with a raw AnalysisException on a missing field (the
    * watermark row alone reads fine off a pre-`vcnt` store, so the
    * watermark check cannot catch a schema generation gap). Schema-only:
    * reads parquet footers, never data. */
  private[engine] def requireStateFields(store: BucketedViewStore,
      name: String, fields: Seq[String]): Unit = {
    val have = store.df(name).select(col("emit_value.*")).schema.fieldNames.toSet
    val missing = fields.filterNot(have)
    require(missing.isEmpty,
      s"state view '$name' lacks state field(s) ${missing.mkString(", ")} — " +
        "built by an earlier engine version or a different measure list; " +
        "rebuild it")
  }

  /** Handle to an already-materialized rollup (durable-store reopen).
    * The catch-up watermark is read from the PERSISTED sentinel row —
    * never trusted from the caller or driver memory — so a reopening
    * process resumes from exactly the epochs the on-disk state has
    * folded, and the next [[JoinAggView.catchUp]] replays any refreshes
    * that landed after the last fold. */
  def attach(jv: MaintainedRelation, stateName: String,
      groupCol: String, measures: Measures,
      trackValues: Boolean = false): JoinAggView = {
    val v = new JoinAggView(jv, stateName, groupCol, measures, trackValues)
    requireStateFields(jv.store, stateName, v.stateFields)
    v.consumedMain = readWatermark(jv.store, stateName)
    if (trackValues) {
      requireStateFields(jv.store, v.valsName, Seq("grp", "v", "cnt"))
      v.consumedVals = readWatermark(jv.store, v.valsName)
    }
    v
  }
}
