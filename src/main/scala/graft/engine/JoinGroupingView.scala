package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.BucketedViewStore.RefreshStats

/** A maintained GROUPING-SETS rollup over any [[MaintainedRelation]] —
  * the multi-level generalization of [[JoinAggView]]: one deletion-safe
  * `(cnt, sum)` state holding EVERY grouping set of a ROLLUP / CUBE /
  * arbitrary GROUPING SETS lattice, all folded from the SAME CDC feed in
  * one pass ("revenue by (segment, priority), by segment, and in total —
  * always fresh"). The reference's cascade (O17,
  * `/root/reference/index.js:250-253`) can pipe one view into one index;
  * this folds one delta into the whole lattice at once.
  *
  * Each CDC delta row explodes to one ±(1, value) contribution per
  * grouping set — `|sets|`× the delta, still O(|delta|), never a scan of
  * the relation — then the standard retractable merge touches only the
  * dirty groups' state buckets. State keys spell `(set index, unmasked
  * group values)`; a genuinely-NULL group value is sentinel-coded
  * ([[JoinAggView.NullGroupKey]]) so it can key a bucket, while a MASKED
  * column simply contributes nothing (the set index disambiguates, the
  * same job SQL's GROUPING() does). Serving returns the SQL surface:
  * a GROUPING_ID-style bitmask (`gid`, bit i set = groupCols(i) masked)
  * plus the group columns (null where masked or genuinely null), so the
  * state is directly comparable to `GROUP BY ROLLUP/CUBE` output.
  *
  * With `trackValues = true` a refcount companion state
  * (`stateName__vals`, one row per live (set, group, value) with the
  * value's multiplicity — the same deletion-safe machinery
  * [[JoinAggView.multiState]] uses for single-set rollups) is folded
  * from the same CDC feed, serving exact per-(set, group) `min` / `max`
  * / `distinct-count` alongside `(cnt, sum)` — "distinct customers by
  * (segment, priority) rollup, always fresh" across the whole lattice.
  * State size is Σ_sets |groups of the set| · |distinct values per
  * group| — the refcount family's documented discrete/bounded-precision
  * domain contract, |sets|× the single-set version. Each state carries
  * its own watermark, so a crash between the two folds self-heals.
  *
  * The catch-up watermark rides in the state as the same atomic sentinel
  * row as [[JoinAggView]] — crash-consistent, reopenable via [[attach]],
  * idempotent per epoch.
  */
final class JoinGroupingView(
    val jv: MaintainedRelation,
    val stateName: String,
    groupCols: Seq[String],
    valueCol: String,
    sets: Seq[Seq[String]],
    trackValues: Boolean = false) {

  import JoinAggView.{NullGroupKey, WatermarkKey}
  import JoinGroupingView.SetSep

  require(groupCols.nonEmpty && sets.nonEmpty)
  sets.foreach(s => require(s.forall(groupCols.contains),
    s"grouping set ${s.mkString("(", ",", ")")} escapes $groupCols"))
  require(sets.distinct.size == sets.size, "grouping sets must be distinct")

  private def store = jv.store
  private[engine] def valsName = s"${stateName}__vals"

  /** gid bitmask of a set: bit i set = groupCols(i) MASKED (absent). */
  private def gidOf(set: Seq[String]): Int =
    groupCols.zipWithIndex.collect {
      case (c, i) if !set.contains(c) => 1 << i
    }.sum

  /** State-key spelling of one set's group for a row: set index, then
    * the set's UNMASKED values in groupCols order (null → sentinel),
    * each part ESCAPED ([[CompositeKey.escapePart]]) — a group VALUE
    * containing the separator must not collide two different groups
    * (("x\u0001", "y") vs ("x", "\u0001y") under raw concat_ws would
    * merge their counts and serve the wrong group fields). The sentinel
    * spellings contain no separator/escape bytes, so they are fixed
    * points of the escaping. */
  private def keyOf(si: Int, of: String => Column): Column = {
    val parts = groupCols.filter(sets(si).contains)
      .map(c => CompositeKey.escapePart(
        coalesce(of(c).cast("string"), lit(NullGroupKey))))
    concat_ws(SetSep, (lit(si.toString) +: parts): _*)
  }

  /** The group columns carried as state fields for serving: unmasked →
    * the value (string spelling), masked → null. */
  private def fieldsOf(si: Int, of: String => Column): Seq[Column] =
    groupCols.map(c =>
      (if (sets(si).contains(c)) of(c).cast("string")
       else lit(null).cast("string")).as(s"g_$c"))

  private def stateIdx = MapIndex.columns(stateName)(
    col("emit_key").cast("string"),
    array(MapIndex.emit(col("emit_key"),
      struct(Seq(col("gid"), col("cnt"), col("vcnt"), col("sum_value")) ++
        groupCols.map(c => col(s"g_$c")): _*))))

  /** Refcount companion: one row per live (set, group, value), keyed by
    * the main state key ∥ the value; `grp` carries the main state key so
    * serving groups without parsing. */
  private def valsIdx = MapIndex.columns(valsName)(
    col("emit_key").cast("string"),
    array(MapIndex.emit(col("emit_key"),
      struct(col("grp"), col("v"), col("cnt")))))

  private def valKey(grp: Column, v: Column): Column =
    concat_ws(SetSep, grp, v.cast("string"))

  /** One row per (set, group) of `rows` — the build-path aggregation.
    * `vcnt` counts NON-NULL values: SQL's SUM over an all-null group is
    * NULL (not 0), and only the non-null count can retract that
    * distinction under deletes. */
  private def latticeOf(rows: DataFrame): DataFrame =
    sets.indices.map { si =>
      rows.groupBy((keyOf(si, col).as("emit_key") +: fieldsOf(si, col)): _*)
        .agg(count(lit(1)).as("cnt"),
          count(col(valueCol)).as("vcnt"),
          coalesce(sum(col(valueCol).cast(DecimalType(18, 4))), lit(0))
            .cast(AggView.SumType).as("sum_value"))
        .withColumn("gid", lit(gidOf(sets(si))))
    }.reduce(_.unionByName(_))

  /** Full refcount recompute (build path). Null values drop out — SQL's
    * min/max/count(DISTINCT) all ignore them. */
  private def latticeValsOf(rows: DataFrame): DataFrame =
    sets.indices.map { si =>
      rows.select(keyOf(si, col).as("grp"),
        col(valueCol).cast(DecimalType(18, 4)).as("v"))
    }.reduce(_.unionByName(_))
      .filter(col("v").isNotNull)
      .groupBy("grp", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("emit_key", valKey(col("grp"), col("v")))

  /** Watermark sentinel in the state schema. */
  private def wmRow(epoch: Int): DataFrame =
    store.spark.range(1).select(
      Seq(lit(WatermarkKey).as("emit_key"), lit(0).as("gid"),
        lit(epoch.toLong).as("cnt"), lit(0L).as("vcnt"),
        lit(0).cast(AggView.SumType).as("sum_value")) ++
        groupCols.map(c => lit(null).cast("string").as(s"g_$c")): _*)

  /** Watermark row in the vals state's schema. */
  private def wmValsRow(epoch: Int): DataFrame =
    store.spark.range(1).select(
      lit(WatermarkKey).as("emit_key"),
      lit(WatermarkKey).as("grp"),
      lit(null).cast(DecimalType(18, 4)).as("v"),
      lit(epoch.toLong).as("cnt"))

  private var consumed: Int = 0
  private var consumedVals: Int = 0

  /** Materialize the lattice from the relation's CURRENT snapshot. */
  def build(): Unit = {
    val e = jv.epoch
    store.materialize(stateIdx, latticeOf(jv.df).unionByName(wmRow(e)))
    consumed = e
    if (trackValues) {
      store.materialize(valsIdx,
        latticeValsOf(jv.df).select("emit_key", "grp", "v", "cnt")
          .unionByName(wmValsRow(e)))
      consumedVals = e
    }
  }

  /** The raw state rows with their state key (internal serving base). */
  private def rawState: DataFrame = {
    val unkeyed = groupCols.map(c =>
      when(col(s"emit_value.g_$c") === NullGroupKey, lit(null).cast("string"))
        .otherwise(col(s"emit_value.g_$c")).as(c))
    store.df(stateName)
      .filter(col("emit_key") =!= WatermarkKey)
      .select(Seq(col("emit_key"), col("emit_value.gid").as("gid")) ++ unkeyed ++
        Seq(col("emit_value.cnt").as("cnt"),
          when(col("emit_value.vcnt") > 0, col("emit_value.sum_value"))
            .as("sum_value")): _*)
  }

  /** Current lattice: `gid, <groupCols>, cnt, sum_value` — group columns
    * null where masked by the set or genuinely null in the data; the sum
    * serves as NULL when the group holds no non-null values (SQL SUM
    * semantics — a pad-only group is NULL, not 0). */
  def state: DataFrame = rawState.drop("emit_key")

  /** Exact deletion-safe min / max / distinct-count per (set, group)
    * from the refcount companion alone, keyed by the main state key. */
  private def multiState: DataFrame = {
    require(trackValues, s"lattice '$stateName' was not built with trackValues")
    store.df(valsName)
      .filter(col("emit_key") =!= WatermarkKey)
      .groupBy(col("emit_value.grp").as("__k"))
      .agg(min(col("emit_value.v")).as("min_value"),
        max(col("emit_value.v")).as("max_value"),
        count(lit(1)).as("n_distinct"))
  }

  /** The full multi-aggregate lattice surface: `gid, <groupCols>, cnt,
    * sum_value, min_value, max_value, n_distinct`. LEFT join from the
    * main state: a (set, group) whose values are ALL NULL exists in the
    * main state (cnt > 0, NULL sum) but holds no refcount rows — it
    * serves with null min/max and distinct-count 0, exactly SQL's
    * aggregate-over-all-null-group answers. */
  def stateMulti: DataFrame =
    rawState.join(multiState, col("emit_key") === col("__k"), "left_outer")
      .withColumn("n_distinct", coalesce(col("n_distinct"), lit(0L)))
      .drop("emit_key", "__k")

  /** Fold the relation's CDC feed `(consumed, jv.epoch]` into the whole
    * lattice: the delta explodes |sets|×, aggregates once, and merges
    * into only the dirty groups' buckets. Idempotent per epoch. */
  def catchUp(): RefreshStats = {
    val to = jv.epoch
    val stats = foldMain(to)
    if (trackValues) foldVals(to)
    stats
  }

  private def feedBetween(from: Int, to: Int): DataFrame = {
    val owned = jv.changes(from, to)
    if (jv.padsRight) owned.unionByName(jv.rpadChanges(from, to)) else owned
  }

  private def foldMain(to: Int): RefreshStats = {
    require(to >= consumed,
      s"lattice '$stateName' watermark $consumed is ahead of epoch $to")
    if (to == consumed) return RefreshStats(0, 0, store.numBuckets)
    val feed = feedBetween(consumed, to)
    val sgn = when(col("change_type") === "insert", 1L).otherwise(-1L)
    val dv = col(s"emit_value.$valueCol").cast(DecimalType(18, 4))
    val of: String => Column = c => col(s"emit_value.$c")
    val delta = sets.indices.map { si =>
      feed.select(Seq(keyOf(si, of).as("emit_key"),
          lit(gidOf(sets(si))).as("gid"),
          sgn.as("d_cnt"),
          (sgn * when(dv.isNotNull, 1L).otherwise(0L)).as("d_vcnt"),
          (sgn * coalesce(dv, lit(0).cast(DecimalType(18, 4)))).as("d_sum")) ++
        fieldsOf(si, of): _*)
    }.reduce(_.unionByName(_))
      .groupBy(Seq(col("emit_key"), col("gid")) ++
        groupCols.map(c => col(s"g_$c")): _*)
      .agg(sum("d_cnt").as("d_cnt"), sum("d_vcnt").as("d_vcnt"),
        sum("d_sum").cast(AggView.SumType).as("d_sum"))
      .persist()
    val stats =
      if (delta.isEmpty) store.refresh(stateIdx, wmRow(to), None)
      else {
        val touched = delta.select("emit_key")
        val old = store.getAll(stateName, touched)
          .select(col("emit_key"),
            col("emit_value.cnt").as("cnt"),
            col("emit_value.vcnt").as("vcnt"),
            col("emit_value.sum_value").as("sum_value"))
        val merged = old.join(delta, Seq("emit_key"), "full_outer")
          .select(Seq(col("emit_key"), col("gid"),
            (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
            (coalesce(col("vcnt"), lit(0L)) + coalesce(col("d_vcnt"), lit(0L))).as("vcnt"),
            (coalesce(col("sum_value"), lit(0).cast(AggView.SumType))
              + coalesce(col("d_sum"), lit(0).cast(AggView.SumType)))
              .cast(AggView.SumType).as("sum_value")) ++
            groupCols.map(c => col(s"g_$c")): _*)
          .filter(col("cnt") > 0)
        store.refresh(stateIdx, merged.unionByName(wmRow(to)),
          Some(touched.select(col("emit_key").cast("string").as("src_key"))))
      }
    delta.unpersist()
    consumed = to
    stats
  }

  /** Refcount fold: the same |sets|× exploded delta, merged into the
    * dirty (set, group, value) rows only — a value whose multiplicity
    * reaches zero drops, so min/max/distinct stay exact under deletes. */
  private def foldVals(to: Int): Unit = {
    require(to >= consumedVals,
      s"lattice '$valsName' watermark $consumedVals is ahead of epoch $to")
    if (to == consumedVals) return
    val feed = feedBetween(consumedVals, to)
    val sgn = when(col("change_type") === "insert", 1L).otherwise(-1L)
    val of: String => Column = c => col(s"emit_value.$c")
    val delta = sets.indices.map { si =>
      feed.select(keyOf(si, of).as("grp"),
        col(s"emit_value.$valueCol").cast(DecimalType(18, 4)).as("v"),
        sgn.as("d_cnt"))
    }.reduce(_.unionByName(_))
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
      store.refresh(valsIdx,
        merged.select("emit_key", "grp", "v", "cnt").unionByName(wmValsRow(to)),
        Some(touched.select(col("emit_key").cast("string").as("src_key"))))
    }
    delta.unpersist()
    consumedVals = to
  }
}

object JoinGroupingView {
  /** Separator inside lattice state keys (set index ∥ values ∥ refcount
    * value suffix). */
  private val SetSep = "\u0001"

  /** ROLLUP lattice: the prefixes of `groupCols`, () included. */
  def rollupSets(groupCols: Seq[String]): Seq[Seq[String]] =
    (0 to groupCols.size).map(groupCols.take)

  /** CUBE lattice: every subset of `groupCols`. */
  def cubeSets(groupCols: Seq[String]): Seq[Seq[String]] =
    groupCols.foldLeft(Seq(Seq.empty[String]))((acc, c) =>
      acc ++ acc.map(_ :+ c))

  /** Reopen an already-materialized lattice from its persisted
    * watermark (never trusting driver memory). Verifies the stored
    * schema carries this engine generation's state fields up front. */
  def attach(jv: MaintainedRelation, stateName: String,
      groupCols: Seq[String], valueCol: String,
      sets: Seq[Seq[String]], trackValues: Boolean = false): JoinGroupingView = {
    val v = new JoinGroupingView(jv, stateName, groupCols, valueCol, sets,
      trackValues)
    JoinAggView.requireStateFields(jv.store, stateName,
      Seq("gid", "cnt", "vcnt", "sum_value"))
    v.consumed = readWatermark(jv.store, stateName)
    if (trackValues) {
      JoinAggView.requireStateFields(jv.store, v.valsName, Seq("grp", "v", "cnt"))
      v.consumedVals = readWatermark(jv.store, v.valsName)
    }
    v
  }

  private def readWatermark(store: BucketedViewStore, name: String): Int = {
    val rows = store.get(name, JoinAggView.WatermarkKey)
      .select(col("emit_value.cnt")).collect()
    require(rows.nonEmpty,
      s"lattice view '$name' has no persisted watermark; rebuild it")
    rows.head.getLong(0).toInt
  }
}
