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
  * MEASURES may be MULTIPLE ([[Measures]] — pass a `Seq[String]`): all
  * measures fold in the SAME |sets|×-exploded pass into the SAME one
  * state row per (set, group), each with its own `(vcnt, sum)` pair so
  * SQL's NULL-sum rule holds independently per measure (a TPC-H-Q1-shape
  * lattice is ONE view, not four). A single measure keeps the historical
  * field spelling (`vcnt`, `sum_value`) — zero migration; several spell
  * `vcnt_<col>` / `sum_<col>`.
  *
  * With `trackValues = true` a refcount companion state
  * (`stateName__vals`, one row per live (set, group, value) with the
  * value's multiplicity — the same deletion-safe machinery
  * [[JoinAggView.multiState]] uses for single-set rollups) is folded
  * from the same CDC feed, serving exact per-(set, group) `min` / `max`
  * / `distinct-count` alongside `(cnt, sum)` — "distinct customers by
  * (segment, priority) rollup, always fresh" across the whole lattice.
  * The companion tracks the FIRST measure. State size is Σ_sets |groups
  * of the set| · |distinct values per group| — the refcount family's
  * documented discrete/bounded-precision domain contract, |sets|× the
  * single-set version. Each state carries its own watermark, so a crash
  * between the two folds self-heals.
  *
  * The catch-up watermark rides in the state as the same atomic sentinel
  * row as [[JoinAggView]] — crash-consistent, reopenable via [[attach]],
  * idempotent per epoch — and carries the key-spelling GENERATION stamp
  * ([[JoinGroupingView.SpellingGen]]) that [[attach]] verifies, so a
  * state persisted under an older spelling is rejected with the
  * rebuild-it message instead of silently double-counting.
  */
final class JoinGroupingView(
    val jv: MaintainedRelation,
    val stateName: String,
    groupCols: Seq[String],
    measures: Measures,
    sets: Seq[Seq[String]],
    trackValues: Boolean = false) {

  import JoinAggView.{NullGroupKey, WatermarkKey}
  import JoinGroupingView.{SetSep, SpellingGen}

  require(groupCols.nonEmpty && sets.nonEmpty)
  sets.foreach(s => require(s.forall(groupCols.contains),
    s"grouping set ${s.mkString("(", ",", ")")} escapes $groupCols"))
  require(sets.distinct.size == sets.size, "grouping sets must be distinct")

  /** The measure columns, in fold order. */
  private val ms: Seq[String] = measures.parts
  private val single = ms.size == 1

  /** Per-measure state field spellings ([[JoinAggView]]'s convention:
    * single measure = historical names, zero migration). */
  private def vcntF(m: String) = if (single) "vcnt" else s"vcnt_$m"
  private def sumF(m: String) = if (single) "sum_value" else s"sum_$m"
  private[engine] def stateFields: Seq[String] =
    Seq("gid", "cnt") ++ ms.flatMap(m => Seq(vcntF(m), sumF(m)))

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
    * ((("x"+sep, "y")) vs (("x", sep+"y")) under raw concat_ws would
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
      struct(stateFields.map(col) ++ groupCols.map(c => col(s"g_$c")): _*))))

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
    * Each measure's `vcnt` counts its NON-NULL values: SQL's SUM over an
    * all-null group is NULL (not 0), and only the non-null count can
    * retract that distinction under deletes — per measure. */
  private def latticeOf(rows: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +: ms.flatMap(m => Seq(
      count(col(m)).as(vcntF(m)),
      coalesce(sum(col(m).cast(DecimalType(18, 4))), lit(0))
        .cast(AggView.SumType).as(sumF(m))))
    sets.indices.map { si =>
      rows.groupBy((keyOf(si, col).as("emit_key") +: fieldsOf(si, col)): _*)
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("gid", lit(gidOf(sets(si))))
    }.reduce(_.unionByName(_))
  }

  /** Full refcount recompute (build path; first measure). Null values
    * drop out — SQL's min/max/count(DISTINCT) all ignore them. */
  private def latticeValsOf(rows: DataFrame): DataFrame =
    sets.indices.map { si =>
      rows.select(keyOf(si, col).as("grp"),
        col(ms.head).cast(DecimalType(18, 4)).as("v"))
    }.reduce(_.unionByName(_))
      .filter(col("v").isNotNull)
      .groupBy("grp", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("emit_key", valKey(col("grp"), col("v")))

  /** Watermark sentinel in the state schema. The FIRST measure's
    * otherwise-unused `vcnt` field carries the KEY-SPELLING GENERATION
    * ([[JoinGroupingView.SpellingGen]]): the r16 escaping change
    * silently re-spells the state key of any group value containing
    * U+0001/U+0002, so a post-upgrade catch-up over a pre-escape store
    * would fold deltas under new spellings while old rows sit under old
    * ones, double-counting those groups — [[attach]] rejects a
    * generation mismatch with the rebuild-it message instead. Riding in
    * the watermark row makes the stamp crash-consistent with the state. */
  private def wmRow(epoch: Int): DataFrame =
    store.spark.range(1).select(
      Seq(lit(WatermarkKey).as("emit_key"), lit(0).as("gid"),
        lit(epoch.toLong).as("cnt")) ++
        ms.zipWithIndex.flatMap { case (m, i) =>
          Seq(lit(if (i == 0) SpellingGen else 0L).as(vcntF(m)),
            lit(0).cast(AggView.SumType).as(sumF(m)))
        } ++
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

  /** The raw state rows with their state key (internal serving base).
    * Single measure serves the historical `cnt, sum_value` pair;
    * several serve `cnt` plus per-measure `vcnt_<col>, sum_<col>`. */
  private def rawState: DataFrame = {
    val unkeyed = groupCols.map(c =>
      when(col(s"emit_value.g_$c") === NullGroupKey, lit(null).cast("string"))
        .otherwise(col(s"emit_value.g_$c")).as(c))
    val aggCols =
      if (single)
        Seq(col("emit_value.cnt").as("cnt"),
          when(col("emit_value.vcnt") > 0, col("emit_value.sum_value"))
            .as("sum_value"))
      else
        col("emit_value.cnt").as("cnt") +: ms.flatMap(m => Seq(
          col(s"emit_value.${vcntF(m)}").as(vcntF(m)),
          when(col(s"emit_value.${vcntF(m)}") > 0,
            col(s"emit_value.${sumF(m)}")).as(sumF(m))))
    store.df(stateName)
      .filter(col("emit_key") =!= WatermarkKey)
      .select(Seq(col("emit_key"), col("emit_value.gid").as("gid")) ++ unkeyed ++
        aggCols: _*)
  }

  /** Current lattice: `gid, <groupCols>, cnt, <sums>` — group columns
    * null where masked by the set or genuinely null in the data; each
    * sum serves as NULL when its measure holds no non-null values in
    * the group (SQL SUM semantics — a pad-only group is NULL, not 0). */
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
    * <sums>, min_value, max_value, n_distinct`. LEFT join from the
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
    val of: String => Column = c => col(s"emit_value.$c")
    val dAggs = sum("d_cnt").as("d_cnt") +: ms.flatMap(m => Seq(
      sum(s"d_${vcntF(m)}").as(s"d_${vcntF(m)}"),
      sum(s"d_${sumF(m)}").cast(AggView.SumType).as(s"d_${sumF(m)}")))
    val delta = sets.indices.map { si =>
      feed.select(Seq(keyOf(si, of).as("emit_key"),
          lit(gidOf(sets(si))).as("gid"),
          sgn.as("d_cnt")) ++
        ms.flatMap { m =>
          val dv = of(m).cast(DecimalType(18, 4))
          Seq((sgn * when(dv.isNotNull, 1L).otherwise(0L)).as(s"d_${vcntF(m)}"),
            (sgn * coalesce(dv, lit(0).cast(DecimalType(18, 4))))
              .as(s"d_${sumF(m)}"))
        } ++
        fieldsOf(si, of): _*)
    }.reduce(_.unionByName(_))
      .groupBy(Seq(col("emit_key"), col("gid")) ++
        groupCols.map(c => col(s"g_$c")): _*)
      .agg(dAggs.head, dAggs.tail: _*)
      .persist()
    val stats =
      if (delta.isEmpty) store.refresh(stateIdx, wmRow(to), None)
      else {
        val touched = delta.select("emit_key")
        val old = store.getAll(stateName, touched)
          .select(col("emit_key") +:
            stateFields.filterNot(_ == "gid")
              .map(f => col(s"emit_value.$f").as(f)): _*)
        val merged = old.join(delta, Seq("emit_key"), "full_outer")
          .select(Seq(col("emit_key"), col("gid"),
            (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
              .as("cnt")) ++
            ms.flatMap(m => Seq(
              (coalesce(col(vcntF(m)), lit(0L))
                + coalesce(col(s"d_${vcntF(m)}"), lit(0L))).as(vcntF(m)),
              (coalesce(col(sumF(m)), lit(0).cast(AggView.SumType))
                + coalesce(col(s"d_${sumF(m)}"), lit(0).cast(AggView.SumType)))
                .cast(AggView.SumType).as(sumF(m)))) ++
            groupCols.map(c => col(s"g_$c")): _*)
          .filter(col("cnt") > 0)
        store.refresh(stateIdx, merged.unionByName(wmRow(to)),
          Some(touched.select(col("emit_key").cast("string").as("src_key"))))
      }
    delta.unpersist()
    consumed = to
    stats
  }

  /** Refcount fold: the same |sets|× exploded delta (first measure),
    * merged into the dirty (set, group, value) rows only — a value whose
    * multiplicity reaches zero drops, so min/max/distinct stay exact
    * under deletes. */
  private def foldVals(to: Int): Unit = {
    require(to >= consumedVals,
      s"lattice '$valsName' watermark $consumedVals is ahead of epoch $to")
    if (to == consumedVals) return
    val feed = feedBetween(consumedVals, to)
    val sgn = when(col("change_type") === "insert", 1L).otherwise(-1L)
    val of: String => Column = c => col(s"emit_value.$c")
    val delta = sets.indices.map { si =>
      feed.select(keyOf(si, of).as("grp"),
        col(s"emit_value.${ms.head}").cast(DecimalType(18, 4)).as("v"),
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

  /** Key-spelling generation stamped in the watermark row's first
    * `vcnt` field: 2 = escaped composite spelling
    * ([[CompositeKey.escapePart]] applied to group values). Pre-escape
    * stores carry 0 there and are rejected at [[attach]] — their
    * separator-bearing group values sit under spellings this generation
    * would never fold into. Bump when the spelling changes again. */
  private[engine] val SpellingGen = 2L

  /** ROLLUP lattice: the prefixes of `groupCols`, () included. */
  def rollupSets(groupCols: Seq[String]): Seq[Seq[String]] =
    (0 to groupCols.size).map(groupCols.take)

  /** CUBE lattice: every subset of `groupCols`. */
  def cubeSets(groupCols: Seq[String]): Seq[Seq[String]] =
    groupCols.foldLeft(Seq(Seq.empty[String]))((acc, c) =>
      acc ++ acc.map(_ :+ c))

  /** Reopen an already-materialized lattice from its persisted
    * watermark (never trusting driver memory). Verifies the stored
    * schema carries this engine generation's state fields AND the
    * key-spelling generation stamp up front. */
  def attach(jv: MaintainedRelation, stateName: String,
      groupCols: Seq[String], measures: Measures,
      sets: Seq[Seq[String]], trackValues: Boolean = false): JoinGroupingView = {
    val v = new JoinGroupingView(jv, stateName, groupCols, measures, sets,
      trackValues)
    JoinAggView.requireStateFields(jv.store, stateName, v.stateFields)
    v.consumed = readWatermark(jv.store, stateName,
      genField = Some(v.stateFields(2))) // the first measure's vcnt field
    if (trackValues) {
      JoinAggView.requireStateFields(jv.store, v.valsName, Seq("grp", "v", "cnt"))
      v.consumedVals = readWatermark(jv.store, v.valsName)
    }
    v
  }

  /** Read the persisted watermark and — for the MAIN state, whose
    * sentinel carries the stamp in its first `vcnt` field (the vals
    * companion has no such field; its keys share the main state's
    * spelling, so one stamp governs both) — verify the key-spelling
    * generation, all in one bucket-pruned point read. */
  private def readWatermark(store: BucketedViewStore, name: String,
      genField: Option[String] = None): Int = {
    val fields = col("emit_value.cnt") +:
      genField.map(f => col(s"emit_value.$f")).toSeq
    val rows = store.get(name, JoinAggView.WatermarkKey)
      .select(fields: _*).collect()
    require(rows.nonEmpty,
      s"lattice view '$name' has no persisted watermark; rebuild it")
    genField.foreach { _ =>
      val gen = rows.head.getLong(1)
      require(gen == SpellingGen,
        s"lattice view '$name' was built under key-spelling generation " +
          s"$gen, this engine folds generation $SpellingGen — a catch-up " +
          "would double-count groups whose values contain the separator " +
          "bytes; rebuild it")
    }
    rows.head.getLong(0).toInt
  }
}
