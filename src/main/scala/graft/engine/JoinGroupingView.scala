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
  * The catch-up watermark rides in the state as the same atomic sentinel
  * row as [[JoinAggView]] — crash-consistent, reopenable via [[attach]],
  * idempotent per epoch.
  */
final class JoinGroupingView(
    val jv: MaintainedRelation,
    val stateName: String,
    groupCols: Seq[String],
    valueCol: String,
    sets: Seq[Seq[String]]) {

  import JoinAggView.{NullGroupKey, WatermarkKey}
  import JoinGroupingView.SetSep

  require(groupCols.nonEmpty && sets.nonEmpty)
  sets.foreach(s => require(s.forall(groupCols.contains),
    s"grouping set ${s.mkString("(", ",", ")")} escapes $groupCols"))
  require(sets.distinct.size == sets.size, "grouping sets must be distinct")

  private def store = jv.store

  /** gid bitmask of a set: bit i set = groupCols(i) MASKED (absent). */
  private def gidOf(set: Seq[String]): Int =
    groupCols.zipWithIndex.collect {
      case (c, i) if !set.contains(c) => 1 << i
    }.sum

  /** State-key spelling of one set's group for a row: set index, then
    * the set's UNMASKED values in groupCols order (null → sentinel). */
  private def keyOf(si: Int, of: String => Column): Column = {
    val parts = groupCols.filter(sets(si).contains)
      .map(c => coalesce(of(c).cast("string"), lit(NullGroupKey)))
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

  /** Watermark sentinel in the state schema. */
  private def wmRow(epoch: Int): DataFrame =
    store.spark.range(1).select(
      Seq(lit(WatermarkKey).as("emit_key"), lit(0).as("gid"),
        lit(epoch.toLong).as("cnt"), lit(0L).as("vcnt"),
        lit(0).cast(AggView.SumType).as("sum_value")) ++
        groupCols.map(c => lit(null).cast("string").as(s"g_$c")): _*)

  private var consumed: Int = 0

  /** Materialize the lattice from the relation's CURRENT snapshot. */
  def build(): Unit = {
    val e = jv.epoch
    store.materialize(stateIdx, latticeOf(jv.df).unionByName(wmRow(e)))
    consumed = e
  }

  /** Current lattice: `gid, <groupCols>, cnt, sum_value` — group columns
    * null where masked by the set or genuinely null in the data; the sum
    * serves as NULL when the group holds no non-null values (SQL SUM
    * semantics — a pad-only group is NULL, not 0). */
  def state: DataFrame = {
    val unkeyed = groupCols.map(c =>
      when(col(s"emit_value.g_$c") === NullGroupKey, lit(null).cast("string"))
        .otherwise(col(s"emit_value.g_$c")).as(c))
    store.df(stateName)
      .filter(col("emit_key") =!= WatermarkKey)
      .select(Seq(col("emit_value.gid").as("gid")) ++ unkeyed ++
        Seq(col("emit_value.cnt").as("cnt"),
          when(col("emit_value.vcnt") > 0, col("emit_value.sum_value"))
            .as("sum_value")): _*)
  }

  /** Fold the relation's CDC feed `(consumed, jv.epoch]` into the whole
    * lattice: the delta explodes |sets|×, aggregates once, and merges
    * into only the dirty groups' buckets. Idempotent per epoch. */
  def catchUp(): RefreshStats = {
    val to = jv.epoch
    require(to >= consumed,
      s"lattice '$stateName' watermark $consumed is ahead of epoch $to")
    if (to == consumed) return RefreshStats(0, 0, store.numBuckets)
    val owned = jv.changes(consumed, to)
    val feed = if (jv.padsRight) owned.unionByName(jv.rpadChanges(consumed, to))
      else owned
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
}

object JoinGroupingView {
  /** Separator inside lattice state keys (set index ∥ values). */
  private val SetSep = "\u0001"

  /** ROLLUP lattice: the prefixes of `groupCols`, () included. */
  def rollupSets(groupCols: Seq[String]): Seq[Seq[String]] =
    (0 to groupCols.size).map(groupCols.take)

  /** CUBE lattice: every subset of `groupCols`. */
  def cubeSets(groupCols: Seq[String]): Seq[Seq[String]] =
    groupCols.foldLeft(Seq(Seq.empty[String]))((acc, c) =>
      acc ++ acc.map(_ :+ c))

  /** Reopen an already-materialized lattice from its persisted
    * watermark (never trusting driver memory). */
  def attach(jv: MaintainedRelation, stateName: String,
      groupCols: Seq[String], valueCol: String,
      sets: Seq[Seq[String]]): JoinGroupingView = {
    val v = new JoinGroupingView(jv, stateName, groupCols, valueCol, sets)
    val rows = jv.store.get(stateName, JoinAggView.WatermarkKey)
      .select(col("emit_value.cnt")).collect()
    require(rows.nonEmpty,
      s"lattice view '$stateName' has no persisted watermark; rebuild it")
    v.consumed = rows.head.getLong(0).toInt
    v
  }
}
