package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.MapIndex.emit
import graft.engine.BucketedViewStore.RefreshStats

/** An incrementally-maintained AS-OF join view — the temporal analog of
  * [[JoinView]]: every LEFT row (a fact/probe: an event, a trade, a
  * request) is joined to the single RIGHT row sharing its join key with
  * the greatest timestamp ≤ the left row's timestamp (backward as-of,
  * ties on timestamp broken by the greatest right pk — the same total
  * order the engine's `join_asof` query family uses). Left rows with no
  * eligible right row emit null-padded right columns (LEFT-OUTER as-of,
  * the standard shape: "every purchase attributed to its last click,
  * clickless purchases kept").
  *
  * The reference engine has no joins (SURVEY.md §2.2 "Joins: None");
  * this is the two-sided maintenance rule its cascade (O17,
  * `/root/reference/index.js:250-253`) cannot express, specialized to
  * the temporal predicate that equi-join IVM ([[JoinView]]) cannot
  * carry: the matched right row is a per-left-row ARGMAX, so a right
  * change at key k can re-match ANY left row at k — the delta rules
  * below re-pick for exactly the dirty keys, never the corpus.
  *
  * Layout mirrors [[JoinView]] — three map views in one bucketed store:
  *  - `name__left` / `name__right`: each input keyed by the JOIN KEY
  *    (bucket-pruned opposite-side reads during refresh);
  *  - `name`: the as-of-joined rows, src_key = the LEFT pk (ownership:
  *    rewriting or retracting a left row delete-then-inserts exactly its
  *    one output row), emit key = the join key (clustered serving).
  *
  * Delta rules (both O(|delta| · key fanout), never O(|L|) or O(|R|)):
  *  - LEFT batch: each upserted left row as-of-picks against ONLY the
  *    right buckets holding its join key; deletes tombstone by pk.
  *  - RIGHT batch: the dirty join keys come from the right view's own
  *    CDC sidecar (a delete carries its key); those keys' left rows
  *    re-pick against the post-batch right rows — a new right version
  *    can steal matches from, and a retracted one return them to, any
  *    left row at its key, so the key's left rows are the candidate
  *    set — and the re-pick is DIFFED against the stored rows before
  *    writing, so bucket I/O and the CDC sidecar scale with the real
  *    output delta, not the key's fanout.
  *
  * The as-of pick itself is the union+window spelling (one exchange on
  * the join key, O(n log n) per key group, no per-row subquery and no
  * quadratic candidate join): probes and candidates interleave in
  * (ts, probe-last, right-pk) order and each probe takes the running
  * `last` candidate payload — at 100 TB the refresh windows only ever
  * see the delta's keys' rows.
  *
  * `direction = "forward"` picks the LEAST right ts ≥ the left ts
  * (ties to the least pk — the engine's `join_asof_forward`
  * convention); `tolerance` is a (leftTs, rightTs) => boolean Column
  * bounding how far the pick may reach (the pandas
  * merge_asof(tolerance=...) surface) — it filters the picked closest
  * row, which is equivalent to filtering before the pick since every
  * other candidate is strictly farther.
  *
  * Timestamp columns must have the same (mutually comparable) type on
  * both sides; column names of the two inputs must be disjoint. As a
  * [[MaintainedRelation]] the view feeds any downstream incremental
  * consumer — a [[JoinAggView]] over it is a maintained last-touch
  * attribution rollup.
  */
final class AsOfJoinView(
    val store: BucketedViewStore,
    val name: String,
    leftPk: String, leftJk: String, leftTs: String, leftCols: Seq[String],
    rightPk: String, rightJk: String, rightTs: String, rightCols: Seq[String],
    direction: String = "backward",
    tolerance: Option[(Column, Column) => Column] = None,
    saltBuckets: Int = 1)
  extends MaintainedRelation {

  require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
  require(Set("backward", "forward")(direction),
    s"direction must be 'backward' or 'forward', got '$direction'")
  require((leftCols.toSet & rightCols.toSet).isEmpty,
    s"left/right column names must be disjoint, both carry: " +
      (leftCols.toSet & rightCols.toSet).mkString(", "))
  require(leftCols.contains(leftPk) && leftCols.contains(leftTs),
    s"leftCols must carry the pk '$leftPk' and timestamp '$leftTs'")
  require(rightCols.contains(rightPk) && rightCols.contains(rightTs),
    s"rightCols must carry the pk '$rightPk' and timestamp '$rightTs'")

  // SKEW: a hot join key (one user owning a large share of facts or
  // candidates) concentrates its emissions in ONE bucket per view;
  // `saltBuckets = S > 1` shards every emit key by a salt derived from
  // the row's OWN pk (the [[JoinView]] hardening) so a hot key's rows
  // spread over ~S buckets and a delta's rewrites stay shard-local.
  // The PICK is storage-independent — the refresh windows partition by
  // the actual key COLUMN of the read rows, so salting never splits a
  // key's candidate timeline. Salt 1 is byte-identical to unsalted.
  private val Sep = "\u0001"

  private def saltedKey(jk: Column, pk: Column): Column =
    if (saltBuckets <= 1) jk.cast("string")
    else concat_ws(Sep, jk.cast("string"),
      pmod(xxhash64(pk.cast("string")), lit(saltBuckets)).cast("string"))

  /** Expand a base-key relation to its S salted spellings (identity at
    * salt 1). */
  private def expandKeys(keys: DataFrame): DataFrame =
    if (saltBuckets <= 1) keys
    else {
      val c = keys.columns.head
      keys.crossJoin(store.spark.range(saltBuckets).toDF("__salt"))
        .select(concat_ws(Sep, col(c).cast("string"), col("__salt")).as(c))
    }

  /** Strip the salt shard off a stored emit key (identity at salt 1;
    * with salting, join keys must not contain U+0001). */
  private def unsalt(k: Column): Column =
    if (saltBuckets <= 1) k else substring_index(k, Sep, 1)

  private def leftIdx = MapIndex.columns(s"${name}__left")(
    col(leftPk).cast("string"),
    array(emit(saltedKey(col(leftJk), col(leftPk)),
      struct(leftCols.map(col): _*))))

  private def rightIdx = MapIndex.columns(s"${name}__right")(
    col(rightPk).cast("string"),
    array(emit(saltedKey(col(rightJk), col(rightPk)),
      struct(rightCols.map(col): _*))))

  private def joinIdx = MapIndex.columns(name)(
    col(leftPk).cast("string"),
    array(emit(saltedKey(col(leftJk), col(leftPk)),
      struct((leftCols ++ rightCols).map(col): _*))))

  /** Backward as-of pick: for each `lRows` row, the `rRows` row with the
    * same join key and max (ts, pk) among ts ≤ the left ts; no match →
    * typed-null right columns. Union+window: candidates sort before
    * probes at equal ts (inclusive bound), `last(_, ignoreNulls)` over
    * the running frame is the argmax. */
  private def asofPick(lRows: DataFrame, rRows: DataFrame): DataFrame = {
    val lStruct = struct(leftCols.map(col): _*)
    val rStruct = struct(rightCols.map(col): _*)
    val lType = lRows.select(lStruct.as("s")).schema("s").dataType
    val rType = rRows.select(rStruct.as("s")).schema("s").dataType
    val pkType = rRows.schema(rightPk).dataType
    val probes = lRows.select(
      col(leftJk).cast("string").as("__jk"), col(leftTs).as("__ts"),
      lit(1).as("__probe"), lit(null).cast(pkType).as("__rpk"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val cands = rRows.select(
      col(rightJk).cast("string").as("__jk"), col(rightTs).as("__ts"),
      lit(0).as("__probe"), col(rightPk).as("__rpk"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    // forward flips the scan: candidates with GREATER ts come first, so
    // the running `last` at a probe is the LEAST ts ≥ it (ties: least
    // pk, hence the flipped pk order). Candidates still sort before
    // probes at equal ts — the bound stays inclusive either way.
    val w0 = Window.partitionBy("__jk")
    val w = (if (direction == "backward")
        w0.orderBy(col("__ts").asc, col("__probe").asc, col("__rpk").asc)
      else
        w0.orderBy(col("__ts").desc, col("__probe").asc, col("__rpk").desc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = probes.unionByName(cands)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    // tolerance filters the PICKED closest row: any other candidate is
    // strictly farther, so filter-after-pick ≡ filter-before-pick (the
    // pandas merge_asof(tolerance=...) semantics, O(1) extra work)
    val bounded = tolerance match {
      case None => picked
      case Some(f) => picked.withColumn("__m",
        when(col("__m").isNotNull && f(col("__ts"), col(s"__m.$rightTs")),
          col("__m")))
    }
    bounded.filter(col("__probe") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Materialize the stored views from the base inputs (epoch 0 each —
    * the one full-scan moment). */
  def build(left: DataFrame, right: DataFrame): Unit = {
    store.materialize(leftIdx, left)
    store.materialize(rightIdx, right)
    store.materialize(joinIdx, asofPick(left, right))
  }

  /** Apply a LEFT-side change batch: upserted rows re-pick against only
    * the right buckets holding their join keys (every row emits — the
    * left-outer pad covers no-match); deletes tombstone by ownership. */
  def refreshLeft(ups: DataFrame, dels: Option[DataFrame]): RefreshStats = {
    store.refresh(leftIdx, ups, dels)
    val rRows = store.getAll(rightIdx.name,
        expandKeys(ups.select(col(leftJk).cast("string")).distinct()))
      .select(col("emit_value.*"))
    store.refresh(joinIdx, asofPick(ups, rRows), dels.map(_.toDF("src_key")))
  }

  /** Apply a RIGHT-side change batch: the dirty join keys from the right
    * view's own CDC sidecar drive a re-pick of exactly those keys' left
    * rows against the post-batch right rows — both reads bucket-pruned.
    * Only rows whose PICK ACTUALLY CHANGED are rewritten (the re-pick is
    * diffed against the stored rows first), so bucket I/O and the CDC
    * sidecar are ∝ the real output delta, not the dirty keys' fanout —
    * a hot key's thousand facts don't rewrite because one candidate
    * moved elsewhere in its timeline, and a downstream rollup folds
    * only true changes. Left ownership is unchanged, so no tombstones. */
  def refreshRight(ups: DataFrame, dels: Option[DataFrame]): RefreshStats = {
    store.refresh(rightIdx, ups, dels)
    val e = store.epoch(rightIdx.name)
    val dirtyJk = store.changesBetween(rightIdx.name, e - 1, e)
      .select(unsalt(col("emit_key")).as("emit_key")).distinct()
    val lRows = store.getAll(leftIdx.name, expandKeys(dirtyJk))
      .select(col("emit_value.*"))
    val rRows = store.getAll(rightIdx.name, expandKeys(dirtyJk))
      .select(col("emit_value.*"))
    val current = store.getAll(name, expandKeys(dirtyJk))
      .select(col("emit_value.*"))
    val changed = asofPick(lRows, rRows).exceptAll(current)
    store.refresh(joinIdx, changed, None)
  }

  /** The maintained as-of join relation (original input columns; right
    * columns null where no candidate was eligible). */
  def df: DataFrame = store.df(name).select(col("emit_value.*"))

  /** Bucket-pruned read of the joined rows for a set of join keys. */
  def byKeys(keys: DataFrame): DataFrame =
    store.getAll(name, expandKeys(keys)).select(col("emit_value.*"))

  def epoch: Int = store.epoch(name)

  /** CDC feed of the as-of join view over (fromEpoch, toEpoch]. */
  def changes(fromEpoch: Int, toEpoch: Int): DataFrame =
    store.changesBetween(name, fromEpoch, toEpoch)
}
