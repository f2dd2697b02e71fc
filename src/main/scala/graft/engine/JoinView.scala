package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.MapIndex.emit
import graft.engine.BucketedViewStore.RefreshStats

/** An incrementally-maintained equi-JOIN view — delta-join incremental
  * view maintenance (Δ(L⋈R) = ΔL⋈R′ ∪ L⋈ΔR, the classic IVM change-
  * propagation rule from the published literature) expressed entirely
  * through the engine's partition-scoped store machinery. The reference
  * engine has no joins at all (SURVEY.md §2.2 "Joins: None"); its closest
  * analog is the cascade (O17, `index.js:250-253`), which can only key one
  * view's output into another — this operator is the two-sided version a
  * real warehouse needs: a denormalized join relation that stays fresh
  * under change batches to EITHER input without ever re-scanning them.
  *
  * Layout — three map views in one bucketed store:
  *  - `name__left` / `name__right`: each input keyed by the JOIN KEY, so
  *    the delta of one side reads ONLY the other side's matching key
  *    buckets (`getAll` — bucket-pruned), never the full table;
  *  - `name` (the join view): source rows are the JOINED rows, src_key =
  *    the LEFT row's primary key (the owner — retracting or rewriting a
  *    left row delete-then-inserts exactly its join outputs through the
  *    store's ordinary refresh), emit key = the join key (clustered, so
  *    serving by key is a pruned read), emit value = the joined row.
  *
  * JOIN KEYS may be COMPOSITE ([[JoinKey]] — pass a `Seq[String]` per
  * side, same arity): the stored emit key is the [[CompositeKey]]
  * spelling (escaped, injective, null-poisoning — a key part containing
  * the U+0001 separator can neither truncate nor collide), while every
  * actual join predicate runs part-wise on the original columns. Join
  * key parts should be non-null: SQL's equi-join never matches a null
  * and a null spelled key cannot address a store bucket.
  *
  * Refresh cost is O(|delta| · join fanout) plus the touched buckets'
  * rewrite — independent of |L| and |R|: at 100 TB a 1 % daily change
  * batch reads 1 % of the opposite side's buckets and rewrites the dirty
  * join buckets, the IVM bar. CDC sidecars, epoch snapshots, time travel
  * and compaction come with the store.
  *
  * Column names of the two inputs must be disjoint (the usual TPC-H
  * prefix convention) so the joined emission schema is unambiguous.
  *
  * SKEW: a hot join key (one key owning a large share of a side)
  * concentrates that key's emissions into ONE emit bucket, so a one-row
  * delta touching the hot key rewrites the whole hot bucket — bucket-
  * scoped I/O stops being delta-proportional exactly on the keys where
  * it matters most. `saltBuckets = S > 1` shards every emit key by a
  * salt DERIVED FROM THE ROW'S OWN PRIMARY KEY (`hash(pk) % S`), the
  * two-round trick [[Layout.saltedSum]] uses for skewed aggregation: a
  * hot key's rows spread over ~S buckets, a delta's changed rows dirty
  * only the salt shards their pks map to (rewrite ≤ hot-bucket/S per
  * row), and key-addressed reads fan out to a BOUNDED S sub-keys
  * ([[byKeys]], the refresh's opposite-side reads). Salt 1 (default) is
  * byte-identical to the unsalted layout.
  */
final class JoinView(
    val store: BucketedViewStore,
    val name: String,
    val leftPk: String, leftJk: JoinKey, leftCols: Seq[String],
    rightPk: String, rightJk: JoinKey, rightCols: Seq[String],
    saltBuckets: Int = 1,
    val joinType: String = "inner") extends MaintainedRelation with LeftKeyedConsumer with KeyAddressable {
  require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
  require(leftJk.size == rightJk.size,
    s"join keys must have the same arity: $leftJk vs $rightJk")
  require(leftCols.contains(leftPk) && leftJk.parts.forall(leftCols.contains),
    s"leftCols must carry the pk '$leftPk' and join key $leftJk")
  require(rightCols.contains(rightPk) && rightJk.parts.forall(rightCols.contains),
    s"rightCols must carry the pk '$rightPk' and join key $rightJk")
  // LEFT-OUTER IVM: a left row with no right match emits ONE null-padded
  // join row instead of nothing. The delta rules are unchanged — both
  // refresh joins just run left_outer, so an upsert with no match emits
  // its null-pad, a right DELETE's dirty keys re-join to null-pads (the
  // inner view would retract those rows), and a late right arrival heals
  // a null-pad into the real join row through the ordinary ownership
  // delete-then-insert. The left join key should be non-null (a null key
  // never matches and its null-pad is keyed null).
  //
  // FULL-OUTER / RIGHT-OUTER IVM: the left-owned machinery cannot own a
  // right row with no left match (src_key is the LEFT pk), so the view
  // splits into an owned relation plus a RIGHT-PAD twin (`name__rpad`,
  // src_key = the RIGHT pk) holding exactly the right rows with no left
  // match, null-padded on the left columns — the remaining published
  // delta rules: pads heal in BOTH directions. full_outer = left_outer
  // owned relation + the twin; right_outer = INNER owned relation + the
  // twin (matched rows only, no left-pads). Each refresh recomputes
  // pad membership for ONLY the batch's dirty join keys (both reads
  // bucket-pruned): a left arrival at a padded key tombstones the pad
  // (heal), a left retreat re-pads the orphaned right rows, a right
  // delete drops its pad via the ordinary ownership tombstone. Serving
  // unions the two relations. Join keys must be non-null on both sides
  // when the twin is in play (a null key never matches and cannot
  // address a store bucket).
  require(Set("inner", "left_outer", "right_outer", "full_outer")(joinType),
    s"joinType must be 'inner', 'left_outer', 'right_outer' or " +
      s"'full_outer', got '$joinType'")

  /** The owned (left-pk-keyed) relation's join type: full_outer's owned
    * half is exactly the left_outer rule; right_outer's is the inner. */
  private val ownedType = joinType match {
    case "full_outer"  => "left_outer"
    case "right_outer" => "inner"
    case t             => t
  }

  override def srcPk: String = leftPk

  /** Does this view carry the right-pad twin? */
  override def padsRight: Boolean =
    joinType == "full_outer" || joinType == "right_outer"
  private def fullOuter = padsRight

  // key spelling / salting / join predicates: the shared [[CompositeKey]]
  // machinery — byte-identical to the historical layout for single-part
  // keys at salt 1
  private def lSpell = CompositeKey.spellNames(leftJk)
  private def rSpell = CompositeKey.spellNames(rightJk)
  private def joinCond = CompositeKey.equi(leftJk, rightJk)
  private def expandKeys(keys: DataFrame): DataFrame =
    CompositeKey.expand(store.spark, keys, saltBuckets)
  private def unsalt(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    CompositeKey.unsalt(k, leftJk.size, saltBuckets)

  private def leftIdx = MapIndex.columns(s"${name}__left")(
    col(leftPk).cast("string"),
    array(emit(CompositeKey.salted(lSpell, col(leftPk), saltBuckets, leftJk.size),
      struct(leftCols.map(col): _*))))

  private def rightIdx = MapIndex.columns(s"${name}__right")(
    col(rightPk).cast("string"),
    array(emit(CompositeKey.salted(rSpell, col(rightPk), saltBuckets, rightJk.size),
      struct(rightCols.map(col): _*))))

  private def joinIdx = MapIndex.columns(name)(
    col(leftPk).cast("string"),
    array(emit(CompositeKey.salted(lSpell, col(leftPk), saltBuckets, leftJk.size),
      struct((leftCols ++ rightCols).map(col): _*))))

  /** full_outer / right_outer only: right rows with no left match,
    * null-padded on the left columns, OWNED by their right pk —
    * retracting or rewriting a right row delete-then-inserts its pad
    * through the ordinary refresh. */
  private def rpadIdx = MapIndex.columns(s"${name}__rpad")(
    col(rightPk).cast("string"),
    array(emit(CompositeKey.salted(rSpell, col(rightPk), saltBuckets, rightJk.size),
      struct((leftCols ++ rightCols).map(col): _*))))

  /** Materialize the stored views from the base inputs (epoch 0 each). */
  def build(left: DataFrame, right: DataFrame): Unit = {
    store.materialize(leftIdx, left)
    store.materialize(rightIdx, right)
    store.materialize(joinIdx, left.join(right, joinCond, ownedType))
    if (fullOuter)
      // right_outer + left-pk-null filter: the unmatched right rows in
      // the FULL joined schema, left columns typed-null
      store.materialize(rpadIdx,
        left.join(right, joinCond, "right_outer")
          .filter(col(leftPk).isNull))
  }

  /** Typed-null left columns in the joined schema (pad construction). */
  private def nullLeftCols: Seq[org.apache.spark.sql.Column] = {
    val schema = store.df(leftIdx.name).select(col("emit_value.*")).schema
    leftCols.map(c => lit(null).cast(schema(c).dataType).as(c))
  }

  /** Recompute right-pad membership for the dirty join keys of one batch:
    * post-batch left keys and right rows at those keys are both
    * bucket-pruned reads; pads are the anti-join, healed pads the
    * semi-join — O(dirty keys' buckets), never O(|L|) or O(|R|).
    * `alsoDelete` carries right pks tombstoned by the batch itself. */
  private def refreshRpad(dirtyJk: DataFrame,
      alsoDelete: Option[DataFrame]): Unit = {
    val lKeys = store.getAll(leftIdx.name, expandKeys(dirtyJk))
      .select(leftJk.parts.map(p => col(s"emit_value.$p")): _*).distinct()
    val rRows = store.getAll(rightIdx.name, expandKeys(dirtyJk))
      .select(col("emit_value.*"))
    val pads = rRows.join(lKeys, joinCond, "left_anti")
      .select(nullLeftCols ++ rightCols.map(col): _*)
    val healed = rRows.join(lKeys, joinCond, "left_semi")
      .select(col(rightPk).cast("string").as("src_key")).distinct()
    val dels = alsoDelete.map(_.toDF("src_key").unionByName(healed)).getOrElse(healed)
    store.refresh(rpadIdx, pads, Some(dels))
    ()
  }

  /** Apply a LEFT-side change batch: ΔL⋈R′ — the delta joins against
    * ONLY the right buckets holding its join keys. A left upsert whose
    * key finds no right match still retracts the row's previous join
    * outputs (it owns them via src_key); a left delete tombstones them.
    * Returns the join store's refresh stats (dirty buckets only). */
  def refreshLeft(ups: DataFrame, dels: Option[DataFrame]): RefreshStats = {
    store.refresh(leftIdx, ups, dels)
    val rMatch = store.getAll(rightIdx.name,
        expandKeys(ups.select(lSpell.as("emit_key")).distinct()))
      .select(col("emit_value.*"))
    // left_outer: every ups key emits (null-padded if unmatched), so the
    // unmatched-tombstone set is empty by construction — same code path
    val upsJoined = ups.join(rMatch, joinCond, ownedType)
    val matched = upsJoined
      .select(col(leftPk).cast("string").as("src_key")).distinct()
    val unmatched = ups.select(col(leftPk).cast("string").as("src_key"))
      .distinct().join(matched, Seq("src_key"), "left_anti")
    val allDels = dels.map(_.toDF("src_key").unionByName(unmatched))
      .getOrElse(unmatched)
    val stats = store.refresh(joinIdx, upsJoined, Some(allDels))
    if (fullOuter) {
      // the batch's dirty join keys — upserted keys AND deleted rows'
      // old keys — come from the left view's own refresh sidecar; a left
      // arrival heals pads at its key, a left retreat re-pads orphans
      val e = store.epoch(leftIdx.name)
      val dirtyJk = store.changesBetween(leftIdx.name, e - 1, e)
        .select(unsalt(col("emit_key")).as("emit_key")).distinct()
      refreshRpad(dirtyJk, None)
    }
    stats
  }

  /** Apply a RIGHT-side change batch: L⋈ΔR — the dirty join-key set
    * comes from the right view's OWN refresh sidecar (deletes carry their
    * emit key, so a tombstoned right row's key is dirty without any
    * lookup), and only the left buckets holding those keys are read and
    * re-joined against the post-batch right buckets. Left rows whose
    * right match vanished are retracted via the ownership tombstone. */
  def refreshRight(ups: DataFrame, dels: Option[DataFrame]): RefreshStats = {
    store.refresh(rightIdx, ups, dels)
    val e = store.epoch(rightIdx.name)
    // sidecar keys carry the RIGHT rows' salt shards; the left side's
    // shards for the same base key differ (salted by their own pks), so
    // strip the shard and re-expand per side
    val dirtyJk = store.changesBetween(rightIdx.name, e - 1, e)
      .select(unsalt(col("emit_key")).as("emit_key")).distinct()
    val lRows = store.getAll(leftIdx.name, expandKeys(dirtyJk))
      .select(col("emit_value.*"))
    val rRows = store.getAll(rightIdx.name, expandKeys(dirtyJk))
      .select(col("emit_value.*"))
    // left_outer: a dirty-key left row whose match vanished re-emits its
    // null-pad here (the inner view tombstones it via `unmatched`)
    val upsJoined = lRows.join(rRows, joinCond, ownedType)
    val matched = upsJoined
      .select(col(leftPk).cast("string").as("src_key")).distinct()
    val unmatched = lRows.select(col(leftPk).cast("string").as("src_key"))
      .distinct().join(matched, Seq("src_key"), "left_anti")
    val stats = store.refresh(joinIdx, upsJoined, Some(unmatched))
    if (fullOuter)
      // same dirty keys drive pad membership; right pks the batch itself
      // tombstoned lose their pads via the explicit delete set
      refreshRpad(dirtyJk, dels.map(_.toDF("src_key")))
    stats
  }

  /** The maintained join relation (original input columns). Under
    * full_outer this is the union of the left-owned relation and the
    * right-pad twin. */
  def df: DataFrame = {
    val owned = store.df(name).select(col("emit_value.*"))
    if (fullOuter)
      owned.unionByName(store.df(s"${name}__rpad").select(col("emit_value.*")))
    else owned
  }

  /** Bucket-pruned read of the join rows for a set of SPELLED join keys
    * ([[CompositeKey.spell]]; fans out to the S salt shards per key when
    * salting). */
  def byKeys(keys: DataFrame): DataFrame = {
    val owned = store.getAll(name, expandKeys(keys)).select(col("emit_value.*"))
    if (fullOuter)
      owned.unionByName(store.getAll(s"${name}__rpad", expandKeys(keys))
        .select(col("emit_value.*")))
    else owned
  }

  /** [[KeyAddressable]] surface: the spelled left join key over the
    * relation's output columns, and the salt-stripper for stored
    * (CDC) emit keys — downstream key-scoped consumers read this
    * relation bucket-pruned without knowing its spelling. */
  override def spelledKey: org.apache.spark.sql.Column = lSpell
  override def unsaltKey(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column = unsalt(k)

  def epoch: Int = store.epoch(name)

  /** CDC feed of the join view over (fromEpoch, toEpoch]. When the view
    * [[padsRight]] this covers the OWNED relation only (the right-pad
    * twin has its own sidecars under `name__rpad`, [[rpadChanges]]) —
    * consumers of a padded view must replay both. */
  def changes(fromEpoch: Int, toEpoch: Int): DataFrame =
    store.changesBetween(name, fromEpoch, toEpoch)

  /** CDC feed of the right-pad twin over (fromEpoch, toEpoch] — same
    * joined-row schema as [[changes]]. The twin refreshes in lockstep
    * with the owned relation (once per build/refresh), so the two feeds
    * share epoch numbering. */
  override def rpadChanges(fromEpoch: Int, toEpoch: Int): DataFrame = {
    require(padsRight, s"join view '$name' ($joinType) has no right-pad twin")
    store.changesBetween(s"${name}__rpad", fromEpoch, toEpoch)
  }
}
