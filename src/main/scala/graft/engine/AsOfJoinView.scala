package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampType, TimestampNTZType}
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
  * JOIN KEYS may be COMPOSITE ([[JoinKey]], same arity both sides): the
  * stored emit keys are the [[CompositeKey]] spelling (escaped,
  * injective — a part containing U+0001 can neither truncate nor
  * collide), and the pick windows partition by that spelled key, whose
  * equality is tuple equality for non-null parts.
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
  * convention); `direction = "nearest"` picks the candidate minimizing
  * |right ts − left ts|, distance ties resolved toward the BACKWARD
  * candidate (each side keeping its own pk tie rule — the pandas
  * merge_asof(direction='nearest') surface), composed as the backward
  * and forward picks plus an O(1) per-row choice (nearest needs a
  * timestamp DISTANCE, so the ts columns must be timestamps or numeric).
  * `tolerance` is a (leftTs, rightTs) => boolean Column bounding how far
  * the pick may reach (the pandas merge_asof(tolerance=...) surface) —
  * it filters the picked closest row, which is equivalent to filtering
  * before the pick since every other candidate is strictly farther;
  * under `nearest` it applies to EACH directional pick before the
  * choice, so a nearer-but-out-of-tolerance side loses to the other.
  *
  * NULL KEYS / TIMESTAMPS: SQL as-of semantics never match a null join
  * key or a null timestamp — candidates with a null key part or null ts
  * are dropped from every pick, and a probe with a null key part or
  * null ts always takes the null pad. (Rows with null join keys cannot
  * address a store bucket, so like the rest of the family the contract
  * is non-null keys; the pick hardening makes the semantics explicit
  * rather than ordering-dependent.)
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
    val leftPk: String, leftJk: JoinKey, leftTs: String, leftCols: Seq[String],
    rightPk: String, rightJk: JoinKey, rightTs: String, rightCols: Seq[String],
    direction: String = "backward",
    tolerance: Option[(Column, Column) => Column] = None,
    saltBuckets: Int = 1,
    rightKeyed: Boolean = false)
  extends MaintainedRelation with LeftKeyedConsumer with KeyAddressable {

  require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
  require(Set("backward", "forward", "nearest")(direction),
    s"direction must be 'backward', 'forward' or 'nearest', got '$direction'")
  require((leftCols.toSet & rightCols.toSet).isEmpty,
    s"left/right column names must be disjoint, both carry: " +
      (leftCols.toSet & rightCols.toSet).mkString(", "))
  require(leftCols.contains(leftPk) && leftCols.contains(leftTs),
    s"leftCols must carry the pk '$leftPk' and timestamp '$leftTs'")
  require(rightCols.contains(rightPk) && rightCols.contains(rightTs),
    s"rightCols must carry the pk '$rightPk' and timestamp '$rightTs'")
  require(leftJk.size == rightJk.size,
    s"join keys must have the same arity: $leftJk vs $rightJk")
  require(leftJk.parts.forall(leftCols.contains),
    s"leftCols must carry the join key $leftJk")
  require(rightJk.parts.forall(rightCols.contains),
    s"rightCols must carry the join key $rightJk")

  override def srcPk: String = leftPk

  // SKEW: a hot join key (one user owning a large share of facts or
  // candidates) concentrates its emissions in ONE bucket per view;
  // `saltBuckets = S > 1` shards every emit key by a salt derived from
  // the row's OWN pk (the [[JoinView]] hardening) so a hot key's rows
  // spread over ~S buckets and a delta's rewrites stay shard-local.
  // The PICK is storage-independent — the refresh windows partition by
  // the spelled key COLUMN of the read rows, so salting never splits a
  // key's candidate timeline. Salt 1 is byte-identical to unsalted.
  private def lSpell = CompositeKey.spellNames(leftJk)
  private def rSpell = CompositeKey.spellNames(rightJk)
  private def expandKeys(keys: DataFrame): DataFrame =
    CompositeKey.expand(store.spark, keys, saltBuckets)
  private def unsalt(k: Column): Column =
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

  // RIGHT-KEYED twin (`rightKeyed = true`): the joined rows emitted a
  // second time under the RIGHT pk — "all facts attributed to click X"
  // becomes a bucket-pruned point read ([[byRightKeys]]) instead of a
  // view scan. Ownership stays with the LEFT pk (a re-pick delete-then-
  // inserts the row in BOTH views from the same batch), only MATCHED
  // rows emit (a null right pk cannot key a bucket), and rows that lose
  // their match retract via explicit tombstones — the [[FilterJoinView]]
  // rule for rows that no longer emit. Write I/O doubles per refresh
  // (the documented cost of a secondary index); serving by right key
  // drops from O(view) to O(matching buckets).
  private def byRightName = s"${name}__byright"
  private def byRightIdx = MapIndex.columns(byRightName)(
    col(leftPk).cast("string"),
    array(emit(CompositeKey.salted(col(rightPk).cast("string"), col(leftPk),
        saltBuckets),
      struct((leftCols ++ rightCols).map(col): _*))))

  /** Mirror a batch of (possibly re-)picked rows into the right-keyed
    * twin: matched rows upsert under their right key; rows now unmatched
    * (plus any tombstoned left pks) retract via explicit src-key deletes
    * — ownership delete-then-insert cannot cover a row that no longer
    * emits. */
  private def refreshByRight(picked: DataFrame, dels: Option[DataFrame]): Unit = {
    val unmatched = picked.filter(col(rightPk).isNull)
      .select(col(leftPk).cast("string").as("src_key")).distinct()
    val allDels = dels.map(_.toDF("src_key").unionByName(unmatched))
      .getOrElse(unmatched)
    store.refresh(byRightIdx, picked.filter(col(rightPk).isNotNull),
      Some(allDels))
  }

  /** One directional pick over the interleaved union: candidates sort
    * before probes at equal ts (inclusive bound), `last(_, ignoreNulls)`
    * over the running frame is the argmax/argmin. Backward scans ts asc
    * (ties: greatest pk wins = last seen); forward scans ts desc so the
    * running `last` at a probe is the LEAST ts ≥ it (ties: least pk,
    * hence the flipped pk order). */
  private def pickOver(u: DataFrame, dir: String): Column = {
    val w0 = Window.partitionBy("__jk")
    val w = (if (dir == "backward")
        w0.orderBy(col("__ts").asc, col("__probe").asc, col("__rpk").asc)
      else
        w0.orderBy(col("__ts").desc, col("__probe").asc, col("__rpk").desc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last(col("__r"), ignoreNulls = true).over(w)
  }

  /** Apply the tolerance bound to a picked row (identity when none). */
  private def bound(m: Column, lts: Column): Column = tolerance match {
    case None    => m
    case Some(f) => when(m.isNotNull && f(lts, m.getField(rightTs)), m)
  }

  /** As-of pick: for each `lRows` row, the `rRows` row with the same
    * join key that the direction's argmax/argmin/argmin-|Δ| selects; no
    * match → typed-null right columns. See the class doc for the
    * direction and tolerance semantics. */
  private def asofPick(lRows: DataFrame, rRows: DataFrame): DataFrame = {
    val lStruct = struct(leftCols.map(col): _*)
    val rStruct = struct(rightCols.map(col): _*)
    val lType = lRows.select(lStruct.as("s")).schema("s").dataType
    val rType = rRows.select(rStruct.as("s")).schema("s").dataType
    val pkType = rRows.schema(rightPk).dataType
    val probes = lRows.select(
      lSpell.as("__jk"), col(leftTs).as("__ts"),
      lit(1).as("__probe"), lit(null).cast(pkType).as("__rpk"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    // null-key/null-ts candidates can never be picked (SQL as-of
    // semantics) — and under ts desc ordering a null would otherwise
    // sort into scan range, so drop them before the union
    val cands = rRows
      .filter(rSpell.isNotNull && col(rightTs).isNotNull)
      .select(
        rSpell.as("__jk"), col(rightTs).as("__ts"),
        lit(0).as("__probe"), col(rightPk).as("__rpk"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    val u = probes.unionByName(cands)
    val picked = direction match {
      case "backward" | "forward" =>
        u.withColumn("__m", bound(pickOver(u, direction), col("__ts")))
      case "nearest" =>
        // both directional picks over ONE exchange (same partition key,
        // two sorts), each tolerance-bounded, then the nearer |Δts| wins
        // with distance ties resolved BACKWARD. Distance needs numbers:
        // micros for timestamps, epoch days for dates, an exact decimal
        // cast for numerics — anything else fails HERE, at build/refresh
        // plan time, mirroring the native operator's timeAsLong fail-fast
        // (a string ts would otherwise cast to NULL distances under
        // non-ANSI mode and silently always pick the forward candidate).
        val toNum: Column => Column =
          rRows.schema(rightTs).dataType match {
            case TimestampType | TimestampNTZType => c => unix_micros(c.cast(TimestampType))
            case DateType => c => unix_date(c.cast(DateType)).cast("long")
            case _: NumericType => c => c.cast("decimal(38,6)")
            case other => throw new IllegalArgumentException(
              s"as-of view '$name': direction='nearest' needs a timestamp, " +
                s"date or numeric ts column for the |distance| compare, " +
                s"got $other for '$rightTs'")
          }
        val mb = bound(pickOver(u, "backward"), col("__ts"))
        val mf = bound(pickOver(u, "forward"), col("__ts"))
        val db = abs(toNum(col("__ts")) - toNum(col("__mb").getField(rightTs)))
        val df_ = abs(toNum(col("__mf").getField(rightTs)) - toNum(col("__ts")))
        u.withColumn("__mb", mb).withColumn("__mf", mf)
          .withColumn("__m",
            when(col("__mb").isNotNull && (col("__mf").isNull || db <= df_),
              col("__mb")).otherwise(col("__mf")))
    }
    picked.filter(col("__probe") === 1)
      // a probe with a null key part or null ts never matches: take the
      // null pad regardless of what the window scan ran into
      .withColumn("__m",
        when(col("__jk").isNull || col("__ts").isNull, lit(null).cast(rType))
          .otherwise(col("__m")))
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Materialize the stored views from the base inputs (epoch 0 each —
    * the one full-scan moment). */
  def build(left: DataFrame, right: DataFrame): Unit = {
    store.materialize(leftIdx, left)
    store.materialize(rightIdx, right)
    val joined = asofPick(left, right)
    if (!rightKeyed) store.materialize(joinIdx, joined)
    else {
      val j = joined.persist() // feeds both materializations once
      store.materialize(joinIdx, j)
      store.materialize(byRightIdx, j.filter(col(rightPk).isNotNull))
      j.unpersist()
    }
  }

  /** Apply a LEFT-side change batch: upserted rows re-pick against only
    * the right buckets holding their join keys (every row emits — the
    * left-outer pad covers no-match); deletes tombstone by ownership. */
  def refreshLeft(ups: DataFrame, dels: Option[DataFrame]): RefreshStats = {
    store.refresh(leftIdx, ups, dels)
    val rRows = store.getAll(rightIdx.name,
        expandKeys(ups.select(lSpell.as("emit_key")).distinct()))
      .select(col("emit_value.*"))
    val picked = asofPick(ups, rRows)
    if (!rightKeyed)
      store.refresh(joinIdx, picked, dels.map(_.toDF("src_key")))
    else {
      val p = picked.persist() // feeds both views' refreshes once
      val stats = store.refresh(joinIdx, p, dels.map(_.toDF("src_key")))
      refreshByRight(p, dels)
      p.unpersist()
      stats
    }
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
    if (!rightKeyed) store.refresh(joinIdx, changed, None)
    else {
      val c = changed.persist() // feeds both views' refreshes once
      val stats = store.refresh(joinIdx, c, None)
      refreshByRight(c, None)
      c.unpersist()
      stats
    }
  }

  /** The maintained as-of join relation (original input columns; right
    * columns null where no candidate was eligible). */
  def df: DataFrame = store.df(name).select(col("emit_value.*"))

  /** Bucket-pruned read of the joined rows for a set of SPELLED join
    * keys ([[CompositeKey.spell]]). */
  def byKeys(keys: DataFrame): DataFrame =
    store.getAll(name, expandKeys(keys)).select(col("emit_value.*"))

  /** Bucket-pruned read of the joined rows ATTRIBUTED TO a set of RIGHT
    * pks (one-column relation of right-pk strings) — "all facts whose
    * pick is click X" as a point lookup over the right-keyed twin, no
    * view scan. Requires `rightKeyed = true`. */
  def byRightKeys(keys: DataFrame): DataFrame = {
    require(rightKeyed,
      s"as-of view '$name' was not built with rightKeyed = true")
    store.getAll(byRightName,
        CompositeKey.expand(store.spark, keys, saltBuckets))
      .select(col("emit_value.*"))
  }

  /** [[KeyAddressable]] surface: the spelled left join key over the
    * relation's output columns, and the salt-stripper for stored
    * (CDC) emit keys — downstream key-scoped consumers read this
    * relation bucket-pruned without knowing its spelling. */
  override def spelledKey: org.apache.spark.sql.Column = lSpell
  override def unsaltKey(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column = unsalt(k)

  def epoch: Int = store.epoch(name)

  /** CDC feed of the as-of join view over (fromEpoch, toEpoch]. */
  def changes(fromEpoch: Int, toEpoch: Int): DataFrame =
    store.changesBetween(name, fromEpoch, toEpoch)
}
