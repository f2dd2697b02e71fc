package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.MapIndex.emit
import graft.engine.BucketedViewStore.RefreshStats

/** An incrementally-maintained SEMI / ANTI join view — "left rows that
  * DO (semi) / do NOT (anti) have a match on the right", each left row
  * emitted at most once regardless of match multiplicity (the EXISTS /
  * NOT EXISTS surface: "orders of live customers", "orders orphaned by
  * a customer purge"). The reference has no joins at all (SURVEY.md
  * §2.2); [[JoinView]] covers the four outer shapes — this is the
  * remaining pair, whose delta rule is a MEMBERSHIP FLIP rather than a
  * row rewrite: a right-side change cannot alter a served row's
  * payload, only whether its left row is in or out.
  *
  * Layout mirrors [[JoinView]]: `name__left` (left rows keyed by the
  * join key), `name__right` (right KEYS keyed by the join key — the
  * payload is irrelevant to membership, so only `(pk, jk)` is stored:
  * at 100 TB the membership side is two columns, not the table), and
  * `name` (the passing left rows, src_key = left pk, emit key = jk).
  *
  * JOIN KEYS may be COMPOSITE ([[JoinKey]], same arity both sides): the
  * stored membership keys and emit keys are the [[CompositeKey]]
  * spelling — escaped and injective, so a part containing U+0001 can
  * neither truncate nor collide — and the membership test compares the
  * spelled keys (tuple equality ⟺ spelled equality for non-null parts).
  *
  * Delta rules — O(|delta| · key fanout), bucket-pruned:
  *  - LEFT batch: each upserted row's membership is decided against
  *    only the right buckets holding its join key; failing rows emit
  *    nothing and their old outputs retract via an explicit tombstone
  *    (ownership delete-then-insert can't cover a row that no longer
  *    emits).
  *  - RIGHT batch: the sidecar's dirty join keys name every left row
  *    whose membership MIGHT flip; those rows re-check against the
  *    post-batch right keys — newly-passing rows insert, newly-failing
  *    rows tombstone. A right change at an untouched key flips nothing
  *    and costs nothing.
  *
  * Join keys must be non-null on both sides (SQL's EXISTS never
  * matches a null key; a null key also cannot address a store bucket),
  * so this implements the non-null-key EXISTS/NOT-EXISTS semantics.
  * As a [[MaintainedRelation]] the view feeds downstream incremental
  * consumers (a rollup over "orders of live customers" folds its CDC).
  */
final class FilterJoinView(
    val store: BucketedViewStore,
    val name: String,
    val leftPk: String, leftJk: JoinKey, leftCols: Seq[String],
    rightPk: String, rightJk: JoinKey,
    mode: String,
    saltBuckets: Int = 1) extends MaintainedRelation with LeftKeyedConsumer with KeyAddressable {

  require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
  require(Set("semi", "anti")(mode),
    s"mode must be 'semi' or 'anti', got '$mode'")
  require(leftCols.contains(leftPk) && leftJk.parts.forall(leftCols.contains),
    s"leftCols must carry the pk '$leftPk' and join key $leftJk")
  require(leftJk.size == rightJk.size,
    s"join keys must have the same arity: $leftJk vs $rightJk")

  override def srcPk: String = leftPk

  private val passType = if (mode == "semi") "left_semi" else "left_anti"

  // SKEW: `saltBuckets = S > 1` shards every emit key by a salt derived
  // from the row's own pk (the [[JoinView]] hardening) so a hot join
  // key's rows spread over ~S buckets; membership is storage-independent
  // (the semi/anti join runs on the read rows' spelled key columns).
  private def lSpell = CompositeKey.spellNames(leftJk)
  private def rSpell = CompositeKey.spellNames(rightJk)
  private def expandKeys(keys: DataFrame): DataFrame =
    CompositeKey.expand(store.spark, keys, saltBuckets)
  private def unsalt(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    CompositeKey.unsalt(k, leftJk.size, saltBuckets)

  private def leftIdx = MapIndex.columns(s"${name}__left")(
    col(leftPk).cast("string"),
    array(emit(CompositeKey.salted(lSpell, col(leftPk), saltBuckets, leftJk.size),
      struct(leftCols.map(col): _*))))

  // internal aliases keep the stored struct legal when the right pk IS
  // the join key (the customer-dimension case: pk == jk == c_custkey);
  // __rjk is the SPELLED key, so membership is one string compare
  // whatever the key arity
  private def rightIdx = MapIndex.columns(s"${name}__right")(
    col(rightPk).cast("string"),
    array(emit(CompositeKey.salted(rSpell, col(rightPk), saltBuckets, rightJk.size),
      struct(col(rightPk).as("__rpk"), rSpell.as("__rjk")))))

  private def viewIdx = MapIndex.columns(name)(
    col(leftPk).cast("string"),
    array(emit(CompositeKey.salted(lSpell, col(leftPk), saltBuckets, leftJk.size),
      struct(leftCols.map(col): _*))))

  /** The left rows of `lRows` passing the membership test against
    * `keys`, a one-column `__rjk` relation of SPELLED right join keys. */
  private def passing(lRows: DataFrame, keys: DataFrame): DataFrame =
    lRows.join(keys.select(col("__rjk")).distinct(),
      lSpell === col("__rjk"), passType)

  def build(left: DataFrame, right: DataFrame): Unit = {
    store.materialize(leftIdx, left)
    store.materialize(rightIdx, right)
    store.materialize(viewIdx,
      passing(left, right.select(rSpell.as("__rjk"))))
  }

  /** LEFT batch: upserts decide membership against only their keys'
    * right buckets; non-passing upserts and deletes tombstone. */
  def refreshLeft(ups: DataFrame, dels: Option[DataFrame]): RefreshStats = {
    store.refresh(leftIdx, ups, dels)
    val rKeys = store.getAll(rightIdx.name,
        expandKeys(ups.select(lSpell.as("emit_key")).distinct()))
      .select(col("emit_value.*"))
    val pass = passing(ups, rKeys)
    val out = ups.select(col(leftPk).cast("string").as("src_key")).distinct()
      .join(pass.select(col(leftPk).cast("string").as("src_key")).distinct(),
        Seq("src_key"), "left_anti")
    val allDels = dels.map(_.toDF("src_key").unionByName(out)).getOrElse(out)
    store.refresh(viewIdx, pass, Some(allDels))
  }

  /** RIGHT batch: the sidecar's dirty keys re-check exactly the left
    * rows whose membership might flip — and only rows that ACTUALLY
    * flipped are written: newly-passing rows diff against the stored
    * membership, newly-failing tombstones are scoped to currently-served
    * rows. A right change that flips nobody (a second match arriving, a
    * redundant match leaving) rewrites zero view buckets and emits an
    * empty CDC delta — membership noise never reaches a downstream
    * consumer. */
  def refreshRight(ups: DataFrame, dels: Option[DataFrame]): RefreshStats = {
    store.refresh(rightIdx, ups, dels)
    val e = store.epoch(rightIdx.name)
    val dirtyJk = store.changesBetween(rightIdx.name, e - 1, e)
      .select(unsalt(col("emit_key")).as("emit_key")).distinct()
    val lRows = store.getAll(leftIdx.name, expandKeys(dirtyJk))
      .select(col("emit_value.*"))
    val rKeys = store.getAll(rightIdx.name, expandKeys(dirtyJk))
      .select(col("emit_value.*"))
    val served = store.getAll(name, expandKeys(dirtyJk))
      .select(col("src_key")).distinct()
    val pass = passing(lRows, rKeys)
    val passKeys = pass.select(col(leftPk).cast("string").as("src_key")).distinct()
    val newlyIn = pass.join(served,
      col(leftPk).cast("string") === col("src_key"), "left_anti")
    val newlyOut = served.join(passKeys, Seq("src_key"), "left_anti")
    store.refresh(viewIdx, newlyIn, Some(newlyOut))
  }

  /** The maintained filtered relation (original left columns). */
  def df: DataFrame = store.df(name).select(col("emit_value.*"))

  /** Bucket-pruned read for a set of SPELLED join keys. */
  def byKeys(keys: DataFrame): DataFrame =
    store.getAll(name, expandKeys(keys)).select(col("emit_value.*"))

  /** [[KeyAddressable]] surface: the spelled left join key over the
    * relation's output columns, and the salt-stripper for stored
    * (CDC) emit keys — downstream key-scoped consumers read this
    * relation bucket-pruned without knowing its spelling. */
  override def spelledKey: org.apache.spark.sql.Column = lSpell
  override def unsaltKey(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column = unsalt(k)

  def epoch: Int = store.epoch(name)

  def changes(fromEpoch: Int, toEpoch: Int): DataFrame =
    store.changesBetween(name, fromEpoch, toEpoch)
}
