package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The CONSUMER half of the cascade contract: any maintained view that
  * takes left-side change batches keyed by a left primary key — the
  * whole maintained-join family ([[JoinView]], [[FilterJoinView]],
  * [[AsOfJoinView]]) exposes exactly this `refreshLeft(ups, dels)`
  * surface, so a cascade can replay an upstream relation's CDC into a
  * join, a SEMI/ANTI membership filter, or an as-of pick without caring
  * which it is ("live customers' enriched orders, maintained end to
  * end" = semi OVER join; "attribution over a maintained join" = as-of
  * OVER join). */
trait LeftKeyedConsumer {
  /** The consumer's view name (error messages, store addressing). */
  def name: String

  /** The primary-key column the consumer's LEFT rows are owned by —
    * what an upstream cascade must replay by. */
  def leftPk: String

  /** Apply a LEFT-side change batch (upserted rows + tombstoned left
    * pks — the store's ordinary refresh contract). */
  def refreshLeft(ups: DataFrame, dels: Option[DataFrame]): BucketedViewStore.RefreshStats
}

/** A maintained relation whose output rows are ADDRESSABLE by their
  * (spelled) join key — the serving half of the maintained-join family:
  * every member stores its output clustered by the join key, so a
  * downstream consumer can read exactly one key group's rows
  * bucket-pruned ([[byKeys]]) instead of scanning the relation. The
  * spelling/salting details stay inside the view; consumers only need
  * the three operations here. */
trait KeyAddressable {
  /** Bucket-pruned read of the relation's output rows for a one-column
    * relation of SPELLED join keys ([[CompositeKey.spell]] — the raw
    * string for single-column keys). */
  def byKeys(keys: DataFrame): DataFrame

  /** The spelled join key as a column over the relation's OUTPUT
    * columns (what [[byKeys]] addresses by). */
  def spelledKey: org.apache.spark.sql.Column

  /** Strip any salt shard off a STORED emit key (CDC feeds carry the
    * salted spelling) → the spelled base key [[byKeys]] accepts. */
  def unsaltKey(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column
}

/** A maintained relation living in a [[BucketedViewStore]]: a current
  * snapshot plus an epoch-numbered CDC feed. This is the contract a
  * downstream incremental consumer (e.g. [[JoinAggView]]) needs — it
  * never cares HOW the relation is maintained (equi-join delta rules,
  * as-of re-pick, membership flips, cascade replay), only that every
  * refresh lands a sidecar it can fold. The reference's cascade (O17,
  * `/root/reference/index.js:250-253`) keys one index's output into
  * another; this trait is that producer side made explicit so any
  * maintained view can sit upstream of any incremental consumer.
  */
trait MaintainedRelation {
  /** The store holding the relation (consumers co-locate state here). */
  def store: BucketedViewStore

  /** The relation's view name in the store. */
  def name: String

  /** The source-key (primary-key) column owning this relation's rows —
    * what a downstream left-keyed consumer replays by. */
  def srcPk: String

  /** Current epoch (number of refreshes since build). */
  def epoch: Int

  /** Current snapshot (original input columns). */
  def df: DataFrame

  /** CDC feed over `(fromEpoch, toEpoch]` in the store's sidecar schema
    * (`src_key`, `emit_key`, `emit_value`, `change_type`,
    * `change_version`). */
  def changes(fromEpoch: Int, toEpoch: Int): DataFrame

  /** Does the relation split its rows across an owned view plus a
    * right-pad twin (full/right-outer [[JoinView]])? Consumers must
    * then fold [[rpadChanges]] alongside [[changes]]. */
  def padsRight: Boolean = false

  /** CDC feed of the right-pad twin (only when [[padsRight]]). */
  def rpadChanges(fromEpoch: Int, toEpoch: Int): DataFrame =
    throw new UnsupportedOperationException(
      s"maintained relation '$name' has no right-pad twin")

  /** Catch a DOWNSTREAM left-keyed consumer — one whose LEFT input is
    * THIS relation's rows (same primary key) — up to this relation's
    * state by replaying this relation's CDC feed over `(fromEpoch,
    * toEpoch]`: the generic cascade, available from ANY maintained
    * relation into ANY [[LeftKeyedConsumer]] — a join over a join (the
    * three-way chain), a SEMI/ANTI membership filter over a join ("live
    * customers' enriched orders, maintained end to end"), an as-of pick
    * over a join, or any of those over a semi/anti/as-of producer. Net
    * per source key: a key with an insert in the feed is an upsert
    * (refreshLeft's ownership retraction covers its old outputs), a key
    * with deletes only is a tombstone. Replay is O(delta at this
    * level); the downstream refresh is its ordinary bucket-pruned
    * delta rule. Padded relations ([[padsRight]]) cannot cascade
    * left-keyed: their pad rows are owned by the RIGHT pk and have a
    * null left key.
    */
  def cascadeInto(next: LeftKeyedConsumer, fromEpoch: Int, toEpoch: Int): BucketedViewStore.RefreshStats = {
    require(!padsRight,
      s"maintained relation '$name' pads right rows (null left keys, " +
        "right-pk ownership) and cannot feed a left-keyed cascade")
    require(next.leftPk == srcPk,
      s"downstream consumer '${next.name}' keys its left side by " +
        s"'${next.leftPk}', not this relation's left pk '$srcPk'")
    val feed = changes(fromEpoch, toEpoch)
    // resolve the gross feed to each key's FINAL state (the replayDelta
    // rule: a refresh retracts changed keys wholesale, so only the last
    // touching version's inserts survive a multi-epoch replay — feeding
    // both an e1 and an e2 version of one key downstream would double it)
    val lastV = feed.groupBy("src_key").agg(max("change_version").as("change_version"))
    val ups = feed.join(lastV, Seq("src_key", "change_version"))
      .filter(col("change_type") === "insert")
      .select(col("emit_value.*"))
    val upsKeys = ups.select(col(srcPk).cast("string").as("src_key")).distinct()
    val delKeys = feed.select("src_key").distinct()
      .join(upsKeys, Seq("src_key"), "left_anti")
    next.refreshLeft(ups, Some(delKeys))
  }
}
