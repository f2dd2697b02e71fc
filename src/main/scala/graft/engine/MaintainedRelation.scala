package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Catch a DOWNSTREAM [[JoinView]] — one whose LEFT input is THIS
    * relation's rows (same primary key) — up to this relation's state
    * by replaying this relation's CDC feed over `(fromEpoch, toEpoch]`:
    * the generic cascade, available from ANY maintained relation — a
    * join over a join (the three-way chain), over a SEMI/ANTI view
    * ("live customers' orders ⋈ priority dim, maintained end to end"),
    * or over an AS-OF view (attribution rows ⋈ a campaign dim). Net per
    * source key: a key with an insert in the feed is an upsert
    * (refreshLeft's ownership retraction covers its old outputs), a key
    * with deletes only is a tombstone. Replay is O(delta at this
    * level); the downstream refresh is its ordinary bucket-pruned
    * ΔL⋈R′. Padded relations ([[padsRight]]) cannot cascade left-keyed:
    * their pad rows are owned by the RIGHT pk and have a null left key.
    */
  def cascadeInto(next: JoinView, fromEpoch: Int, toEpoch: Int): BucketedViewStore.RefreshStats = {
    require(!padsRight,
      s"maintained relation '$name' pads right rows (null left keys, " +
        "right-pk ownership) and cannot feed a left-keyed cascade")
    require(next.leftPk == srcPk,
      s"downstream join view '${next.name}' keys its left side by " +
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
