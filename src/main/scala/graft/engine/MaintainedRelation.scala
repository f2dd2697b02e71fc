package graft.engine

import org.apache.spark.sql.DataFrame

/** A maintained relation living in a [[BucketedViewStore]]: a current
  * snapshot plus an epoch-numbered CDC feed. This is the contract a
  * downstream incremental consumer (e.g. [[JoinAggView]]) needs — it
  * never cares HOW the relation is maintained (equi-join delta rules,
  * as-of re-pick, cascade replay), only that every refresh lands a
  * sidecar it can fold. The reference's cascade (O17,
  * `/root/reference/index.js:250-253`) keys one index's output into
  * another; this trait is that producer side made explicit so any
  * maintained view can sit upstream of any incremental consumer.
  */
trait MaintainedRelation {
  /** The store holding the relation (consumers co-locate state here). */
  def store: BucketedViewStore

  /** The relation's view name in the store. */
  def name: String

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
}
