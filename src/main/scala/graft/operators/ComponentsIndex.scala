package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.engine.{BucketedViewStore, MapIndex}
import graft.engine.BucketedViewStore.RefreshStats
import graft.engine.MapIndex.emit

/**
 * EXACT incremental maintenance of the connected-components labeling over
 * a maintained pair graph — the engine's compute-on-write thesis
 * (SURVEY §4.1) pushed one relation further downstream: `dedup_components`
 * resolves the STORED pair view per query; this class stores the labeling
 * `(doc_id, component)` itself and updates it from the pair graph's
 * edge-level CDC ([[PairGraphIndex.pairsChanges]]), re-resolving only the
 * components an edge change can actually touch.
 *
 * Exactness argument. Components are defined solely by the edge set, so a
 * node's final component can differ from its stored one only if its OLD
 * component gains or loses an edge, or a NEW edge attaches to it:
 *   - every changed edge (inserted or deleted) has its endpoints in the
 *     delta; the AFFECTED labels are those endpoints' stored labels
 *     (endpoints absent from the store are brand-new nodes),
 *   - the DIRTY node set = all members of affected components ∪ the delta
 *     endpoints themselves. A clean node's component contains no changed
 *     edge and no changed edge reaches it (an edge reaching it would make
 *     its endpoint — a member of the clean component — dirty), so its
 *     membership and label (component minimum) are provably unchanged.
 *   - the dirty-induced subgraph is CLOSED under the current edge set: a
 *     current edge `(u, v)` with dirty `u` has dirty `v` too — either the
 *     edge is newly inserted (both endpoints are delta endpoints) or it
 *     already existed, putting `u` and `v` in the same old component. So
 *     the edges incident to the dirty set ARE the dirty region's full
 *     induced edge set, [[Components.resolve]] relabels exactly the dirty
 *     region, and nodes left edgeless by deletions drop out of the
 *     labeling — matching the from-scratch semantics (only nodes
 *     appearing in pairs are labeled).
 *
 * Scale shape — every step is bucket-pruned against the dirty region:
 * the endpoints' labels and the affected components' member lists are
 * [[BucketedViewStore.getAll]] reads (the labeling emits under both a
 * `d:<doc_id>` key and a `c:<component>` key, so both lookup directions
 * prune); the dirty region's edges come from the pair graph's own
 * endpoint-keyed view ([[PairGraphIndex.incidentPairs]]); and the
 * labeling rewrite is the store's delete-then-insert over the dirty
 * docs' source keys — touched buckets only, never an O(labels) snapshot
 * rewrite. Each refresh's CDC sidecar is the labeling's own O(delta)
 * change feed, so a further-downstream consumer (keeper choice, cluster
 * stats) maintains ITS state from this view's feed in turn.
 */
final class ComponentsIndex(
    val spark: SparkSession,
    /** labeling lives here — a bucketed map view keyed by doc_id. */
    val store: BucketedViewStore,
    val name: String) {

  private val compName = s"${name}_comp"

  /** The labeling as a bucketed map view. Source key = doc_id (each doc
    * owns exactly one label row — single-owner, so the store's ordinary
    * delete-then-insert maintains it). Two emissions per labeled doc,
    * both carrying the full `(doc_id, component)` row:
    *   - `d:<doc_id>` — label lookup by doc (and the canonical
    *     projection of the relation),
    *   - `c:<component>` — membership lookup by component, the inverse
    *     direction [[refresh]] needs to collect an affected component's
    *     members without scanning the labeling.
    * A dirty doc's refresh rewrites its `d:` bucket and its old + new
    * components' `c:` buckets — I/O proportional to the dirty region. */
  private val labelIdx = MapIndex.columns(compName)(
    col("doc_id").cast("string"),
    array(
      emit(concat(lit("d:"), col("doc_id").cast("string")),
        struct(col("doc_id"), col("component"))),
      emit(concat(lit("c:"), col("component").cast("string")),
        struct(col("doc_id"), col("component")))))

  private def dSide(rows: DataFrame): DataFrame =
    rows.filter(col("emit_key").startsWith("d:"))
      .select(col("emit_value.doc_id").as("doc_id"),
        col("emit_value.component").as("component"))

  /** Whether [[build]] has run. */
  def isBuilt: Boolean = store.manifest(compName).nonEmpty

  /** The maintained labeling `(doc_id, component)`, component = minimum
    * reachable doc_id. */
  def components: DataFrame = dSide(store.df(compName))

  /** Current refresh epoch of the stored labeling (0 = [[build]]). */
  def epoch: Int = store.epoch(compName)

  /** The labeling as of a retained refresh epoch (time travel). */
  def componentsAt(atEpoch: Int): DataFrame = dSide(store.dfAsOf(compName, atEpoch))

  /** The labeling's own change feed over `(from, to]`. */
  def changes(fromVersion: Int, toVersion: Int): DataFrame =
    store.changesBetween(compName, fromVersion, toVersion)
      .filter(col("emit_key").startsWith("d:"))
      .select(col("emit_value.doc_id").as("doc_id"),
        col("emit_value.component").as("component"),
        col("change_type"), col("change_version"))

  /** Full build: resolve `pairs` from scratch and store the labeling.
    * Rebuilding over an existing labeling goes through the store's
    * rebuild path (full-retraction sidecar — CDC stays contiguous). */
  def build(pairs: DataFrame): Unit =
    store.materialize(labelIdx, Components.resolve(pairs.select("i", "j")))

  /**
   * Apply one pair-graph change batch. `pairDelta` is the edge CDC
   * (`i`, `j`, `change_type` ∈ insert|delete — the gross feed from
   * [[PairGraphIndex.pairsChanges]] works as-is: a delete+insert of the
   * same edge only widens the dirty set, never corrupts it);
   * `incidentPairs` maps a single-column doc-id relation to the CURRENT
   * edges with at least one endpoint in it — pass
   * [[PairGraphIndex.incidentPairs]] for the bucket-pruned read, or use
   * the DataFrame overload below to derive it from a full pair relation.
   * Exact per the class doc. Returns the labeling store's refresh stats
   * (touched buckets — the partition-scoped I/O claim, spec-asserted).
   */
  def refresh(pairDelta: DataFrame,
      incidentPairs: DataFrame => DataFrame): RefreshStats = {
    val endpoints = pairDelta.select(col("i").as("doc_id"))
      .unionByName(pairDelta.select(col("j").as("doc_id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dirty: DataFrame = null
    try {
      // labels touched by the delta (brand-new nodes have none yet) —
      // then their components' full membership, both bucket-pruned reads
      val affected = store.getAll(compName,
          endpoints.select(concat(lit("d:"), col("doc_id").cast("string"))))
        .select(col("emit_value.component").as("component")).distinct()
      val members = store.getAll(compName,
          affected.select(concat(lit("c:"), col("component").cast("string"))))
        .select(col("emit_value.doc_id").as("doc_id"))
      dirty = endpoints.unionByName(members).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      // induced current-edge set — incident edges to the dirty set are
      // closed under it (see class doc), so resolving them relabels
      // exactly the dirty region; dirty docs absent from `sub` (left
      // edgeless by deletions) tombstone out via the delete keys
      val sub = Components.resolve(incidentPairs(dirty).select("i", "j"))
      store.refresh(labelIdx, sub,
        Some(dirty.select(col("doc_id").cast("string").as("src_key"))))
    } finally {
      if (dirty != null) dirty.unpersist(blocking = false)
      endpoints.unpersist(blocking = false)
      ()
    }
  }

  /** [[refresh]] for callers holding the full post-batch pair relation:
    * the incident-edge read is a semi-join on ONE endpoint (sufficient
    * by the closure argument — any current edge touching a dirty node
    * has both endpoints dirty). */
  def refresh(pairDelta: DataFrame, newPairs: DataFrame): RefreshStats =
    refresh(pairDelta, (dirty: DataFrame) =>
      newPairs.select("i", "j")
        .join(dirty.select(col(dirty.columns.head).as("i")), Seq("i"), "left_semi"))
}
