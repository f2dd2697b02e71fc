package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.engine.ViewStore

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
 *     a semi-join on ONE endpoint collects the whole induced edge set,
 *     [[Components.resolve]] relabels exactly the dirty region, and nodes
 *     left edgeless by deletions drop out of the labeling — matching the
 *     from-scratch semantics (only nodes appearing in pairs are labeled).
 *
 * Scale shape: the delta and the affected components bound the recompute —
 * O(dirty region) resolution work instead of O(graph) rounds — while the
 * stored labeling pays one tagged scan (membership joins against the
 * small dirty set broadcast by AQE) and the pair relation one semi-join
 * scan, both linear reads of sparse relations, no wide shuffle. Each
 * refresh persists its own `(doc_id, component)` CDC sidecar, so a
 * further-downstream consumer (keeper choice, cluster stats) can maintain
 * ITS state from this view's O(delta) feed in turn.
 */
final class ComponentsIndex(
    val spark: SparkSession,
    /** labeling lives here (flat versioned store, CDC sidecars) */
    val flat: ViewStore,
    val name: String) {

  private val compName = s"${name}_comp"

  /** Whether [[build]] has run. */
  def isBuilt: Boolean = flat.latestVersion(compName).isDefined

  /** The maintained labeling `(doc_id, component)`, component = minimum
    * reachable doc_id — clustered by component, so per-cluster reads
    * prune by file min/max. */
  def components: DataFrame = spark.read.parquet(flat.latestPath(compName))

  /** The labeling's own change feed over `(from, to]`. */
  def changes(fromVersion: Int, toVersion: Int): DataFrame =
    flat.changesBetween(compName, fromVersion, toVersion)

  /** Full build: resolve `pairs` from scratch and store the labeling
    * (the build is its own `insert` delta). */
  def build(pairs: DataFrame): Unit = {
    val comp = Components.resolve(pairs.select("i", "j"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try flat.writeClustered(compName, comp, Seq("component", "doc_id"),
      Some(comp.withColumn("change_type", lit("insert"))))
    finally { comp.unpersist(blocking = false); () }
  }

  /**
   * Apply one pair-graph change batch. `pairDelta` is the edge CDC
   * (`i`, `j`, `change_type` ∈ insert|delete — the gross feed from
   * [[PairGraphIndex.pairsChanges]] works as-is: a delete+insert of the
   * same edge only widens the dirty set, never corrupts it); `newPairs`
   * is the pair relation AFTER the batch. Exact per the class doc.
   */
  def refresh(pairDelta: DataFrame, newPairs: DataFrame): Unit = {
    val endpoints = pairDelta.select(col("i").as("doc_id"))
      .unionByName(pairDelta.select(col("j").as("doc_id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val old = components
    // labels touched by the delta (brand-new nodes have none yet)
    val affected = old.join(endpoints, Seq("doc_id"), "left_semi")
      .select("component").distinct()
    val dirty = old.join(affected, Seq("component"), "left_semi")
      .select("doc_id")
      .unionByName(endpoints).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // induced current-edge set — closed under one-endpoint semi-join
      // (see class doc), so this never misses a dirty-region edge
      val subEdges = newPairs.select("i", "j")
        .join(dirty.select(col("doc_id").as("i")), Seq("i"), "left_semi")
      val sub = Components.resolve(subEdges)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // one tagged scan of the stored labeling: clean rows kept, dirty
      // rows retracted (the CDC's delete side) and replaced by `sub`
      val tagged = old
        .join(dirty.select(col("doc_id"), lit(1).as("d")), Seq("doc_id"), "left_outer")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val keep = tagged.filter(col("d").isNull).select("doc_id", "component")
      val retracted = tagged.filter(col("d").isNotNull).select("doc_id", "component")
      val cdc = retracted.withColumn("change_type", lit("delete"))
        .unionByName(sub.withColumn("change_type", lit("insert")))
      flat.writeClustered(compName, keep.unionByName(sub),
        Seq("component", "doc_id"), Some(cdc))
      tagged.unpersist(blocking = false)
      sub.unpersist(blocking = false)
    } finally {
      dirty.unpersist(blocking = false)
      endpoints.unpersist(blocking = false)
      ()
    }
  }
}
