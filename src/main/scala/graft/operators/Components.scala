package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Connected components over an undirected pair graph `(i, j)` by min-label
 * propagation: every node starts labeled with itself; each round a node
 * takes the minimum label among itself and its neighbors; convergence when
 * no label changes. Rounds needed = graph diameter — near-dup clusters are
 * small and shallow, so this converges in a few rounds.
 *
 * Scale shape: each round is one shuffle-join (edges × labels) plus one
 * aggregation; labels are persisted per round and the previous round is
 * unpersisted, so lineage stays bounded. The convergence check moves ONE
 * scalar to the driver per round. (For web-scale graphs with deep
 * components, the large-star/small-star variant halves round counts;
 * dedup clusters do not need it.)
 */
object Components {

  /** `(doc_id, component)` for every node of `pairs`, where component =
    * the minimum doc_id reachable from the node. Throws if `maxIter`
    * rounds pass without convergence (a graph deeper than expected) —
    * silently returning half-propagated labels would be a wrong answer. */
  def minLabel(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // persist the directed pairs BEFORE symmetrizing: the union would
    // otherwise evaluate the (possibly expensive) pair-producing plan
    // once per branch
    val edges = pairs.toDF("i", "j").persist(StorageLevel.MEMORY_AND_DISK)
    // symmetric edge list, one direction per row
    val sym = edges.select(col("i").as("a"), col("j").as("b"))
      .union(edges.select(col("j").as("a"), col("i").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // labels carry (node, prev, label) so the convergence count reads the
    // same persisted relation the next round joins against — two jobs per
    // round (propagation, scalar count), bounded lineage via per-round
    // persist/unpersist
    var labels = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("prev"), col("node").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighborMin = sym
        .join(labels, sym("b") === labels("node"))
        .groupBy(col("a")).agg(min("label").as("nlabel"))
      val next = labels
        .join(neighborMin, labels("node") === neighborMin("a"), "left")
        .select(col("node"), col("label").as("prev"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.filter(col("label") =!= col("prev")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      it += 1
    }
    sym.unpersist(); edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter — raise it)")
    // final labels stay persisted: the caller consumes them next, and the
    // ContextCleaner reclaims the cache when the DataFrame drops out of scope
    labels.select(col("node").as("doc_id"), col("label").as("component"))
  }
}
