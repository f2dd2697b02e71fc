package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Connected components over an undirected pair graph `(i, j)` by min-label
 * propagation with pointer jumping: every node starts labeled with itself;
 * each round a node takes the minimum label among itself and its
 * neighbors, then shortcuts through its label's own label
 * (`label ← label(label)`, the pointer-jumping step), so label distance
 * to the component minimum roughly halves per round. Convergence when no
 * label changes — O(log diameter) rounds, so a pathological 1000-link
 * chain resolves in ~11 rounds instead of hitting the `maxIter` guard.
 *
 * Scale shape: each round is two shuffle-joins (edges × labels for the
 * neighbor minimum, labels × labels for the jump) plus one aggregation;
 * labels are persisted per round and the previous round is unpersisted,
 * so lineage stays bounded. The convergence check moves ONE scalar to
 * the driver per round.
 */
object Components {

  /** `(doc_id, component)` for every node of `pairs`, where component =
    * the minimum doc_id reachable from the node. Throws if `maxIter`
    * rounds pass without convergence (a graph deeper than expected) —
    * silently returning half-propagated labels would be a wrong answer.
    *
    * Callers with an expensive pair-producing plan should materialize it
    * first (persist + count, or localCheckpoint): the symmetrizing union
    * below evaluates the input plan once per branch, and every round's
    * join re-reads it. The returned DataFrame is eagerly materialized
    * with its lineage truncated, and every cache this loop created is
    * unpersisted before returning — a still-persisted result would squat
    * on executor memory and contaminate whatever runs next. */
  def minLabel(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    val edges = pairs.toDF("i", "j")
    // size the loop's shuffle width by GRAPH size, not the session
    // default: the near-dup pair graph is a sliver of the corpus, and
    // every round is two jobs whose constant cost scales with task
    // count (at bench scale, 32-wide shuffles of a few hundred edges
    // dominated the loop's wall-clock). ~500k edges per partition; the
    // caller has typically materialized `pairs`, so this count is a
    // cache read. Also clamp nonzero: repartition(0) is illegal.
    val nEdges = edges.count()
    val spark = edges.sparkSession
    val parts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      nEdges / 500000L + 1L)).toInt
    // AQE re-plans every shuffle stage — the right trade for one big
    // query, pure per-round latency for an iterative loop over a small
    // graph (measured 2.2 s vs 1.0 s for the same loop at bench scale).
    // Keep it for genuinely large graphs, where runtime skew handling
    // matters more than per-stage overhead.
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey, "true")
    val suspendAqe = nEdges < 10000000L && aqeWas == "true"
    if (suspendAqe) spark.conf.set(aqeKey, "false")
    try {
      // symmetric edge list, one direction per row, pre-partitioned by the
      // join key so every round's join re-reads it without re-shuffling
      val sym = edges.select(col("i").as("a"), col("j").as("b"))
        .union(edges.select(col("j").as("a"), col("i").as("b")))
        .repartition(parts, col("b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // labels carry (node, prev, label); every round ends in an EAGER
      // localCheckpoint, so the next round plans over a lineage-free
      // LogicalRDD. This is load-bearing, not hygiene: the pointer jump
      // references the round's relation twice, so without truncation the
      // logical plan DOUBLES per round and analysis cost goes exponential
      // (measured: a 64-link chain took 152 s; with truncation, under a
      // second per round). The previous round's checkpoint blocks are
      // freed explicitly once the new round is materialized.
      var labels = sym.select(col("a").as("node")).distinct()
        .select(col("node"), col("node").as("prev"), col("node").as("label"))
        .repartition(parts, col("node"))
        .localCheckpoint(true)
      var converged = false
      var it = 0
      while (!converged && it < maxIter) {
        val neighborMin = sym
          .join(labels, sym("b") === labels("node"))
          .groupBy(col("a")).agg(min("label").as("nlabel"))
        // persisted: the pointer jump below reads it twice (probe + build)
        val stepped = labels
          .join(neighborMin, labels("node") === neighborMin("a"), "left")
          .select(col("node"), col("label").as("prev"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // pointer jump: shortcut to the label's own (post-step) label.
        // Labels are always node ids of the same component, so the inner
        // self-join is total; jumped ≤ label by the monotone-decrease
        // invariant, and the fixpoint is unchanged (any non-minimal
        // converged labeling still has a decreasing edge somewhere).
        val jumped = stepped.select(col("node").as("jnode"), col("label").as("jlabel"))
        val next = stepped
          .join(jumped, stepped("label") === jumped("jnode"))
          .select(col("node"), col("prev"),
            least(col("label"), col("jlabel")).as("label"))
          .repartition(parts, col("node"))
          .localCheckpoint(true)
        val changed = next.filter(col("label") =!= col("prev")).count()
        stepped.unpersist(blocking = false)
        freeCheckpoint(labels)
        labels = next
        converged = changed == 0
        it += 1
      }
      sym.unpersist(blocking = false)
      if (!converged) {
        freeCheckpoint(labels)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds " +
            "(graph diameter exceeds maxIter — raise it)")
      }
      // checkpoint the (small) projected result before freeing the loop's
      // final round; the result is one row per node of the pair graph
      val out = labels.select(col("node").as("doc_id"), col("label").as("component"))
        .localCheckpoint(true)
      freeCheckpoint(labels)
      out
    } finally {
      if (suspendAqe) spark.conf.set(aqeKey, aqeWas)
    }
  }

  /** Free the block-manager storage behind a localCheckpointed DataFrame.
    * ContextCleaner would reclaim it eventually (on driver GC); an
    * iterative loop frees each round deterministically instead of letting
    * rounds accumulate. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
