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
 *
 * Why not large-star/small-star (the alternating-star map-reduce CC
 * algorithm): it converges in O(log² n) rounds by rewriting the EDGE
 * relation each round, where min-label + pointer jumping converges in
 * O(log diameter) rounds over a static, pre-partitioned edge relation —
 * `maxIter = 30` therefore already covers diameters past 2^29, which IS
 * the pathological-chain case. Star rounds would add an edge rewrite per
 * round (a shuffle of the LARGEST relation in the computation) to speed
 * up exactly the graphs pointer jumping already handles logarithmically.
 */
object Components {

  /** Conservative driver bytes per collected edge: a boxed
    * `Tuple2[Long, Long]` (~56 B with two boxed longs) plus up to two
    * `HashMap` entries in the union-find parent table (~100 B of node,
    * key and value boxing between them), rounded up to absorb collection
    * overhead. Deliberately pessimistic — the gate exists to keep the
    * driver OUT of trouble, so overestimating cost only sends borderline
    * graphs down the distributed path that also handles them. */
  private[operators] val BytesPerEdge = 192L

  /** Edge-count gate for the driver fast path, derived from the ACTUAL
    * driver heap rather than a constant: a pair graph whose collected
    * form fits in 1/8 of `Runtime.maxMemory` is resolved by union-find
    * on the driver, anything larger runs the distributed min-label loop.
    * 1/8 leaves the bulk of the heap to Spark's own driver-side state
    * (broadcasts, listener bus, result serving). The floor keeps the
    * fast path alive on tiny test heaps; near-dup pair graphs are orders
    * of magnitude smaller than their corpus, so at bench scale the fast
    * path saves ~10 Spark jobs of per-round latency, while at 100 TB a
    * billions-of-edges graph exceeds any driver heap and takes the
    * distributed path unchanged. */
  private[operators] def limitFor(maxHeapBytes: Long): Long =
    math.max(1L << 16, maxHeapBytes / 8 / BytesPerEdge)

  private[operators] def driverEdgeLimit: Long =
    limitFor(Runtime.getRuntime.maxMemory)

  /** `(doc_id, component)` for every node of `pairs` — the entry point
    * queries should use. Counts the edges once (persisting an un-cached
    * input so the count and the downstream resolution share one
    * materialization), then picks the resolution strategy by size:
    * driver union-find under [[driverEdgeLimit]] (memory-aware, override
    * via `edgeLimit` for tests), distributed [[minLabel]] above it. Both
    * paths return the same labeling — component = minimum reachable
    * doc_id — verified against each other in the property suite. */
  def resolve(pairs: DataFrame, maxIter: Int = 30,
      edgeLimit: Long = driverEdgeLimit): DataFrame = {
    val inputCached = pairs.storageLevel != StorageLevel.NONE
    val p = if (inputCached) pairs.toDF("i", "j")
            else pairs.toDF("i", "j").persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (p.count() <= edgeLimit) driverUnionFind(p)
      else minLabel(p, maxIter) // sees a cached input; uses it as-is
    } finally {
      // safe on both paths: union-find output is a local relation and
      // minLabel's is checkpointed — neither re-reads this cache
      if (!inputCached) p.unpersist(blocking = false)
    }
  }

  /** Union-find with path halving over a collected edge list; component =
    * min member, matching [[minLabel]] exactly. One executor→driver
    * transfer bounded by [[driverEdgeLimit]], zero Spark jobs per round —
    * the right tool when the pair graph is a sliver of the corpus. */
  private def driverUnionFind(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val keyType = pairs.schema.fields(0).dataType
    import org.apache.spark.sql.functions.col
    val edges = pairs
      .select(col("i").cast("long"), col("j").cast("long"))
      .as(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var px = parent.get(x)
      while (px != x) { // path halving: point x at its grandparent
        val ppx = parent.get(px)
        parent.put(x, ppx)
        x = ppx
        px = parent.get(x)
      }
      x
    }
    edges.foreach { case (i, j) =>
      parent.putIfAbsent(i, i)
      parent.putIfAbsent(j, j)
      val ri = find(i)
      val rj = find(j)
      // union by min keeps every root the minimum of its set, so the
      // final find() IS the component id — no second min pass needed
      if (ri < rj) parent.put(rj, ri) else if (rj < ri) parent.put(ri, rj)
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
    val it = parent.keySet().iterator()
    def asKey(v: Long): Any = keyType match {
      case org.apache.spark.sql.types.IntegerType => v.toInt
      case _ => v
    }
    while (it.hasNext) {
      val n = it.next()
      rows.add(org.apache.spark.sql.Row(asKey(n), asKey(find(n))))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", keyType, nullable = false),
      org.apache.spark.sql.types.StructField("component", keyType, nullable = false)))
    spark.createDataFrame(rows, schema)
  }

  /** `(doc_id, component)` for every node of `pairs`, where component =
    * the minimum doc_id reachable from the node. Throws if `maxIter`
    * rounds pass without convergence (a graph deeper than expected) —
    * silently returning half-propagated labels would be a wrong answer.
    *
    * An un-cached input plan is persisted internally for the duration of
    * the call (the count, the symmetrizing union, and every round would
    * otherwise re-derive it); an input the caller already persisted or
    * checkpointed is used as-is. The returned DataFrame is eagerly
    * materialized with its lineage truncated, and every cache or
    * checkpoint this loop created is released before returning — on the
    * failure path too — because a leaked block squats on executor memory
    * and contaminates whatever runs next. */
  def minLabel(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    val caller = pairs.sparkSession
    val inputCached = pairs.storageLevel != StorageLevel.NONE
    val parentDf = pairs.toDF("i", "j")
    // The whole loop runs on a CLONED session (newSession: shared
    // SparkContext, block manager, and cached data; private SQL conf).
    // The loop tunes planner knobs — AQE off for small graphs, shuffle
    // width sized to the graph — and a clone scopes those choices to
    // this call, so a query planned concurrently on the caller's session
    // keeps its own settings. DataFrames cross sessions by re-rooting
    // through their RDDs (session-agnostic); input reads still hit the
    // caller's cache because the derived RDD scans the cached plan.
    val spark = caller.newSession()
    val edges = {
      val e = spark.createDataFrame(parentDf.rdd, parentDf.schema)
      if (inputCached) e else e.persist(StorageLevel.MEMORY_AND_DISK)
    }
    // size the loop's shuffle width by GRAPH size, not the session
    // default: the near-dup pair graph is a sliver of the corpus, and
    // every round is two jobs whose constant cost scales with task
    // count (at bench scale, 32-wide shuffles of a few hundred edges
    // dominated the loop's wall-clock). ~500k edges per partition; this
    // count also materializes the internal persist above. Clamp nonzero:
    // repartition(0) is illegal.
    val nEdges = edges.count()
    val parts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      nEdges / 500000L + 1L)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    // AQE re-plans every shuffle stage — the right trade for one big
    // query, pure per-round latency for an iterative loop over a small
    // graph (measured 2.2 s vs 1.0 s for the same loop at bench scale).
    // Keep it for genuinely large graphs, where runtime skew handling
    // matters more than per-stage overhead. Clone-scoped: no restore
    // needed, the clone is discarded when this call returns.
    if (nEdges < 10000000L)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    var sym: DataFrame = null
    var labels: DataFrame = null
    var stepped: DataFrame = null
    try {
      // symmetric edge list, one direction per row, pre-partitioned by the
      // join key so every round's join re-reads it without re-shuffling
      sym = edges.select(col("i").as("a"), col("j").as("b"))
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
      labels = sym.select(col("a").as("node")).distinct()
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
        stepped = labels
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
        stepped = null
        freeCheckpoint(labels)
        labels = next
        converged = changed == 0
        it += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds " +
            "(graph diameter exceeds maxIter — raise it)")
      // checkpoint the (small) projected result before the finally block
      // frees the loop's final round, then re-root it into the CALLER's
      // session so downstream planning happens under the caller's conf
      val res = labels.select(col("node").as("doc_id"), col("label").as("component"))
        .localCheckpoint(true)
      caller.createDataFrame(res.rdd, res.schema)
    } finally {
      // release everything this call created, on success AND failure —
      // catalog.clearCache() cannot reclaim RDD-level checkpoint blocks,
      // so a leak here would outlive the query and poison its neighbors
      if (stepped != null) stepped.unpersist(blocking = false)
      if (labels != null) freeCheckpoint(labels)
      if (sym != null) sym.unpersist(blocking = false)
      if (!inputCached) edges.unpersist(blocking = false)
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
