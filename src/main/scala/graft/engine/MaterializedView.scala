package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * A materialized [[MapIndex]] snapshot: the read + maintenance surface of
 * the reference engine, Spark-first.
 *
 * Read paths (reference `index.js:124-172`) are pruned parquet scans —
 * range/prefix/point predicates on the clustered `emit_key` column reach
 * the scan as `PushedFilters`, so only the matching files/row-groups are
 * read (the LevelDB-seek analog). Maintenance (`index.js:173-249`) is an
 * anti-join + union upsert keyed on `src_key`.
 */
final class MaterializedView(
    val spark: SparkSession,
    val store: ViewStore,
    val index: MapIndex) extends Serializable {

  /** Current snapshot of the emission relation. */
  def df: DataFrame = spark.read.parquet(store.latestPath(index.name))

  /**
   * Ordered range scan (O6, `index.js:124-138`), with the reference's
   * *intended* `[start, end)` semantics — v0.5.1's `end` option is broken
   * (`index.js:128` double-encodes `start` into the upper bound; SURVEY §2
   * O6) and we deliberately do not replicate that.
   */
  def scan(start: Option[Any] = None, end: Option[Any] = None): DataFrame = {
    val base = (start, end) match {
      case (Some(s), Some(e)) => df.filter(col("emit_key") >= lit(s) && col("emit_key") < lit(e))
      case (Some(s), None)    => df.filter(col("emit_key") >= lit(s))
      case (None, Some(e))    => df.filter(col("emit_key") < lit(e))
      case (None, None)       => df
    }
    base.orderBy("emit_key", "uid")
  }

  /** Point/prefix lookup (O8, `index.js:151-172`): all values for one key,
    * in emission order. */
  def get(key: Any): DataFrame =
    df.filter(col("emit_key") === lit(key)).orderBy("uid").select("emit_value")

  /** COUNT over a range — the reference declared but never implemented this
    * (O16 stub, `index.js:148-150`). */
  def countRange(start: Option[Any] = None, end: Option[Any] = None): Long =
    scan(start, end).count()

  /**
   * Incremental view maintenance (O3/O4/O5, `index.js:173-249`): for every
   * changed source key, delete all previous emissions, then insert the new
   * ones. `upserts` is a source batch (rows to re-map); `deleteKeys` is a
   * single-column relation of tombstoned source keys (`{key, deleted:true}`,
   * `index.js:187-205`). An upserted row whose map emits nothing is the
   * empty-emission case (`index.js:218-230`) — its old rows vanish via the
   * anti-join and nothing replaces them.
   *
   * Scale note: the changed-key set of an incremental batch is small, so
   * the anti-join broadcasts it — the big view is scanned once, never
   * shuffled. (Partition-scoped rewrite via the clustered layout is the
   * planned refinement; at test scale a full rewrite per refresh is fine.)
   */
  def refresh(upserts: DataFrame, deleteKeys: Option[DataFrame] = None): MaterializedView = {
    val newEmissions = index.emissions(upserts)
    val upsertKeys = index.touchedKeys(upserts) // includes empty-emission keys
    val changed = deleteKeys match {
      case Some(d) => upsertKeys.union(d.toDF("src_key")).distinct()
      case None    => upsertKeys
    }
    val kept = df.join(broadcast(changed), Seq("src_key"), "left_anti")
    store.write(index, kept.unionByName(newEmissions))
  }

  /**
   * Grouped collect (O14, `index.js:64-89`) with the corrected semantics:
   * GROUP BY emitted key → all values in emission (uid) order, every
   * group complete — the reference dropped each group's boundary row
   * (`index.js:70-74`) and we deliberately do not.
   *
   * Sort-based, like the reference's single-pass streaming group over
   * LevelDB iteration order (§4.1): cluster by key, sort within
   * partitions by (key, uid), and `collect_list` then accumulates in row
   * order because each group is contiguous inside one partition. No
   * order-dependent result ever crosses a partition boundary.
   */
  def grouped(): DataFrame =
    df.repartition(col("emit_key"))
      .sortWithinPartitions("emit_key", "uid")
      .groupBy("emit_key")
      .agg(collect_list(col("emit_value")).as("vals"))

  /**
   * The cascade source (O17, `index.js:244,250-253`): one row per source
   * key with all its emissions collected in emission order — exactly the
   * `{key, value: mapped}` shape a piped downstream index receives
   * (`tests/test-replication.js:18` reads `obj.value[0][1]`).
   *
   * Order preservation: clustering by `src_key` and sorting by `uid`
   * before a sort-based collect reproduces the reference's in-order
   * `mapped` array without relying on `collect_list`'s partition order
   * (SURVEY §7.5).
   */
  def cascadeSource: DataFrame =
    df.repartition(col("src_key"))
      .sortWithinPartitions("src_key", "uid")
      .groupBy(col("src_key").as("key"))
      .agg(collect_list(struct(col("emit_key"), col("emit_value"))).as("value"))

  /** Materialize a downstream index fed by this view (view-of-view). */
  def cascadeInto(next: MapIndex): MaterializedView =
    next.materialize(cascadeSource, store)
}
