package graft.engine

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Per-JVM cache of materialized views, keyed by (sfDir, index name).
 *
 * The reference materializes once at write time and serves every query from
 * the stored index (`index.js:173-249` vs `124-172`); this cache gives the
 * driver's Verify/Bench runs the same compute-on-write economics — the
 * first query materializes, subsequent queries are pure index reads.
 */
object Views {
  private val stores = TrieMap.empty[String, ViewStore]
  private val cache = TrieMap.empty[(String, String), MaterializedView]

  def store(spark: SparkSession, sfDir: String): ViewStore =
    stores.getOrElseUpdate(sfDir, ViewStore.temp(spark))

  def materialized(spark: SparkSession, sfDir: String, index: MapIndex)
      (source: => DataFrame): MaterializedView =
    cache.getOrElseUpdate((sfDir, index.name),
      index.materialize(source, store(spark, sfDir)))

  /** Cache an arbitrarily-built view (cascades). */
  def cached(sfDir: String, name: String)(build: => MaterializedView): MaterializedView =
    cache.getOrElseUpdate((sfDir, name), build)
}
