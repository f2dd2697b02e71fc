package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Physical-layout helpers for shuffle avoidance and skew at cluster scale
 * (SURVEY.md §2.1 O6 / builder prompt "partitioning & shuffle").
 *
 * - [[saveBucketed]] / co-located joins: two tables bucketed by the same
 *   key and count join with NO exchange on either side — the parquet
 *   bucketing metadata satisfies the join's distribution requirement, the
 *   cluster-scale equivalent of LevelDB's "everything already sorted by
 *   key" (a repeated-join workload materializes its views this way once
 *   and joins shuffle-free forever after).
 *
 * - [[saltedAgg]]: aggregation over heavily skewed keys in two rounds —
 *   partial aggregation on (key, salt) spreads a hot key over N reducers,
 *   the final round combines the N partials. Only sum/count-style
 *   (associative, decomposable) aggregates may be salted this way.
 */
object Layout {

  /** Write as a Spark bucketed table (sorted within buckets) so later
    * equi-joins/aggregations on `key` need no exchange. Idempotent: drops
    * stale catalog entries AND orphaned warehouse directories (an
    * in-memory catalog forgets tables across sessions but the location
    * survives, which would fail the create). */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write as a Hive-layout partitioned table (one directory per value of
    * `partCol`) so queries filtering on it read ONLY the matching
    * directories — at 100 TB, partition pruning is the first and largest
    * I/O lever (a date filter over date-partitioned events skips the
    * other ~97% of files before a single row is read). Idempotent like
    * [[saveBucketed]]. */
  def savePartitioned(df: DataFrame, table: String, partCol: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode("overwrite")
      .partitionBy(partCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Two-round skew-safe sum: `SUM(valueCol) GROUP BY key` where some keys
    * dominate. Correct for any number of salt partitions. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      salts: Int, out: String = "total"): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum("_partial").as(out), sum("_n").as("cnt"))

  /** Morton (Z-order) value of two non-negative keys: their low `bits`
    * bits interleaved (a's bit i at position 2i+1, b's at 2i). Built from
    * plain bit-op columns — 3·bits codegen'd integer ops per row, no UDF. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Write `df` Z-ORDERED on two columns: rows range-partitioned and
    * sorted by the interleaved key, so every output file (= row group at
    * this scale) covers one compact 2-D tile. Parquet min/max stats on
    * BOTH columns then tighten together and a 2-D box predicate prunes
    * most of the table at the reader — where a 1-D sort leaves the second
    * column's stats full-range in every file and an unsorted layout
    * leaves both. The multi-dimensional clustering trick every large
    * lakehouse layout uses, spelled with stock Spark: no custom writer,
    * just repartitionByRange + sortWithinPartitions on the z column. */
  def saveZOrdered(df: DataFrame, path: String,
      a: String, b: String, files: Int): Unit = {
    df.withColumn("_z", zValue(col(a).cast("long"), col(b).cast("long")))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
