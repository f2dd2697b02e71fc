package graft.operators

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Layout, Tables}

/**
 * Oracle-backed queries over the shuffle-avoidance layout helpers
 * (`engine/Layout.scala`): a co-located bucketed join and a salted skew
 * aggregation. These demonstrate the physical strategies under the
 * driver's correctness gate — results are identical to the plain shuffled
 * plans (the DuckDB oracle runs on the raw tables), only the exchange
 * shape differs (asserted in LayoutSpec: no Exchange on either join side).
 */
object LayoutQueries {

  private val Buckets = 8
  private val built = TrieMap.empty[String, (String, String)]

  /** Bucketed copies of orders/customer for one sf dir, built once per JVM
    * (write-time cost, like the map-view prewarm). */
  private def bucketedTables(s: SparkSession, dir: String): (String, String) =
    built.getOrElseUpdate(dir, {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val o = s"orders_bkt_$tag"
      val c = s"customer_bkt_$tag"
      Layout.saveBucketed(Tables.orders(s, dir), o, "o_custkey", Buckets)
      Layout.saveBucketed(Tables.customer(s, dir), c, "c_custkey", Buckets)
      (o, c)
    })

  /** Build the bucketed tables eagerly (write-time cost, like the map-view
    * prewarm) so bench timings measure the co-located read path. */
  def prewarm(s: SparkSession, dir: String): Unit = bucketedTables(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // co-located fact-dim join: both sides bucketed by custkey, so the
    // equi-join needs no exchange on either side (the only shuffle left
    // is the tiny final aggregation)
    "layout_bucketed_join" -> ((s, dir) => {
      val (o, c) = bucketedTables(s, dir)
      s.table(o).join(s.table(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("c_mktsegment")
    }),

    // two-round salted aggregation (hot-key safe): partials on (key, salt),
    // combine per key — same result as the direct groupBy
    "layout_salted_agg" -> ((s, dir) =>
      Layout.saltedSum(Tables.lineitem(s, dir), "l_returnflag", "l_quantity",
          salts = 16, out = "total")
        .select(col("l_returnflag"), round(col("total"), 2).as("total"), col("cnt"))
        .orderBy("l_returnflag")),
  )

  val oracle: Map[String, String] = Map(
    "layout_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "layout_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS total, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
