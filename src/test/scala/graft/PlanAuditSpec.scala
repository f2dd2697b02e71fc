package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the performance-critical plan shapes the engine
  * promises (pushdown, column pruning, broadcast dims, top-k without a
  * global sort, exchange reuse) asserted against the EXECUTED plan, so a
  * refactor that silently degrades a plan fails a test rather than a
  * benchmark at scale. */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Executed-plan string after the adaptive plan finalizes. */
  private def finalPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("topk_orders: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = finalPlan("topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"top-k must not range-shuffle the whole table:\n$p")
  }

  test("q3: every dim filter reaches its scan, dims broadcast, top-10 is TakeOrdered") {
    val p = finalPlan("q3_shipping")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), s"customer pushdown missing:\n$p")
    assert(p.contains("LessThan(o_orderdate"), s"orders pushdown missing:\n$p")
    assert(p.contains("GreaterThan(l_shipdate"), s"lineitem pushdown missing:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"filtered dim should broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 must not global-sort:\n$p")
  }

  test("q14: lineitem scan is column-pruned to the 4 needed columns and date-filtered") {
    val p = finalPlan("q14_promo")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"date pushdown missing:\n$p")
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp_ntz>"),
      s"lineitem read must prune to 4 columns:\n$p")
  }

  test("q5: the region filter is pushed and the dim chain broadcasts") {
    val p = finalPlan("q5_region_revenue")
    assert(p.contains("EqualTo(r_name,ASIA)"), s"region pushdown missing:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims should broadcast:\n$p")
  }

  test("dedup_ngram_jaccard: the posting-list exchange is computed once and reused") {
    // the pair branch and the sizes branch both read the same shuffled
    // posting aggregation — the corpus is scanned and shingled exactly once
    val p = finalPlan("dedup_ngram_jaccard")
    assert(p.contains("ReusedExchange"), s"posting exchange must be shared:\n$p")
  }

  test("mapindex_get: the point lookup is pushed into the parquet scan") {
    val p = finalPlan("mapindex_get")
    assert(p.contains("EqualTo(emit_key"), s"emit_key lookup must push down:\n$p")
  }
}
