package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{BucketedViewStore, JoinView}

/** Delta-join IVM ([[graft.engine.JoinView]]): maintenance under change
  * batches to either side must land exactly the recomputed join, with
  * partition-scoped I/O and an exact CDC history. */
class JoinViewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def leftDf(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("l_pk", "l_jk", "l_val")
  private def rightDf(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("r_pk", "r_jk", "r_val")

  private def snap(jv: JoinView): Set[(Long, String, Long, Double)] =
    jv.df.select("l_pk", "l_jk", "l_val", "r_val")
      .as[(Long, String, Long, Double)].collect().toSet

  test("build equals the join; left and right deltas maintain it exactly") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_join",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"))
    jv.build(
      leftDf((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L)),
      rightDf((100L, "a", 1.0), (101L, "b", 2.0), (102L, "d", 3.0)))
    assert(snap(jv) === Set((1L, "a", 10L, 1.0), (2L, "a", 20L, 1.0),
      (3L, "b", 30L, 2.0)), "c has no right match, d no left match")
    assert(jv.epoch === 0)

    // LEFT delta: pk 3 moves b→d (gains r 102), pk 5 arrives at a,
    // pk 2 is deleted — every outcome class in one batch.
    val stats1 = jv.refreshLeft(
      leftDf((3L, "d", 31L), (5L, "a", 50L)),
      Some(leftDf((2L, "zz", 0L)).select(col("l_pk").cast("string"))))
    assert(snap(jv) === Set((1L, "a", 10L, 1.0), (3L, "d", 31L, 3.0),
      (5L, "a", 50L, 1.0)))
    assert(jv.epoch === 1)
    assert(stats1.emitBucketsRewritten < stats1.totalBuckets,
      "a small left delta must not rewrite every join bucket")

    // RIGHT delta: r 100 re-valued (every 'a' join row rewrites), r 101
    // deleted, r 103 arrives at c (pk 4 re-joins). The dirty-key set
    // comes from the right view's own CDC sidecar.
    val stats2 = jv.refreshRight(
      rightDf((100L, "a", 9.0), (103L, "c", 7.0)),
      Some(rightDf((101L, "zz", 0.0)).select(col("r_pk").cast("string"))))
    assert(snap(jv) === Set((1L, "a", 10L, 9.0), (3L, "d", 31L, 3.0),
      (5L, "a", 50L, 9.0), (4L, "c", 40L, 7.0)))
    assert(jv.epoch === 2)
    assert(stats2.emitBucketsRewritten < stats2.totalBuckets,
      "a small right delta must not rewrite every join bucket")

    // a right delete that retracts LIVE rows: r 102 goes, pk 3's join
    // row must vanish through the ownership tombstone
    jv.refreshRight(rightDf(),
      Some(rightDf((102L, "zz", 0.0)).select(col("r_pk").cast("string"))))
    assert(snap(jv) === Set((1L, "a", 10L, 9.0), (5L, "a", 50L, 9.0),
      (4L, "c", 40L, 7.0)))

    // CDC across the whole history nets to final-minus-build: the b→d
    // hop's intermediate row (3, 3.0) and pk 5's pre-revalue row (5, 1.0)
    // insert then delete, so they cancel in the multiset
    val feed = jv.changes(0, jv.epoch)
      .select(col("emit_value.l_pk"), col("emit_value.r_val"), col("change_type"))
    val dels = feed.filter(col("change_type") === "delete").drop("change_type")
    val ins = feed.filter(col("change_type") === "insert").drop("change_type")
    assert(ins.exceptAll(dels).as[(Long, Double)].collect().toSet ===
      Set((1L, 9.0), (5L, 9.0), (4L, 7.0)))
    assert(dels.exceptAll(ins).as[(Long, Double)].collect().toSet ===
      Set((1L, 1.0), (2L, 1.0), (3L, 2.0)))

    // bucket-pruned key read serves exactly one key's rows
    assert(jv.byKeys(Seq("a").toDF("k")).select("l_pk")
      .as[Long].collect().toSet === Set(1L, 5L))
  }
}
