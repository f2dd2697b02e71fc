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

  test("aggregate-over-join rollup: CDC-fed delta-merge touches only dirty groups") {
    import graft.engine.JoinAggView
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_jagg",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"))
    jv.build(
      leftDf((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L)),
      rightDf((100L, "a", 1.0), (101L, "b", 2.0), (102L, "c", 3.0)))
    val agg = new JoinAggView(jv, "t_jagg__rollup", "l_jk", "l_val")
    agg.build()
    def state(): Map[String, (Long, Long)] =
      agg.state.select(col("emit_key"), col("cnt"), col("sum_value").cast("long"))
        .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(state() === Map("a" -> (2L, 30L), "b" -> (1L, 30L), "c" -> (1L, 40L)))

    // left delta inside group 'a' only: pk 1 revalued, pk 2 deleted —
    // the rollup refresh must rewrite at most 'a''s state bucket
    jv.refreshLeft(leftDf((1L, "a", 15L)),
      Some(leftDf((2L, "zz", 0L)).select(col("l_pk").cast("string"))))
    val s1 = agg.catchUp()
    assert(state() === Map("a" -> (1L, 15L), "b" -> (1L, 30L), "c" -> (1L, 40L)))
    // ≤ 2: the dirty group's bucket plus (possibly) the persisted
    // watermark sentinel's bucket — still O(dirty groups), never O(state)
    assert(s1.emitBucketsRewritten <= 2,
      s"one dirty group must touch at most its bucket + the watermark's, " +
        s"rewrote ${s1.emitBucketsRewritten}")

    // right delta deleting r 101: group 'b' loses its only join row and
    // must VANISH from the state (count reached zero)
    jv.refreshRight(rightDf(),
      Some(rightDf((101L, "zz", 0.0)).select(col("r_pk").cast("string"))))
    val s2 = agg.catchUp()
    assert(state() === Map("a" -> (1L, 15L), "c" -> (1L, 40L)))
    assert(s2.emitBucketsRewritten <= 2)

    // multi-epoch catch-up (two refreshes folded in one replay): pk 5
    // arrives at 'c', then moves to 'a' — only the FINAL state may land
    jv.refreshLeft(leftDf((5L, "c", 50L)), None)
    jv.refreshLeft(leftDf((5L, "a", 50L)), None)
    agg.catchUp()
    assert(state() === Map("a" -> (2L, 65L), "c" -> (1L, 40L)))
  }

  test("rollup watermark is persisted: a reopening process resumes from disk and double-catchUp no-ops") {
    import graft.engine.JoinAggView
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_jwm",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"))
    jv.build(
      leftDf((1L, "a", 10L), (2L, "b", 20L)),
      rightDf((100L, "a", 1.0), (101L, "b", 2.0)))
    val agg = new JoinAggView(jv, "t_jwm__rollup", "l_jk", "l_val")
    agg.build()
    def state(a: JoinAggView): Map[String, (Long, Long)] =
      a.state.select(col("emit_key"), col("cnt"), col("sum_value").cast("long"))
        .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    // a join refresh lands, then the PROCESS DIES before catchUp: the
    // original JoinAggView object is gone. A fresh attach must read the
    // BUILD-TIME watermark from disk (not trust jv.epoch) and fold the
    // missed refresh.
    jv.refreshLeft(leftDf((1L, "a", 99L), (3L, "b", 30L)), None)
    val reopened = JoinAggView.attach(jv, "t_jwm__rollup", "l_jk", "l_val")
    val s1 = reopened.catchUp()
    assert(state(reopened) === Map("a" -> (1L, 99L), "b" -> (2L, 50L)))
    assert(s1.emitBucketsRewritten >= 1, "the missed refresh must actually fold")

    // double-catchUp no-ops: already current at the join epoch
    val s2 = reopened.catchUp()
    assert(s2.emitBucketsRewritten === 0 && s2.metaBucketsRewritten === 0,
      "a second catchUp at the same join epoch must be a no-op")
    assert(state(reopened) === Map("a" -> (1L, 99L), "b" -> (2L, 50L)))

    // a SECOND reopen after the fold resumes current (watermark advanced
    // atomically with the fold's state refresh) and also no-ops
    val reopened2 = JoinAggView.attach(jv, "t_jwm__rollup", "l_jk", "l_val")
    assert(reopened2.catchUp().emitBucketsRewritten === 0)
    assert(state(reopened2) === Map("a" -> (1L, 99L), "b" -> (2L, 50L)))

    // an EMPTY join delta still advances the persisted watermark (else a
    // long empty streak ages the replay range past sidecar retention)
    jv.refreshLeft(leftDf((9L, "nomatch", 1L)), None) // joins nothing
    val reopened3 = JoinAggView.attach(jv, "t_jwm__rollup", "l_jk", "l_val")
    reopened3.catchUp()
    val reopened4 = JoinAggView.attach(jv, "t_jwm__rollup", "l_jk", "l_val")
    assert(reopened4.catchUp().emitBucketsRewritten === 0,
      "the empty-delta fold must have persisted its watermark")
  }

  test("rollup value-refcount state serves exact deletion-safe min/max/distinct") {
    import graft.engine.JoinAggView
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_jmulti",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"))
    jv.build(
      leftDf((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "b", 5L)),
      rightDf((100L, "a", 1.0), (101L, "b", 2.0)))
    val agg = new JoinAggView(jv, "t_jmulti__rollup", "l_jk", "l_val",
      trackValues = true)
    agg.build()
    def multi(): Map[String, (Long, Long, Long)] =
      agg.multiState.select(col("emit_key"), col("min_value").cast("long"),
          col("max_value").cast("long"), col("n_distinct"))
        .as[(String, Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(multi() === Map("a" -> (10L, 20L, 2L), "b" -> (5L, 5L, 1L)))

    // delete the current MAX of 'a' (pk 3, val 20) — but pk 2 still
    // carries 20: the refcount must keep max = 20, distinct = 2
    jv.refreshLeft(leftDf(), Some(leftDf((3L, "zz", 0L))
      .select(col("l_pk").cast("string"))))
    agg.catchUp()
    assert(multi() === Map("a" -> (10L, 20L, 2L), "b" -> (5L, 5L, 1L)))

    // now delete the LAST 20 (pk 2): max falls to 10, distinct to 1 —
    // the non-retractable case a plain (cnt,sum) state cannot serve
    jv.refreshLeft(leftDf(), Some(leftDf((2L, "zz", 0L))
      .select(col("l_pk").cast("string"))))
    agg.catchUp()
    assert(multi() === Map("a" -> (10L, 10L, 1L), "b" -> (5L, 5L, 1L)))

    // new minimum arrives; the vals state watermark also survives reopen
    jv.refreshLeft(leftDf((5L, "a", 3L)), None)
    val reopened = JoinAggView.attach(jv, "t_jmulti__rollup", "l_jk", "l_val",
      trackValues = true)
    reopened.catchUp()
    assert(reopened.multiState.select(col("emit_key"), col("min_value").cast("long"),
        col("max_value").cast("long"), col("n_distinct"))
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap ===
      Map("a" -> (3L, 10L, 2L), "b" -> (5L, 5L, 1L)))
  }

  test("three-way delta join: level 2 caught up from level 1's CDC equals the recomputed chain") {
    val store = BucketedViewStore.temp(spark, 8)
    // mid rows carry their own dimension key (m_dk) — level 1 joins
    // left⋈mid on l_jk=m_jk, level 2 joins that output to dim on m_dk
    def midDf(rows: (Long, String, String)*) =
      rows.toSeq.toDF("m_pk", "m_jk", "m_dk")
    val jv1 = new JoinView(store, "t3_lv1",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "m_pk", "m_jk", Seq("m_pk", "m_jk", "m_dk"))
    val jv2 = new JoinView(store, "t3_lv2",
      "l_pk", "m_dk", Seq("l_pk", "l_jk", "l_val", "m_pk", "m_jk", "m_dk"),
      "d_pk", "d_jk", Seq("d_pk", "d_jk", "d_name"))
    def dimDf(rows: (Long, String, String)*) =
      rows.toSeq.toDF("d_pk", "d_jk", "d_name")
    jv1.build(
      leftDf((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)),
      midDf((100L, "a", "x"), (101L, "b", "y")))
    jv2.build(jv1.df, dimDf((7L, "x", "X"), (8L, "y", "Y")))
    def snap3(): Set[(Long, Long, String)] =
      jv2.df.select("l_pk", "d_pk", "d_name")
        .as[(Long, Long, String)].collect().toSet
    assert(snap3() === Set((1L, 7L, "X"), (2L, 7L, "X"), (3L, 8L, "Y")))

    // level-1 left batch: pk 1 moves a→b, pk 2 deleted; the replay must
    // retract both 'X' rows and land pk 1 under 'Y'
    jv1.refreshLeft(leftDf((1L, "b", 11L)),
      Some(leftDf((2L, "zz", 0L)).select(col("l_pk").cast("string"))))
    val lv2Stats = jv1.cascadeInto(jv2, 0, 1)
    assert(snap3() === Set((1L, 8L, "Y"), (3L, 8L, "Y")))
    assert(lv2Stats.emitBucketsRewritten < lv2Stats.totalBuckets,
      "a small level-1 delta must not rewrite every level-2 bucket")

    // level-1 right batch: mid 101's dim key re-pointed y→x; every 'b'
    // chain row re-routes through dim 7
    jv1.refreshRight(midDf((101L, "b", "x")), None)
    jv1.cascadeInto(jv2, 1, 2)
    assert(snap3() === Set((1L, 7L, "X"), (3L, 7L, "X")))

    // level-2's OWN right batch: dim 7 renamed, dim 8 tombstoned
    jv2.refreshRight(dimDf((7L, "x", "X2")), Some(dimDf((8L, "zz", ""))
      .select(col("d_pk").cast("string"))))
    assert(snap3() === Set((1L, 7L, "X2"), (3L, 7L, "X2")))

    // wrong-key composition fails loud
    val bad = new JoinView(store, "t3_bad",
      "other_pk", "m_jk", Seq("other_pk", "m_jk"),
      "d_pk", "d_jk", Seq("d_pk", "d_jk"))
    val e = intercept[IllegalArgumentException](jv1.cascadeInto(bad, 1, 2))
    assert(e.getMessage.contains("left pk"))
  }

  test("left-outer join view: null-pads unmatched, heals on arrival, re-pads on right delete") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_louter",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"), joinType = "left_outer")
    def osnap(): Set[(Long, String, Long, Option[Double])] =
      jv.df.select("l_pk", "l_jk", "l_val", "r_val")
        .as[(Long, String, Long, Option[Double])].collect().toSet
    // build: pk 2 has no right match — it must hold a null-padded row
    jv.build(leftDf((1L, "a", 10L), (2L, "b", 20L)),
      rightDf((100L, "a", 1.0)))
    assert(osnap() === Set((1L, "a", 10L, Some(1.0)), (2L, "b", 20L, None)))

    // late right arrival HEALS pk 2's null-pad into the real join row
    jv.refreshRight(rightDf((101L, "b", 2.0)), None)
    assert(osnap() === Set((1L, "a", 10L, Some(1.0)), (2L, "b", 20L, Some(2.0))))

    // right delete RE-PADS: pk 1's match vanishes but the row survives
    // (the inner view would retract it)
    jv.refreshRight(rightDf(),
      Some(rightDf((100L, "zz", 0.0)).select(col("r_pk").cast("string"))))
    assert(osnap() === Set((1L, "a", 10L, None), (2L, "b", 20L, Some(2.0))))

    // a left upsert with no match null-pads immediately; a left delete
    // removes the null-pad like any owned row
    jv.refreshLeft(leftDf((3L, "c", 30L)), None)
    assert(osnap() === Set((1L, "a", 10L, None), (2L, "b", 20L, Some(2.0)),
      (3L, "c", 30L, None)))
    jv.refreshLeft(leftDf(),
      Some(leftDf((1L, "zz", 0L)).select(col("l_pk").cast("string"))))
    assert(osnap() === Set((2L, "b", 20L, Some(2.0)), (3L, "c", 30L, None)))
  }

  test("rollup over a left-outer view by a RIGHT-side column: null groups key, serve and retract") {
    import graft.engine.JoinAggView
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_jnullg",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"), joinType = "left_outer")
    // pk 2 and 3 have no right match -> their r_jk group is NULL
    jv.build(leftDf((1L, "a", 10L), (2L, "b", 20L), (3L, "b", 30L)),
      rightDf((100L, "a", 1.0)))
    val agg = new JoinAggView(jv, "t_jnullg__rollup", "r_jk", "l_val")
    agg.build()
    def state(): Map[Option[String], (Long, Long)] =
      agg.state.select(col("emit_key"), col("cnt"), col("sum_value").cast("long"))
        .as[(Option[String], Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
    assert(state() === Map(Some("a") -> (1L, 10L), None -> (2L, 50L)),
      "the unmatched rows must aggregate under the NULL group, served as null")

    // a late right arrival heals pk 2's null-pad: its l_val moves from
    // the null group to 'b' through the ordinary delta fold
    jv.refreshRight(rightDf((101L, "b", 2.0)), None)
    agg.catchUp()
    assert(state() === Map(Some("a") -> (1L, 10L),
      Some("b") -> (2L, 50L)), "the null group empties and vanishes")

    // right delete re-pads both 'b' rows: the null group re-forms
    jv.refreshRight(rightDf(),
      Some(rightDf((101L, "zz", 0.0)).select(col("r_pk").cast("string"))))
    agg.catchUp()
    assert(state() === Map(Some("a") -> (1L, 10L), None -> (2L, 50L)))
  }

  test("full-outer join view: pads on BOTH sides, heals and re-pads in both directions") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_fouter",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"), joinType = "full_outer")
    def fsnap(): Set[(Option[Long], Option[Long], Option[Long], Option[Double])] =
      jv.df.select("l_pk", "r_pk", "l_val", "r_val")
        .as[(Option[Long], Option[Long], Option[Long], Option[Double])]
        .collect().toSet
    // build: left 'b' has no right match (LEFT-pad), right 'c' has no
    // left match (RIGHT-pad) — both must appear, null-padded
    jv.build(leftDf((1L, "a", 10L), (2L, "b", 20L)),
      rightDf((100L, "a", 1.0), (102L, "c", 3.0)))
    assert(fsnap() === Set(
      (Some(1L), Some(100L), Some(10L), Some(1.0)),
      (Some(2L), None, Some(20L), None),
      (None, Some(102L), None, Some(3.0))))

    // late LEFT arrival at 'c' HEALS the right-pad into the real row
    jv.refreshLeft(leftDf((3L, "c", 30L)), None)
    assert(fsnap() === Set(
      (Some(1L), Some(100L), Some(10L), Some(1.0)),
      (Some(2L), None, Some(20L), None),
      (Some(3L), Some(102L), Some(30L), Some(3.0))))

    // LEFT delete RE-PADS: right 102's only match retreats, the right
    // row must reappear null-padded (not vanish)
    jv.refreshLeft(leftDf(),
      Some(leftDf((3L, "zz", 0L)).select(col("l_pk").cast("string"))))
    assert(fsnap() === Set(
      (Some(1L), Some(100L), Some(10L), Some(1.0)),
      (Some(2L), None, Some(20L), None),
      (None, Some(102L), None, Some(3.0))))

    // late RIGHT arrival heals the LEFT-pad (the left_outer direction)
    jv.refreshRight(rightDf((101L, "b", 2.0)), None)
    assert(fsnap() === Set(
      (Some(1L), Some(100L), Some(10L), Some(1.0)),
      (Some(2L), Some(101L), Some(20L), Some(2.0)),
      (None, Some(102L), None, Some(3.0))))

    // RIGHT delete re-pads the left side AND a right upsert at a virgin
    // key creates a fresh right-pad in the same batch
    jv.refreshRight(rightDf((103L, "d", 4.0)),
      Some(rightDf((100L, "zz", 0.0)).select(col("r_pk").cast("string"))))
    assert(fsnap() === Set(
      (Some(1L), None, Some(10L), None),
      (Some(2L), Some(101L), Some(20L), Some(2.0)),
      (None, Some(102L), None, Some(3.0)),
      (None, Some(103L), None, Some(4.0))))

    // deleting a right-padded row drops its pad through the ownership
    // tombstone; key-addressed reads see both relations
    jv.refreshRight(rightDf(),
      Some(rightDf((103L, "zz", 0.0)).select(col("r_pk").cast("string"))))
    assert(fsnap() === Set(
      (Some(1L), None, Some(10L), None),
      (Some(2L), Some(101L), Some(20L), Some(2.0)),
      (None, Some(102L), None, Some(3.0))))
    assert(jv.byKeys(Seq("c").toDF("k")).select("r_pk")
      .as[Option[Long]].collect().toSet === Set(Some(102L)))
  }

  test("right-outer join view: matched rows plus right-pads, never left-pads") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_router",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"), joinType = "right_outer")
    def rsnap(): Set[(Option[Long], Option[Long], Option[Long], Option[Double])] =
      jv.df.select("l_pk", "r_pk", "l_val", "r_val")
        .as[(Option[Long], Option[Long], Option[Long], Option[Double])]
        .collect().toSet
    // build: left 'b' unmatched DROPS (no left-pads under right_outer),
    // right 'c' unmatched appears null-padded
    jv.build(leftDf((1L, "a", 10L), (2L, "b", 20L)),
      rightDf((100L, "a", 1.0), (102L, "c", 3.0)))
    assert(rsnap() === Set(
      (Some(1L), Some(100L), Some(10L), Some(1.0)),
      (None, Some(102L), None, Some(3.0))))

    // late LEFT arrival at 'c' heals the pad; a left row at a virgin key
    // in the same batch emits NOTHING (inner-owned, no match)
    jv.refreshLeft(leftDf((3L, "c", 30L), (4L, "x", 40L)), None)
    assert(rsnap() === Set(
      (Some(1L), Some(100L), Some(10L), Some(1.0)),
      (Some(3L), Some(102L), Some(30L), Some(3.0))))

    // LEFT delete re-pads the orphaned right row
    jv.refreshLeft(leftDf(),
      Some(leftDf((3L, "zz", 0L)).select(col("l_pk").cast("string"))))
    assert(rsnap() === Set(
      (Some(1L), Some(100L), Some(10L), Some(1.0)),
      (None, Some(102L), None, Some(3.0))))

    // RIGHT delete of the matched row retracts it (no left-pad forms);
    // deleting the padded row drops its pad
    jv.refreshRight(rightDf(),
      Some(rightDf((100L, "zz", 0.0), (102L, "zz", 0.0))
        .select(col("r_pk").cast("string"))))
    assert(rsnap() === Set.empty)
  }

  test("rollup over a full-outer view folds BOTH CDC feeds (owned + right-pad twin)") {
    import graft.engine.JoinAggView
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_foagg",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"), joinType = "full_outer")
    // group by the RIGHT join key, sum the LEFT value: left-pads group
    // under NULL, right-pads count with a sum-invisible null value
    jv.build(leftDf((1L, "a", 10L), (2L, "b", 20L)),
      rightDf((100L, "a", 1.0), (102L, "c", 3.0)))
    val agg = new JoinAggView(jv, "t_foagg__rollup", "r_jk", "l_val")
    agg.build()
    def state(): Map[Option[String], (Long, Long)] =
      agg.state.select(col("emit_key"),
          col("cnt"), coalesce(col("sum_value").cast("long"), lit(0L)))
        .as[(Option[String], Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
    assert(state() === Map(Some("a") -> (1L, 10L), Some("c") -> (1L, 0L),
      None -> (1L, 20L)))

    // a left arrival at 'c' heals the right-pad: the twin feed retracts
    // the pad row while the owned feed inserts the join row — cnt stays,
    // the sum gains the value
    jv.refreshLeft(leftDf((3L, "c", 30L)), None)
    agg.catchUp()
    assert(state() === Map(Some("a") -> (1L, 10L), Some("c") -> (1L, 30L),
      None -> (1L, 20L)))

    // a right delete re-pads its matched left row into the NULL group;
    // a right arrival at 'b' heals the left-pad out of it
    jv.refreshRight(rightDf((101L, "b", 2.0)),
      Some(rightDf((100L, "zz", 0.0)).select(col("r_pk").cast("string"))))
    agg.catchUp()
    assert(state() === Map(Some("b") -> (1L, 20L), Some("c") -> (1L, 30L),
      None -> (1L, 10L)))

    // reopen from disk: the persisted watermark already covers every
    // epoch, so a fresh catchUp over the twin-fed state no-ops
    val re = JoinAggView.attach(jv, "t_foagg__rollup", "r_jk", "l_val")
    re.catchUp()
    assert(state() === Map(Some("b") -> (1L, 20L), Some("c") -> (1L, 30L),
      None -> (1L, 10L)))
  }

  test("salted join view: hot-key refresh I/O stays delta-proportional, serving unchanged") {
    val store = BucketedViewStore.temp(spark, 8)
    // 50 %-skewed left: half the rows on ONE join key
    val lRows = (1L to 200L).map(i => (i, "HOT", i)) ++
      (201L to 400L).map(i => (i, s"k${i % 40}", i))
    val rRows = ("HOT" +: (0 until 40).map(i => s"k$i").toSeq).zipWithIndex
      .map { case (j, i) => (1000L + i, j, i.toDouble) }
    val l = lRows.toDF("l_pk", "l_jk", "l_val")
    val r = rRows.toDF("r_pk", "r_jk", "r_val")
    val expected = lRows.map { case (pk, jk, v) =>
      (pk, jk, v, rRows.find(_._2 == jk).get._3) }.toSet
    val jv = new JoinView(store, "t_salt",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"), saltBuckets = 8)
    jv.build(l, r)
    assert(snap(jv) === expected, "salting must be invisible to serving")

    // layout: the hot key's 200 join rows SPREAD across emit buckets
    // (unsalted they all share hash('HOT')'s single bucket)
    val hotShardBuckets = jv.store.df("t_salt")
      .filter(col("emit_value.l_jk") === "HOT")
      .select("emit_key").as[String].collect()
      .map(k => BucketedViewStore.bucketOf(k, 8))
    assert(hotShardBuckets.toSet.size >= 3,
      s"hot rows landed in only ${hotShardBuckets.toSet.size} buckets")
    val maxShare = hotShardBuckets.groupBy(identity).values.map(_.length).max
    assert(maxShare <= 100,
      s"one bucket still owns $maxShare of the 200 hot rows")

    // a 2-row delta ON the hot key dirties only the salt shards those
    // pks map to — bucket-scoped I/O ∝ delta, not ∝ hot-key size
    val stats = jv.refreshLeft(
      Seq((1L, "HOT", 101L), (2L, "HOT", 102L)).toDF("l_pk", "l_jk", "l_val"), None)
    assert(stats.emitBucketsRewritten <= 2,
      s"2 changed hot rows rewrote ${stats.emitBucketsRewritten} join buckets")
    assert(snap(jv) === (expected -- Set((1L, "HOT", 1L, 0.0), (2L, "HOT", 2L, 0.0))
      ++ Set((1L, "HOT", 101L, 0.0), (2L, "HOT", 102L, 0.0))))

    // key-addressed serving fans out to the bounded S shards and still
    // returns every hot row
    assert(jv.byKeys(Seq("HOT").toDF("k")).count() === 200L)

    // right-side delta on the hot key: every hot row legitimately
    // rewrites (the delta really touches them all), across shards
    jv.refreshRight(Seq((1000L, "HOT", 9.0)).toDF("r_pk", "r_jk", "r_val"), None)
    assert(jv.byKeys(Seq("HOT").toDF("k"))
      .filter(col("r_val") === 9.0).count() === 200L)
  }

  test("composite join keys: escaped spelling survives separator-bearing parts, salted and unsalted") {
    // two STRING parts chosen adversarially: a naive concat_ws(U+0001)
    // spelling would collide ("a\u0001", "x") with ("a", "\u0001x") and
    // truncate at the embedded separator; the escaped CompositeKey
    // spelling must keep them distinct keys end to end. The "e\u0002e"
    // part exercises the escape character itself (ESC-doubling).
    val kA1 = "a\u0001"; val kA2 = "x"       // tuple 1
    val kB1 = "a"; val kB2 = "\u0001x"       // tuple 2 (concat_ws-collides with 1)
    val kE1 = "e\u0002e"; val kE2 = "y"      // escape-char part
    def left(rows: (Long, String, String, Long)*) =
      rows.toSeq.toDF("l_pk", "l_j1", "l_j2", "l_val")
    def right(rows: (Long, String, String, Double)*) =
      rows.toSeq.toDF("r_pk", "r_j1", "r_j2", "r_val")
    def mk(name: String, salt: Int) = new JoinView(
      BucketedViewStore.temp(spark, 8), name,
      "l_pk", Seq("l_j1", "l_j2"), Seq("l_pk", "l_j1", "l_j2", "l_val"),
      "r_pk", Seq("r_j1", "r_j2"), Seq("r_pk", "r_j1", "r_j2", "r_val"),
      saltBuckets = salt)
    for ((salt, nm) <- Seq(1 -> "t_comp", 4 -> "t_comp_s")) {
      val jv = mk(nm, salt)
      jv.build(
        left((1L, kA1, kA2, 10L), (2L, kB1, kB2, 20L), (3L, kE1, kE2, 30L),
          (4L, "plain", "k", 40L)),
        right((100L, kA1, kA2, 1.0), (101L, kB1, kB2, 2.0),
          (102L, kE1, kE2, 3.0), (103L, "other", "k", 4.0)))
      // each tuple joins ONLY its own right row — no cross-collision
      assert(jv.df.select("l_pk", "r_val").as[(Long, Double)].collect().toSet ===
        Set((1L, 1.0), (2L, 2.0), (3L, 3.0)), s"salt=$salt")

      // left delta: pk 4 moves onto the separator-bearing tuple 1;
      // pk 1 deleted
      jv.refreshLeft(left((4L, kA1, kA2, 41L)),
        Some(left((1L, "z", "z", 0L)).select(col("l_pk").cast("string"))))
      assert(jv.df.select("l_pk", "r_val").as[(Long, Double)].collect().toSet ===
        Set((4L, 1.0), (2L, 2.0), (3L, 3.0)), s"salt=$salt")

      // right delta THROUGH the sidecar's spelled dirty keys: tuple 1
      // re-valued, tuple 2's row deleted — only tuple 1's left rows
      // rewrite, tuple 2's retract, the escape tuple is untouched
      jv.refreshRight(right((100L, kA1, kA2, 9.0)),
        Some(right((101L, "z", "z", 0.0)).select(col("r_pk").cast("string"))))
      assert(jv.df.select("l_pk", "r_val").as[(Long, Double)].collect().toSet ===
        Set((4L, 9.0), (3L, 3.0)), s"salt=$salt")

      // key-addressed serving takes the SPELLED key
      import graft.engine.CompositeKey
      val spelled = left((0L, kA1, kA2, 0L))
        .select(CompositeKey.spell(Seq(col("l_j1"), col("l_j2"))).as("k"))
      assert(jv.byKeys(spelled).select("l_pk").as[Long].collect().toSet ===
        Set(4L), s"salt=$salt")
    }
  }

  test("composite keys: arity and coverage misuse fails loud") {
    val store = BucketedViewStore.temp(spark, 8)
    val e1 = intercept[IllegalArgumentException](new JoinView(store, "t_bad1",
      "l_pk", Seq("l_j1", "l_j2"), Seq("l_pk", "l_j1", "l_j2"),
      "r_pk", Seq("r_j1"), Seq("r_pk", "r_j1")))
    assert(e1.getMessage.contains("arity"))
    val e2 = intercept[IllegalArgumentException](new JoinView(store, "t_bad2",
      "l_pk", Seq("l_j1", "l_j2"), Seq("l_pk", "l_j1"),
      "r_pk", Seq("r_j1", "r_j2"), Seq("r_pk", "r_j1", "r_j2")))
    assert(e2.getMessage.contains("leftCols"))
  }

  test("full-outer composite keys: pads form, heal and re-pad on escaped key tuples") {
    // exercises refreshRpad's composite predicates: pad membership is
    // recomputed part-wise on the dirty SPELLED keys — the separator-
    // bearing twins must pad/heal independently
    val kA = ("a\u0001", "x"); val kB = ("a", "\u0001x")
    def left2(rows: (Long, String, String, Long)*) =
      rows.toSeq.toDF("l_pk", "l_j1", "l_j2", "l_val")
    def right2(rows: (Long, String, String, Double)*) =
      rows.toSeq.toDF("r_pk", "r_j1", "r_j2", "r_val")
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_fo_comp",
      "l_pk", Seq("l_j1", "l_j2"), Seq("l_pk", "l_j1", "l_j2", "l_val"),
      "r_pk", Seq("r_j1", "r_j2"), Seq("r_pk", "r_j1", "r_j2", "r_val"),
      saltBuckets = 3, joinType = "full_outer")
    def fsnap(): Set[(Option[Long], Option[Long])] =
      jv.df.select("l_pk", "r_pk")
        .as[(Option[Long], Option[Long])].collect().toSet
    // left on tuple A only; right on tuple B only -> one left-pad, one
    // right-pad (an unescaped spelling would wrongly match them)
    jv.build(left2((1L, kA._1, kA._2, 10L)), right2((100L, kB._1, kB._2, 1.0)))
    assert(fsnap() === Set((Some(1L), None), (None, Some(100L))))
    // a left arrival at tuple B heals its right-pad
    jv.refreshLeft(left2((2L, kB._1, kB._2, 20L)), None)
    assert(fsnap() === Set((Some(1L), None), (Some(2L), Some(100L))))
    // a right arrival at tuple A heals the left row into a real join
    jv.refreshRight(right2((101L, kA._1, kA._2, 2.0)), None)
    assert(fsnap() === Set((Some(1L), Some(101L)), (Some(2L), Some(100L))))
    // retracting tuple B's left row re-pads its right row
    jv.refreshLeft(left2(), Some(left2((2L, "z", "z", 0L))
      .select(col("l_pk").cast("string"))))
    assert(fsnap() === Set((Some(1L), Some(101L)), (None, Some(100L))))
    // retracting tuple A's right row re-pads the left row and drops the
    // join output through ownership
    jv.refreshRight(right2(), Some(right2((101L, "z", "z", 0.0))
      .select(col("r_pk").cast("string"))))
    assert(fsnap() === Set((Some(1L), None), (None, Some(100L))))
  }
}
