package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{BucketedViewStore, JoinAggView, JoinGroupingView, JoinView, MapIndex}

/** Multi-measure maintained rollups ([[graft.engine.Measures]]): N
  * measures fold in ONE pass into ONE state row per group — same row
  * count as the single-measure layout — with SQL's NULL-sum rule held
  * independently per measure, and the lattice's key-spelling generation
  * stamp guarding attach. */
class MeasuresSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // l_v2 is nullable: group "b" holds ONLY null v2 values, so its v2
  // sum must serve as SQL-NULL while its v1 sum is a number
  private def leftDf(rows: (Long, String, String, Option[Long], Option[Long])*) =
    rows.toSeq.toDF("l_pk", "l_jk", "l_cat", "l_v1", "l_v2")
  private def rightDf(rows: (Long, String, String)*) =
    rows.toSeq.toDF("r_pk", "r_jk", "r_seg")

  private def mkJv(store: BucketedViewStore, nm: String) =
    new JoinView(store, nm,
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_cat", "l_v1", "l_v2"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_seg"))

  private def baseLeft = leftDf(
    (1L, "a", "x", Some(10L), Some(1L)), (2L, "a", "y", Some(20L), None),
    (3L, "b", "x", Some(30L), None), (4L, "b", "y", Some(40L), None),
    (5L, "c", "x", Some(50L), Some(5L)))
  private def baseRight = rightDf(
    (100L, "a", "S1"), (101L, "b", "S2"), (102L, "c", "S1"))

  /** From-scratch two-measure aggregate of the CURRENT join relation. */
  private def expected(jv: JoinView): Set[(String, Long, Long, Option[Long], Long, Option[Long])] =
    jv.df.groupBy("l_cat")
      .agg(count(lit(1)).as("cnt"),
        count(col("l_v1")).as("n1"), sum("l_v1").as("s1"),
        count(col("l_v2")).as("n2"), sum("l_v2").as("s2"))
      .as[(String, Long, Long, Option[Long], Long, Option[Long])]
      .collect().toSet

  private def served(agg: JoinAggView): Set[(String, Long, Long, Option[Long], Long, Option[Long])] =
    agg.state.select(col("emit_key"), col("cnt"),
        col("vcnt_l_v1"), col("sum_l_v1").cast("long"),
        col("vcnt_l_v2"), col("sum_l_v2").cast("long"))
      .as[(String, Long, Long, Option[Long], Long, Option[Long])]
      .collect().toSet

  test("two measures fold in one pass; per-measure NULL-sum; one state row per group") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = mkJv(store, "t_msr")
    jv.build(baseLeft, baseRight)
    val agg = new JoinAggView(jv, "t_msr__roll", "l_cat",
      Seq("l_v1", "l_v2"))
    agg.build()
    assert(served(agg) === expected(jv))
    // group "x" has some null v2 (row 3), group "y" ONLY null v2 at
    // this point -> its s2 must be None (SQL NULL), its s1 a number
    assert(served(agg).find(_._1 == "y").get._6 === None)

    // one state row per group + the watermark sentinel: the multi-
    // measure layout must NOT widen the row count vs single-measure
    val single = new JoinAggView(jv, "t_msr__roll1", "l_cat", "l_v1")
    single.build()
    assert(store.df("t_msr__roll").count() === store.df("t_msr__roll1").count())

    // deltas to both sides, folded per measure from one CDC feed: a
    // v2 arriving in group "y" must flip its sum NULL -> number, and
    // tombstones must retract both measures
    jv.refreshLeft(leftDf((2L, "a", "y", Some(21L), Some(2L))),
      Some(leftDf((4L, "zz", "x", None, None)).select(col("l_pk").cast("string"))))
    agg.catchUp(); single.catchUp()
    assert(served(agg) === expected(jv))
    assert(served(agg).find(_._1 == "y").get._6 === Some(2L))
    jv.refreshRight(rightDf((103L, "c", "S3")),
      Some(rightDf((100L, "a", "S1")).select(col("r_pk").cast("string"))))
    agg.catchUp(); single.catchUp()
    assert(served(agg) === expected(jv))
    assert(store.df("t_msr__roll").count() === store.df("t_msr__roll1").count())

    // attach (durable reopen) verifies the per-measure fields and
    // resumes idempotently from the persisted watermark
    val re = JoinAggView.attach(jv, "t_msr__roll", "l_cat", Seq("l_v1", "l_v2"))
    re.catchUp() // already current: no-op
    assert(served(re) === expected(jv))
    // a measure list the stored state never folded is rejected loudly
    val bad = intercept[IllegalArgumentException] {
      JoinAggView.attach(jv, "t_msr__roll", "l_cat", Seq("l_v1", "l_cat"))
    }
    assert(bad.getMessage.contains("rebuild"))
  }

  /** From-scratch two-measure lattice of the CURRENT join relation. */
  private def expectedLat(jv: JoinView, sets: Seq[Seq[String]],
      gcols: Seq[String]): Set[(Int, Option[String], Option[String], Long, Option[Long], Option[Long])] =
    sets.flatMap { set =>
      val gid = gcols.zipWithIndex
        .collect { case (c, i) if !set.contains(c) => 1 << i }.sum
      val aggs = Seq(count(lit(1)).as("cnt"), sum("l_v1").as("s1"),
        sum("l_v2").as("s2"))
      val rows =
        if (set.isEmpty) jv.df.agg(aggs.head, aggs.tail: _*).collect()
          .map(r => (None: Option[String], None: Option[String],
            r.getLong(0), Option(r.get(1)).map(_.toString.toLong),
            Option(r.get(2)).map(_.toString.toLong)))
        else jv.df.groupBy(set.map(col): _*).agg(aggs.head, aggs.tail: _*)
          .collect().map { r =>
            val m = set.zipWithIndex.map { case (c, i) =>
              c -> Option(r.get(i)).map(_.toString)
            }.toMap
            (m.getOrElse(gcols(0), None), m.getOrElse(gcols(1), None),
              r.getLong(set.size),
              Option(r.get(set.size + 1)).map(_.toString.toLong),
              Option(r.get(set.size + 2)).map(_.toString.toLong))
          }
      rows.map(g => (gid, g._1, g._2, g._3, g._4, g._5))
    }.toSet

  private def servedLat(gv: JoinGroupingView): Set[(Int, Option[String], Option[String], Long, Option[Long], Option[Long])] =
    gv.state.select(col("gid"), col("l_cat"), col("r_seg"), col("cnt"),
        col("sum_l_v1").cast("long"), col("sum_l_v2").cast("long"))
      .as[(Int, Option[String], Option[String], Long, Option[Long], Option[Long])]
      .collect().toSet

  test("lattice twin folds both measures into every set from one CDC feed") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = mkJv(store, "t_msrlat")
    jv.build(baseLeft, baseRight)
    val gcols = Seq("l_cat", "r_seg")
    val sets = JoinGroupingView.rollupSets(gcols)
    val gv = new JoinGroupingView(jv, "t_msrlat__roll", gcols,
      Seq("l_v1", "l_v2"), sets)
    gv.build()
    assert(servedLat(gv) === expectedLat(jv, sets, gcols))
    jv.refreshLeft(leftDf((1L, "a", "y", Some(11L), None), (6L, "c", "z", Some(60L), Some(6L))),
      Some(leftDf((4L, "zz", "x", None, None)).select(col("l_pk").cast("string"))))
    gv.catchUp()
    assert(servedLat(gv) === expectedLat(jv, sets, gcols))
    jv.refreshRight(rightDf((101L, "b", "S9")), None)
    gv.catchUp()
    assert(servedLat(gv) === expectedLat(jv, sets, gcols))
    // reopen: per-measure fields + spelling-generation stamp verified
    val re = JoinGroupingView.attach(jv, "t_msrlat__roll", gcols,
      Seq("l_v1", "l_v2"), sets)
    re.catchUp()
    assert(servedLat(re) === expectedLat(jv, sets, gcols))
  }

  test("attach rejects a lattice persisted under an older key-spelling generation") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = mkJv(store, "t_gen")
    jv.build(baseLeft, baseRight)
    val gcols = Seq("l_cat", "r_seg")
    val sets = JoinGroupingView.rollupSets(gcols)
    val gv = new JoinGroupingView(jv, "t_gen__roll", gcols, "l_v1", sets)
    gv.build()
    // the stamp rides in the watermark row's vcnt field
    val stamped = store.get("t_gen__roll", JoinAggView.WatermarkKey)
      .select(col("emit_value.vcnt")).as[Long].head()
    assert(stamped === 2L)
    // forge a pre-escape store: rewrite the watermark row with gen 0 —
    // the same state-view index spelling the lattice itself uses
    val idx = MapIndex.columns("t_gen__roll")(
      col("emit_key").cast("string"),
      array(MapIndex.emit(col("emit_key"),
        struct(col("gid"), col("cnt"), col("vcnt"), col("sum_value"),
          col("g_l_cat"), col("g_r_seg")))))
    val forged = spark.range(1).select(
      lit(JoinAggView.WatermarkKey).as("emit_key"), lit(0).as("gid"),
      lit(0L).as("cnt"), lit(0L).as("vcnt"),
      lit(0).cast("decimal(28,4)").as("sum_value"),
      lit(null).cast("string").as("g_l_cat"),
      lit(null).cast("string").as("g_r_seg"))
    store.refresh(idx, forged, None)
    val err = intercept[IllegalArgumentException] {
      JoinGroupingView.attach(jv, "t_gen__roll", gcols, "l_v1", sets)
    }
    assert(err.getMessage.contains("key-spelling generation"))
  }
}
