package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{BucketedViewStore, JoinGroupingView, JoinView}

/** Maintained grouping-sets lattice ([[graft.engine.JoinGroupingView]]):
  * one CDC fold must keep EVERY set of the ROLLUP/CUBE lattice equal to
  * the from-scratch GROUP BY of the maintained relation. */
class JoinGroupingViewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def leftDf(rows: (Long, String, String, Long)*) =
    rows.toSeq.toDF("l_pk", "l_jk", "l_cat", "l_val")
  private def rightDf(rows: (Long, String, String)*) =
    rows.toSeq.toDF("r_pk", "r_jk", "r_seg")

  private def mkJv(store: BucketedViewStore, nm: String) =
    new JoinView(store, nm,
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_cat", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_seg"))

  /** From-scratch lattice of the CURRENT join relation, set by set. */
  private def expected(jv: JoinView, sets: Seq[Seq[String]],
      gcols: Seq[String]): Set[(Int, Option[String], Option[String], Long, Long)] =
    sets.flatMap { set =>
      val gid = gcols.zipWithIndex
        .collect { case (c, i) if !set.contains(c) => 1 << i }.sum
      val df0 = jv.df
      val grouped =
        if (set.isEmpty)
          df0.agg(count(lit(1)).as("cnt"), sum("l_val").as("s")).collect()
            .map(r => (None: Option[String], None: Option[String],
              r.getLong(0), r.getLong(1)))
        else {
          val df = df0.groupBy(set.map(col): _*)
            .agg(count(lit(1)).as("cnt"), sum("l_val").as("s")).collect()
          df.map { r =>
            val m = set.zipWithIndex.map { case (c, i) =>
              c -> Option(r.get(i)).map(_.toString)
            }.toMap
            (m.getOrElse(gcols(0), None), m.getOrElse(gcols(1), None),
              r.getLong(set.size), r.getLong(set.size + 1))
          }
        }
      grouped.map(g => (gid, g._1, g._2, g._3, g._4))
    }.toSet

  private def served(gv: JoinGroupingView): Set[(Int, Option[String], Option[String], Long, Long)] =
    gv.state.select(col("gid"), col("l_cat"), col("r_seg"), col("cnt"),
        col("sum_value").cast("long"))
      .as[(Int, Option[String], Option[String], Long, Long)].collect().toSet

  test("rollup and cube lattices maintain under deltas to both sides") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = mkJv(store, "t_lat")
    jv.build(
      leftDf((1L, "a", "x", 10L), (2L, "a", "y", 20L), (3L, "b", "x", 30L),
        (4L, "b", "y", 40L), (5L, "c", "x", 50L)),
      rightDf((100L, "a", "S1"), (101L, "b", "S2"), (102L, "c", "S1")))
    val gcols = Seq("l_cat", "r_seg")
    val rSets = JoinGroupingView.rollupSets(gcols)
    val cSets = JoinGroupingView.cubeSets(gcols)
    assert(rSets.toSet === Set(Seq(), Seq("l_cat"), Seq("l_cat", "r_seg")))
    assert(cSets.toSet === Set(Seq(), Seq("l_cat"), Seq("r_seg"),
      Seq("l_cat", "r_seg")))
    val roll = new JoinGroupingView(jv, "t_lat__roll", gcols, "l_val", rSets)
    val cube = new JoinGroupingView(jv, "t_lat__cube", gcols, "l_val", cSets)
    roll.build(); cube.build()
    assert(served(roll) === expected(jv, rSets, gcols))
    assert(served(cube) === expected(jv, cSets, gcols))

    // left delta: category flip, new row, tombstone — one CDC fold must
    // move every affected set
    jv.refreshLeft(leftDf((1L, "a", "y", 11L), (6L, "c", "z", 60L)),
      Some(leftDf((4L, "zz", "x", 0L)).select(col("l_pk").cast("string"))))
    val s1 = roll.catchUp(); cube.catchUp()
    assert(served(roll) === expected(jv, rSets, gcols))
    assert(served(cube) === expected(jv, cSets, gcols))
    assert(s1.emitBucketsRewritten < s1.totalBuckets,
      "a small delta must not rewrite every lattice bucket")

    // right delta: segment rename fans out to all its left rows; a
    // deleted right key retracts its join rows from every set
    jv.refreshRight(rightDf((100L, "a", "S3")),
      Some(rightDf((102L, "zz", "S0")).select(col("r_pk").cast("string"))))
    roll.catchUp(); cube.catchUp()
    assert(served(roll) === expected(jv, rSets, gcols))
    assert(served(cube) === expected(jv, cSets, gcols))

    // idempotent: an already-current lattice no-ops
    val s2 = roll.catchUp()
    assert(s2.emitBucketsRewritten === 0)

    // reopen from the persisted watermark: a fresh handle resumes and
    // serves identically with no catch-up needed
    val re = JoinGroupingView.attach(jv, "t_lat__roll", gcols, "l_val", rSets)
    assert(served(re) === expected(jv, rSets, gcols))
    re.catchUp()
    assert(served(re) === expected(jv, rSets, gcols))
  }

  test("a genuinely-null group value keys the lattice and serves as null") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_latn",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_cat", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_seg"),
      joinType = "left_outer")
    jv.build(
      leftDf((1L, "a", "x", 10L), (2L, "q", "x", 20L)),
      rightDf((100L, "a", "S1")))
    val gcols = Seq("l_cat", "r_seg")
    val sets = JoinGroupingView.rollupSets(gcols)
    val gv = new JoinGroupingView(jv, "t_latn__roll", gcols, "l_val", sets)
    gv.build()
    // pk 2 has no right match: r_seg is genuinely null in the (x, null)
    // group of the full set — distinct from the set that MASKS r_seg
    val full = served(gv).filter(_._1 == 0)
    assert(full === Set((0, Some("x"), Some("S1"), 1L, 10L),
      (0, Some("x"), None, 1L, 20L)))
    val masked = served(gv).filter(_._1 == 2)
    assert(masked === Set((2, Some("x"), None, 2L, 30L)))

    // the null-group row heals when the match arrives
    jv.refreshRight(rightDf((101L, "q", "S1")), None)
    gv.catchUp()
    assert(served(gv).filter(_._1 == 0) ===
      Set((0, Some("x"), Some("S1"), 2L, 30L)))
  }

  test("random history: every lattice set tracks the recomputed group-bys") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = mkJv(store, "t_lat_prop")
    val rnd = new scala.util.Random(9090)
    val jks = Vector("a", "b", "c")
    val cats = Vector("x", "y", "z")
    var ls = (0L until 18L).map(i =>
      (i, jks(rnd.nextInt(3)), cats(rnd.nextInt(3)), rnd.nextInt(40).toLong))
    var rs = (100L until 106L).map(i => (i, jks(rnd.nextInt(3)), "S" + rnd.nextInt(3)))
    jv.build(leftDf(ls: _*), rightDf(rs: _*))
    val gcols = Seq("l_cat", "r_seg")
    val sets = JoinGroupingView.cubeSets(gcols)
    val gv = new JoinGroupingView(jv, "t_lat_prop__cube", gcols, "l_val", sets)
    gv.build()
    for (step <- 0 until 4) {
      if (step % 2 == 0) {
        val upd = ls.filter(_ => rnd.nextBoolean()).map(r =>
          (r._1, jks(rnd.nextInt(3)), cats(rnd.nextInt(3)), r._4 + 1))
        val del = ls.filterNot(r => upd.exists(_._1 == r._1))
          .filter(_ => rnd.nextInt(3) == 0).map(_._1)
        jv.refreshLeft(leftDf(upd: _*),
          Some(del.toDF("l_pk").select(col("l_pk").cast("string"))))
        ls = ls.filterNot(r => upd.exists(_._1 == r._1) || del.contains(r._1)) ++ upd
      } else {
        val upd = rs.filter(_ => rnd.nextBoolean()).map(r =>
          (r._1, jks(rnd.nextInt(3)), "S" + rnd.nextInt(3)))
        val del = rs.filterNot(r => upd.exists(_._1 == r._1))
          .filter(_ => rnd.nextInt(3) == 0).map(_._1)
        jv.refreshRight(rightDf(upd: _*),
          Some(del.toDF("r_pk").select(col("r_pk").cast("string"))))
        rs = rs.filterNot(r => upd.exists(_._1 == r._1) || del.contains(r._1)) ++ upd
      }
      gv.catchUp()
      assert(served(gv) === expected(jv, sets, gcols), s"diverged at step $step")
    }
  }

  test("a pad-only group's sum serves as NULL (SQL SUM), healing to a value") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_latp",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_cat", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_seg"),
      joinType = "full_outer")
    jv.build(leftDf((1L, "a", "x", 10L)),
      rightDf((100L, "a", "S1"), (101L, "b", "S2")))
    // value from the LEFT side, grouped by the RIGHT segment: S2's only
    // member is the right-pad (null l_val) — its sum is NULL, not 0
    val gcols = Seq("r_seg")
    val gv = new JoinGroupingView(jv, "t_latp__roll", gcols, "l_val",
      JoinGroupingView.rollupSets(gcols))
    gv.build()
    def rows: Set[(Int, Option[String], Long, Option[Long])] =
      gv.state.select(col("gid"), col("r_seg"), col("cnt"),
          col("sum_value").cast("long"))
        .as[(Int, Option[String], Long, Option[Long])].collect().toSet
    assert(rows === Set((0, Some("S1"), 1L, Some(10L)),
      (0, Some("S2"), 1L, None), (1, None, 2L, Some(10L))))

    // the pad heals into a real row: S2's sum becomes a value — the
    // vcnt retraction machinery must flip NULL → 20 through pure deltas
    jv.refreshLeft(leftDf((2L, "b", "y", 20L)), None)
    gv.catchUp()
    assert(rows === Set((0, Some("S1"), 1L, Some(10L)),
      (0, Some("S2"), 1L, Some(20L)), (1, None, 2L, Some(30L))))
  }

  test("trackValues: exact min/max/distinct per (set, group) under deletes; all-null groups serve") {
    def leftN(rows: (Long, String, String, Option[Long])*) =
      rows.toSeq.toDF("l_pk", "l_jk", "l_cat", "l_val")
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_latm",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_cat", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_seg"))
    // cat "z" holds ONLY null values: cnt > 0 in the main state but no
    // refcount rows — the left-join serve path must keep it with null
    // min/max and distinct 0
    jv.build(
      leftN((1L, "a", "x", Some(10L)), (2L, "a", "x", Some(30L)),
        (3L, "a", "y", Some(30L)), (4L, "b", "y", Some(20L)),
        (5L, "b", "z", None), (6L, "b", "z", None)),
      rightDf((100L, "a", "S1"), (101L, "b", "S2")))
    val gcols = Seq("l_cat", "r_seg")
    val sets = JoinGroupingView.rollupSets(gcols)
    val gv = new JoinGroupingView(jv, "t_latm__roll", gcols, "l_val", sets,
      trackValues = true)
    gv.build()

    /** From-scratch multi-aggregate lattice of the current relation. */
    def expectedMulti(): Set[(Int, Option[String], Option[String], Long,
        Option[Long], Option[Long], Option[Long], Long)] =
      sets.flatMap { set =>
        val gid = gcols.zipWithIndex
          .collect { case (c, i) if !set.contains(c) => 1 << i }.sum
        val aggs = Seq(count(lit(1)).as("cnt"), sum("l_val").as("s"),
          min("l_val").as("mn"), max("l_val").as("mx"),
          count_distinct(col("l_val")).as("nd"))
        val rows =
          if (set.isEmpty) jv.df.agg(aggs.head, aggs.tail: _*).collect()
            .map(r => (None: Option[String], None: Option[String], r))
          else jv.df.groupBy(set.map(col): _*).agg(aggs.head, aggs.tail: _*)
            .collect().map { r =>
              val m = set.zipWithIndex.map { case (c, i) =>
                c -> Option(r.get(i)).map(_.toString) }.toMap
              (m.getOrElse(gcols(0), None), m.getOrElse(gcols(1), None), r)
            }
        rows.map { case (g1, g2, r) =>
          val n = set.size
          (gid, g1, g2, r.getLong(n),
            Option(r.get(n + 1)).map(_.toString.toLong),
            Option(r.get(n + 2)).map(_.toString.toLong),
            Option(r.get(n + 3)).map(_.toString.toLong),
            r.getLong(n + 4))
        }
      }.toSet

    def servedMulti(): Set[(Int, Option[String], Option[String], Long,
        Option[Long], Option[Long], Option[Long], Long)] =
      gv.stateMulti.select(col("gid"), col("l_cat"), col("r_seg"), col("cnt"),
          col("sum_value").cast("long"), col("min_value").cast("long"),
          col("max_value").cast("long"), col("n_distinct"))
        .as[(Int, Option[String], Option[String], Long, Option[Long],
          Option[Long], Option[Long], Long)].collect().toSet

    assert(servedMulti() === expectedMulti())
    // the all-null group is present with distinct 0
    assert(servedMulti().exists(r => r._2 == Some("z") && r._5.isEmpty &&
      r._6.isEmpty && r._8 == 0L))

    // LEFT delta: retract the (x, S1) MIN (pk 1, val 10) — the refcount
    // must surface the runner-up 30; retract one of the two equal 30s
    // across groups (multiplicity!); give "z" its first non-null value
    jv.refreshLeft(leftN((5L, "b", "z", Some(7L))),
      Some(leftN((1L, "zz", "x", None)).select(col("l_pk").cast("string"))))
    gv.catchUp()
    assert(servedMulti() === expectedMulti())

    // retract z's only non-null value again: back to null min/max, 0
    // distinct, while cnt stays > 0
    jv.refreshLeft(leftN((5L, "b", "z", None)), None)
    gv.catchUp()
    assert(servedMulti() === expectedMulti())
    assert(servedMulti().exists(r => r._2 == Some("z") && r._4 == 2L &&
      r._5.isEmpty && r._8 == 0L))

    // RIGHT delta flows into the refcount state too
    jv.refreshRight(rightDf((100L, "a", "S9")), None)
    gv.catchUp()
    assert(servedMulti() === expectedMulti())

    // attach with trackValues verifies both persisted schemas and
    // resumes from the watermark: an immediate catch-up no-ops
    val re = JoinGroupingView.attach(jv, "t_latm__roll", gcols, "l_val",
      sets, trackValues = true)
    val stats = re.catchUp()
    assert(stats.emitBucketsRewritten === 0)
    assert(servedMulti() === expectedMulti())
  }

  test("separator-bearing group values never collide lattice groups") {
    // under a raw concat_ws(U+0001) key spelling these two (cat, seg)
    // tuples spell the SAME state key — their counts would merge and
    // one group's fields would serve for both; the escaped spelling
    // must keep them distinct through build, fold and serve
    val cA = "x\u0001"; val sA = "y"
    val cB = "x"; val sB = "\u0001y"
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_latsep",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_cat", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_seg"))
    jv.build(
      leftDf((1L, "a", cA, 10L), (2L, "b", cB, 20L), (3L, "a", cA, 30L)),
      rightDf((100L, "a", sA), (101L, "b", sB)))
    val gcols = Seq("l_cat", "r_seg")
    val sets = JoinGroupingView.rollupSets(gcols)
    val gv = new JoinGroupingView(jv, "t_latsep__roll", gcols, "l_val", sets)
    gv.build()
    assert(served(gv) === expected(jv, sets, gcols))
    // the finest set must hold TWO distinct (cat, seg) groups
    val fine = served(gv).filter(_._1 == 0)
    assert(fine.size === 2, s"collided: $fine")
    assert(fine === Set((0, Some(cA), Some(sA), 2L, 40L),
      (0, Some(cB), Some(sB), 1L, 20L)))
    // a delta against ONE of the twins must leave the other untouched
    jv.refreshLeft(leftDf((1L, "a", cA, 11L)), None)
    gv.catchUp()
    assert(served(gv) === expected(jv, sets, gcols))
    assert(served(gv).filter(_._1 == 0) === Set(
      (0, Some(cA), Some(sA), 2L, 41L), (0, Some(cB), Some(sB), 1L, 20L)))
  }
}
