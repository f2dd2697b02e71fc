package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{BucketedViewStore, FilterJoinView}

/** Semi/anti join IVM ([[graft.engine.FilterJoinView]]): membership
  * flips under change batches to either side must land exactly the
  * recomputed EXISTS / NOT EXISTS filter. */
class FilterJoinViewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def leftDf(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("l_pk", "l_jk", "l_val")
  private def rightDf(rows: (Long, String)*) =
    rows.toSeq.toDF("r_pk", "r_jk")

  private def mk(store: BucketedViewStore, nm: String, mode: String) =
    new FilterJoinView(store, nm,
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"), "r_pk", "r_jk", mode)

  private def snap(v: FilterJoinView): Set[Long] =
    v.df.select("l_pk").as[Long].collect().toSet

  test("semi and anti membership flips under both delta sides") {
    val store = BucketedViewStore.temp(spark, 8)
    val semi = mk(store, "t_semi", "semi")
    val anti = mk(store, "t_anti", "anti")
    val l0 = leftDf((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "a", 40L))
    val r0 = rightDf((100L, "a"), (101L, "b"), (102L, "b"))
    semi.build(l0, r0); anti.build(l0, r0)
    assert(snap(semi) === Set(1L, 2L, 4L), "a and b match; c does not")
    assert(snap(anti) === Set(3L))

    // LEFT batch: pk 3 hops c→b (anti→semi flip), pk 5 arrives at d
    // (semi-out, anti-in), pk 1 deleted
    val delsL = Some(leftDf((1L, "zz", 0L)).select(col("l_pk").cast("string")))
    semi.refreshLeft(leftDf((3L, "b", 31L), (5L, "d", 50L)), delsL)
    anti.refreshLeft(leftDf((3L, "b", 31L), (5L, "d", 50L)), delsL)
    assert(snap(semi) === Set(2L, 3L, 4L))
    assert(snap(anti) === Set(5L))

    // RIGHT batch: key a's only right row is deleted (4 flips out of
    // semi, into anti); key d gains a right row (5 flips the other
    // way); one of b's TWO rows is deleted — b's membership must NOT
    // flip (multiplicity-insensitive)
    val s1 = semi.refreshRight(rightDf((103L, "d")),
      Some(rightDf((100L, "zz"), (101L, "zz")).select(col("r_pk").cast("string"))))
    anti.refreshRight(rightDf((103L, "d")),
      Some(rightDf((100L, "zz"), (101L, "zz")).select(col("r_pk").cast("string"))))
    assert(snap(semi) === Set(2L, 3L, 5L))
    assert(snap(anti) === Set(4L))
    assert(s1.emitBucketsRewritten < s1.totalBuckets,
      "a small right delta must not rewrite every view bucket")

    // each left row serves at most once regardless of match count
    assert(semi.df.count() === 3)
    assert(semi.byKeys(Seq("b").toDF("k")).select("l_pk")
      .as[Long].collect().toSet === Set(2L, 3L))

    // membership NOISE (b gains a second match — nobody flips) writes
    // nothing: zero view buckets rewritten, empty CDC delta
    val e0 = semi.epoch
    val s2b = semi.refreshRight(rightDf((104L, "b")), None)
    assert(snap(semi) === Set(2L, 3L, 5L))
    assert(s2b.emitBucketsRewritten === 0,
      "a flip-free right delta must rewrite zero view buckets")
    assert(semi.changes(e0, semi.epoch).count() === 0,
      "a flip-free right delta must emit an empty CDC sidecar")
  }

  test("salt shards are invisible to membership on a fully-hot key") {
    val store = BucketedViewStore.temp(spark, 8)
    val semi = new FilterJoinView(store, "t_semi_salt",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"), "r_pk", "r_jk", "semi",
      saltBuckets = 3)
    // every left row on one hot key; membership flips whole-key
    val ls = (0L until 10L).map(i => (i, "hot", i))
    semi.build(leftDf(ls: _*), rightDf((100L, "hot"), (101L, "cold")))
    assert(snap(semi) === ls.map(_._1).toSet)
    // the hot key's only match leaves: every shard's rows flip out
    semi.refreshRight(rightDf(),
      Some(rightDf((100L, "zz")).select(col("r_pk").cast("string"))))
    assert(snap(semi) === Set.empty[Long])
    // and back in
    semi.refreshRight(rightDf((102L, "hot")), None)
    assert(snap(semi) === ls.map(_._1).toSet)
    assert(semi.byKeys(Seq("hot").toDF("k")).count() === 10)
  }

  test("random history converges to the recomputed EXISTS / NOT EXISTS") {
    val store = BucketedViewStore.temp(spark, 8)
    val semi = mk(store, "t_semi_prop", "semi")
    val anti = mk(store, "t_anti_prop", "anti")
    val rnd = new scala.util.Random(1717)
    val jks = Vector("a", "b", "c", "d", "e")
    var ls = (0L until 20L).map(i => (i, jks(rnd.nextInt(5)), rnd.nextInt(50).toLong))
    var rs = (100L until 108L).map(i => (i, jks(rnd.nextInt(5))))
    semi.build(leftDf(ls: _*), rightDf(rs: _*))
    anti.build(leftDf(ls: _*), rightDf(rs: _*))
    def expect(m: String): Set[Long] = {
      val keys = rs.map(_._2).toSet
      ls.filter(r => if (m == "semi") keys(r._2) else !keys(r._2)).map(_._1).toSet
    }
    for (step <- 0 until 4) {
      if (step % 2 == 0) {
        val upd = ls.filter(_ => rnd.nextBoolean()).map(r =>
          (r._1, jks(rnd.nextInt(5)), r._3 + 1))
        val del = ls.filterNot(r => upd.exists(_._1 == r._1))
          .filter(_ => rnd.nextInt(3) == 0).map(_._1)
        val dels = Some(del.toDF("l_pk").select(col("l_pk").cast("string")))
        semi.refreshLeft(leftDf(upd: _*), dels)
        anti.refreshLeft(leftDf(upd: _*), dels)
        ls = ls.filterNot(r => upd.exists(_._1 == r._1) || del.contains(r._1)) ++ upd
      } else {
        val upd = rs.filter(_ => rnd.nextBoolean()).map(r =>
          (r._1, jks(rnd.nextInt(5))))
        val del = rs.filterNot(r => upd.exists(_._1 == r._1))
          .filter(_ => rnd.nextInt(3) == 0).map(_._1)
        val dels = Some(del.toDF("r_pk").select(col("r_pk").cast("string")))
        semi.refreshRight(rightDf(upd: _*), dels)
        anti.refreshRight(rightDf(upd: _*), dels)
        rs = rs.filterNot(r => upd.exists(_._1 == r._1) || del.contains(r._1)) ++ upd
      }
      assert(snap(semi) === expect("semi"), s"semi diverged at step $step")
      assert(snap(anti) === expect("anti"), s"anti diverged at step $step")
    }
  }

  test("composite join keys: membership on separator-bearing tuples, salted") {
    def left2(rows: (Long, String, String, Long)*) =
      rows.toSeq.toDF("l_pk", "l_j1", "l_j2", "l_val")
    def right2(rows: (Long, String, String)*) =
      rows.toSeq.toDF("r_pk", "r_j1", "r_j2")
    val store = BucketedViewStore.temp(spark, 8)
    def mk2(nm: String, mode: String) = new FilterJoinView(store, nm,
      "l_pk", Seq("l_j1", "l_j2"), Seq("l_pk", "l_j1", "l_j2", "l_val"),
      "r_pk", Seq("r_j1", "r_j2"), mode, saltBuckets = 3)
    val semi = mk2("t_semi_comp", "semi")
    val anti = mk2("t_anti_comp", "anti")
    // the concat_ws-colliding pair: tuple A has a right match, tuple B
    // does NOT — an unescaped spelling would leak B into the semi view
    val kA = ("a\u0001", "x"); val kB = ("a", "\u0001x")
    val l0 = left2((1L, kA._1, kA._2, 10L), (2L, kB._1, kB._2, 20L),
      (3L, "plain", "k", 30L))
    val r0 = right2((100L, kA._1, kA._2), (101L, "plain", "k"))
    semi.build(l0, r0); anti.build(l0, r0)
    assert(snap(semi) === Set(1L, 3L))
    assert(snap(anti) === Set(2L))
    // RIGHT batch: tuple B gains its row (2 flips in), tuple A loses
    // its row (1 flips out) — the sidecar's spelled dirty keys route
    // each flip to the right tuple only
    val ups = right2((102L, kB._1, kB._2))
    val dels = Some(right2((100L, "z", "z")).select(col("r_pk").cast("string")))
    semi.refreshRight(ups, dels); anti.refreshRight(ups, dels)
    assert(snap(semi) === Set(2L, 3L))
    assert(snap(anti) === Set(1L))
  }

  test("generic cascade: the semi view feeds a downstream JoinView by CDC replay") {
    import graft.engine.JoinView
    val store = BucketedViewStore.temp(spark, 8)
    val semi = new FilterJoinView(store, "t_semi_casc",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_cat", "l_val"), "r_pk", "r_jk", "semi")
    def left3(rows: (Long, String, String, Long)*) =
      rows.toSeq.toDF("l_pk", "l_jk", "l_cat", "l_val")
    val down = new JoinView(store, "t_semi_casc_dn",
      "l_pk", "l_cat", Seq("l_pk", "l_jk", "l_cat", "l_val"),
      "d_pk", "d_cat", Seq("d_pk", "d_cat", "d_w"))
    def dimDf(rows: (Long, String, Double)*) =
      rows.toSeq.toDF("d_pk", "d_cat", "d_w")
    var lRows = Seq((1L, "a", "x", 10L), (2L, "a", "y", 20L),
      (3L, "b", "x", 30L), (4L, "c", "y", 40L))
    var rKeys = Seq((100L, "a"), (101L, "b"))
    val dim = Seq((7L, "x", 1.5), (8L, "y", 2.5))
    semi.build(left3(lRows: _*), rKeys.toSeq.toDF("r_pk", "r_jk"))
    down.build(semi.df, dimDf(dim: _*))

    def expected(): Set[(Long, Double)] =
      lRows.filter(r => rKeys.exists(_._2 == r._2))
        .map(r => (r._1, dim.find(_._2 == r._3).get._3)).toSet
    def snap3(): Set[(Long, Double)] =
      down.df.select("l_pk", "d_w").as[(Long, Double)].collect().toSet
    assert(snap3() === expected())

    // LEFT batch: pk 4 hops c->a (flips INTO membership), pk 1 deleted;
    // the downstream learns both purely from the semi view's CDC
    var from = semi.epoch
    semi.refreshLeft(left3((4L, "a", "y", 41L)),
      Some(left3((1L, "z", "z", 0L)).select(col("l_pk").cast("string"))))
    semi.cascadeInto(down, from, semi.epoch)
    lRows = lRows.filterNot(r => r._1 == 1L || r._1 == 4L) :+ (4L, "a", "y", 41L)
    assert(snap3() === expected())

    // RIGHT batch: key a purged — every 'a' row flips OUT; the flips
    // reach the downstream as ordinary tombstones through the replay
    from = semi.epoch
    semi.refreshRight(Seq.empty[(Long, String)].toDF("r_pk", "r_jk"),
      Some(Seq(100L).toDF("r_pk").select(col("r_pk").cast("string"))))
    semi.cascadeInto(down, from, semi.epoch)
    rKeys = rKeys.filterNot(_._1 == 100L)
    assert(snap3() === expected())

    // a FLIP-FREE level-1 refresh cascades an empty delta harmlessly
    from = semi.epoch
    semi.refreshRight(Seq((102L, "b")).toDF("r_pk", "r_jk"), None)
    semi.cascadeInto(down, from, semi.epoch)
    assert(snap3() === expected())

    // misuse fails loud: wrong downstream pk; padded upstream
    val bad = new JoinView(store, "t_semi_casc_bad",
      "other_pk", "o_cat", Seq("other_pk", "o_cat"),
      "d_pk", "d_cat", Seq("d_pk", "d_cat"))
    val e1 = intercept[IllegalArgumentException](
      semi.cascadeInto(bad, 0, semi.epoch))
    assert(e1.getMessage.contains("pk"))
    val padded = new JoinView(store, "t_semi_casc_fo",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"), joinType = "full_outer")
    padded.build(leftDf((1L, "a", 1L)), rightDf((9L, "a")).withColumn("r_val", lit(1.0)))
    val e2 = intercept[IllegalArgumentException](
      padded.cascadeInto(down, 0, padded.epoch))
    assert(e2.getMessage.contains("left-keyed"))
  }
}
