package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{AsOfJoinView, BucketedViewStore, JoinAggView}

/** As-of join IVM ([[graft.engine.AsOfJoinView]]): maintenance under
  * change batches to either side must land exactly the recomputed
  * backward as-of join (greatest right ts ≤ left ts, ties to the
  * greatest right pk), with partition-scoped I/O. The from-scratch
  * arbiter is a plain-Scala argmax over the final row sets — fully
  * independent of the engine's pick plan. */
class AsOfJoinViewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // probes: (p_pk, p_jk, p_ts, p_val); quotes: (q_pk, q_jk, q_ts, q_px)
  private def probes(rows: (Long, String, Long, Long)*) =
    rows.toSeq.toDF("p_pk", "p_jk", "p_ts", "p_val")
  private def quotes(rows: (Long, String, Long, Double)*) =
    rows.toSeq.toDF("q_pk", "q_jk", "q_ts", "q_px")

  private def mk(store: BucketedViewStore, nm: String) =
    new AsOfJoinView(store, nm,
      "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"))

  private def snap(v: AsOfJoinView): Set[(Long, Option[Long], Option[Double])] =
    v.df.select("p_pk", "q_pk", "q_px")
      .as[(Long, Option[Long], Option[Double])].collect().toSet

  /** Independent arbiter: the as-of argmax computed row-at-a-time in
    * plain Scala from the two input row sets. */
  private def expected(ls: Seq[(Long, String, Long, Long)],
      rs: Seq[(Long, String, Long, Double)]): Set[(Long, Option[Long], Option[Double])] =
    ls.map { case (pk, jk, ts, _) =>
      val m = rs.filter(r => r._2 == jk && r._3 <= ts)
        .sortBy(r => (r._3, r._1)).lastOption
      (pk, m.map(_._1), m.map(_._4))
    }.toSet

  test("build is the backward as-of join: inclusive bound, pk tie-break, null pad") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = mk(store, "t_asof_build")
    val ls = Seq((100L, "a", 5L, 1L), (101L, "a", 10L, 1L), (102L, "a", 15L, 1L),
      (103L, "a", 25L, 1L), (104L, "b", 40L, 1L), (105L, "c", 7L, 1L))
    val rs = Seq((1L, "a", 10L, 1.0), (2L, "a", 20L, 2.0),
      (3L, "a", 20L, 3.0), (9L, "b", 50L, 9.0))
    v.build(probes(ls: _*), quotes(rs: _*))
    assert(snap(v) === expected(ls, rs))
    // spot the classes: ts 5 precedes every quote (pad); ts 10 matches
    // inclusively; the equal-ts pair (q2, q3) resolves to the greater pk
    assert(snap(v).contains((100L, None, None)))
    assert(snap(v).contains((101L, Some(1L), Some(1.0))))
    assert(snap(v).contains((103L, Some(3L), Some(3.0))))
  }

  test("left and right deltas maintain the pick exactly, bucket-pruned") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = mk(store, "t_asof_ivm")
    var ls = Seq((100L, "a", 5L, 1L), (101L, "a", 10L, 1L), (102L, "a", 15L, 1L),
      (103L, "a", 25L, 1L), (104L, "b", 40L, 1L), (106L, "b", 60L, 1L))
    var rs = Seq((1L, "a", 10L, 1.0), (2L, "a", 20L, 2.0),
      (3L, "a", 20L, 3.0), (9L, "b", 50L, 9.0))
    v.build(probes(ls: _*), quotes(rs: _*))

    // LEFT delta: 102 hops to ts 30 (match shifts q1→q3), new probe 107
    // lands on b (matches q9), 101 retracts — all classes in one batch
    val s1 = v.refreshLeft(probes((102L, "a", 30L, 2L), (107L, "b", 55L, 1L)),
      Some(probes((101L, "zz", 0L, 0L)).select(col("p_pk").cast("string"))))
    ls = ls.filterNot(_._1 == 101L).filterNot(_._1 == 102L) ++
      Seq((102L, "a", 30L, 2L), (107L, "b", 55L, 1L))
    assert(snap(v) === expected(ls, rs))
    assert(s1.emitBucketsRewritten < s1.totalBuckets,
      "a small left delta must not rewrite every join bucket")

    // RIGHT delta: q4 arrives at (a, 22) and steals 103 and 102; q1
    // retracts so 101-era matches fall back (100 stays padded); q9
    // retracts so 104/107 heal back to pads; q10 re-keys b at ts 45
    val s2 = v.refreshRight(quotes((4L, "a", 22L, 4.0), (10L, "b", 45L, 10.0)),
      Some(quotes((1L, "zz", 0L, 0.0), (9L, "zz", 0L, 0.0))
        .select(col("q_pk").cast("string"))))
    rs = rs.filterNot(r => r._1 == 1L || r._1 == 9L) ++
      Seq((4L, "a", 22L, 4.0), (10L, "b", 45L, 10.0))
    assert(snap(v) === expected(ls, rs))
    assert(s2.emitBucketsRewritten < s2.totalBuckets,
      "a small right delta must not rewrite every join bucket")
    assert(snap(v).contains((103L, Some(4L), Some(4.0))), "steal")
    assert(snap(v).contains((104L, None, None)), "heal back to pad")

    // serving by key is a pruned read
    assert(v.byKeys(Seq("b").toDF("k")).select("p_pk")
      .as[Long].collect().toSet === Set(104L, 106L, 107L))

    // a DOMINATED candidate (beats no probe's current pick, ineligible
    // for the padded one) changes no output: the re-pick diffs against
    // the stored rows, rewrites zero buckets, and the CDC delta is
    // empty — a hot key's facts don't rewrite for timeline noise
    val before = snap(v)
    val e0 = v.epoch
    val s3 = v.refreshRight(quotes((12L, "b", 41L, 12.0)), None)
    assert(snap(v) === before)
    assert(s3.emitBucketsRewritten === 0,
      "a no-op right delta must rewrite zero join buckets")
    assert(v.changes(e0, v.epoch).count() === 0,
      "a no-op right delta must emit an empty CDC sidecar")
  }

  test("salt shards are invisible: the salted view equals the argmax") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = new AsOfJoinView(store, "t_asof_salt",
      "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"),
      saltBuckets = 3)
    // a HOT key: every row on "a" — shards must neither split the
    // timeline (the pick sees all candidates) nor leak into serving
    var ls = (0L until 12L).map(i => (i, "a", i * 10L, i))
    var rs = (100L until 106L).map(i => (i, "a", (i - 100L) * 17L, i.toDouble))
    v.build(probes(ls: _*), quotes(rs: _*))
    assert(snap(v) === expected(ls, rs))
    v.refreshLeft(probes((3L, "a", 95L, 3L)), Some(probes((5L, "zz", 0L, 0L))
      .select(col("p_pk").cast("string"))))
    ls = ls.filterNot(r => r._1 == 3L || r._1 == 5L) :+ (3L, "a", 95L, 3L)
    assert(snap(v) === expected(ls, rs))
    v.refreshRight(quotes((106L, "a", 50L, 6.5)), Some(quotes((102L, "zz", 0L, 0.0))
      .select(col("q_pk").cast("string"))))
    rs = rs.filterNot(_._1 == 102L) :+ (106L, "a", 50L, 6.5)
    assert(snap(v) === expected(ls, rs))
    // bucket-pruned serving fans out to the bounded S shards per key
    assert(v.byKeys(Seq("a").toDF("k")).count() === ls.size)
  }

  test("random history converges to the plain-Scala argmax") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = mk(store, "t_asof_prop")
    val rnd = new scala.util.Random(4242)
    val jks = Vector("a", "b", "c", "d")
    var ls = (0L until 24L).map(i =>
      (i, jks(rnd.nextInt(4)), rnd.nextInt(100).toLong, rnd.nextInt(10).toLong))
    var rs = (100L until 112L).map(i =>
      (i, jks(rnd.nextInt(4)), rnd.nextInt(100).toLong, rnd.nextInt(9).toDouble))
    v.build(probes(ls: _*), quotes(rs: _*))
    for (step <- 0 until 4) {
      if (step % 2 == 0) {
        val upd = ls.filter(_ => rnd.nextBoolean()).map(r =>
          (r._1, jks(rnd.nextInt(4)), rnd.nextInt(100).toLong, r._4 + 1))
        val del = ls.filterNot(r => upd.exists(_._1 == r._1))
          .filter(_ => rnd.nextInt(3) == 0).map(_._1)
        v.refreshLeft(probes(upd: _*),
          Some(del.toDF("p_pk").select(col("p_pk").cast("string"))))
        ls = ls.filterNot(r => upd.exists(_._1 == r._1) || del.contains(r._1)) ++ upd
      } else {
        val upd = rs.filter(_ => rnd.nextBoolean()).map(r =>
          (r._1, jks(rnd.nextInt(4)), rnd.nextInt(100).toLong, r._4 + 0.5))
        val del = rs.filterNot(r => upd.exists(_._1 == r._1))
          .filter(_ => rnd.nextInt(3) == 0).map(_._1)
        v.refreshRight(quotes(upd: _*),
          Some(del.toDF("q_pk").select(col("q_pk").cast("string"))))
        rs = rs.filterNot(r => upd.exists(_._1 == r._1) || del.contains(r._1)) ++ upd
      }
      assert(snap(v) === expected(ls, rs), s"diverged at step $step")
    }
  }

  test("forward direction picks the least ts >= (ties: least pk) and maintains") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = new AsOfJoinView(store, "t_asof_fwd",
      "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"),
      direction = "forward")
    v.build(
      probes((100L, "a", 5L, 1L), (101L, "a", 15L, 1L), (102L, "a", 25L, 1L),
        (103L, "a", 20L, 1L)),
      quotes((1L, "a", 10L, 1.0), (2L, "a", 20L, 2.0), (3L, "a", 20L, 3.0)))
    // ts 5 → next is q1(10); ts 15 → the equal-ts pair resolves to the
    // LEAST pk (q2); ts 20 matches inclusively (q2); ts 25 → nothing
    assert(snap(v) === Set((100L, Some(1L), Some(1.0)),
      (101L, Some(2L), Some(2.0)), (103L, Some(2L), Some(2.0)),
      (102L, None, None)))
    // deleting q2 shifts the tie to q3; a new later quote catches 102
    v.refreshRight(quotes((4L, "a", 30L, 4.0)),
      Some(quotes((2L, "zz", 0L, 0.0)).select(col("q_pk").cast("string"))))
    assert(snap(v) === Set((100L, Some(1L), Some(1.0)),
      (101L, Some(3L), Some(3.0)), (103L, Some(3L), Some(3.0)),
      (102L, Some(4L), Some(4.0))))
  }

  test("tolerance expires picks beyond the bound, and maintains through deltas") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = new AsOfJoinView(store, "t_asof_tol",
      "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"),
      tolerance = Some((l, r) => l - r <= lit(5L)))
    v.build(
      probes((100L, "a", 15L, 1L), (101L, "a", 30L, 1L)),
      quotes((1L, "a", 8L, 1.0), (2L, "a", 12L, 2.0)))
    // 100's closest is q2 (diff 3, in bound); 101's closest is also q2
    // but diff 18 exceeds the bound → pad (q1 is even farther)
    assert(snap(v) === Set((100L, Some(2L), Some(2.0)), (101L, None, None)))
    // a fresh quote inside 101's window heals it; moving q2 out of
    // 100's window expires that pick back to q1 (diff 7 → also out → pad)
    v.refreshRight(quotes((2L, "a", 27L, 2.5)), None)
    assert(snap(v) === Set((100L, None, None), (101L, Some(2L), Some(2.5))))
  }

  test("a JoinAggView over the as-of view is a maintained attribution rollup") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = mk(store, "t_asof_roll")
    val ls = Seq((100L, "a", 12L, 5L), (101L, "a", 25L, 7L), (102L, "a", 30L, 2L),
      (103L, "b", 40L, 4L), (104L, "b", 5L, 6L))
    val rs = Seq((1L, "a", 10L, 1.0), (2L, "a", 20L, 2.0), (9L, "b", 35L, 9.0))
    v.build(probes(ls: _*), quotes(rs: _*))
    // revenue per touchpoint (q_pk), the null group = unattributed
    val agg = new JoinAggView(v, "t_asof_roll__rollup", "q_pk", "p_val")
    agg.build()

    def served: Map[Option[String], (Long, Long)] =
      agg.state.select(col("emit_key"), col("cnt"),
          col("sum_value").cast("long"))
        .as[(Option[String], Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    assert(served === Map(Some("1") -> (1L, 5L), Some("2") -> (2L, 9L),
      Some("9") -> (1L, 4L), None -> (1L, 6L)))

    // a right retraction reflows attribution; the rollup catches up
    // from the as-of view's CDC alone
    v.refreshRight(quotes(), Some(quotes((2L, "zz", 0L, 0.0))
      .select(col("q_pk").cast("string"))))
    agg.catchUp()
    assert(served === Map(Some("1") -> (3L, 14L), Some("9") -> (1L, 4L),
      None -> (1L, 6L)), "q2's probes fall back to q1")

    // a left batch (re-valued + retracted probes), same CDC-only path
    v.refreshLeft(probes((100L, "a", 12L, 8L)),
      Some(probes((104L, "zz", 0L, 0L)).select(col("p_pk").cast("string"))))
    agg.catchUp()
    assert(served === Map(Some("1") -> (3L, 17L), Some("9") -> (1L, 4L)),
      "unattributed group vanishes with its probe")
  }

  test("nearest direction: argmin |dt|, distance ties backward, per-side pk ties, maintained") {
    def expectedNearest(ls: Seq[(Long, String, Long, Long)],
        rs: Seq[(Long, String, Long, Double)]): Set[(Long, Option[Long], Option[Double])] =
      ls.map { case (pk, jk, ts, _) =>
        val back = rs.filter(r => r._2 == jk && r._3 <= ts)
          .sortBy(r => (r._3, r._1)).lastOption
        val fwd = rs.filter(r => r._2 == jk && r._3 >= ts)
          .sortBy(r => (r._3, r._1)).headOption
        val m = (back, fwd) match {
          case (Some(b), Some(f)) => if (ts - b._3 <= f._3 - ts) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
        (pk, m.map(_._1), m.map(_._4))
      }.toSet
    val store = BucketedViewStore.temp(spark, 8)
    val v = new AsOfJoinView(store, "t_asof_near",
      "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"),
      direction = "nearest")
    // probe 101 at ts 14: back q1(10, d4) vs fwd q2/q3(20, d6) -> back;
    // probe 102 at ts 18: back d8 vs fwd d2 -> forward, equal-ts pair
    // resolves to the LEAST pk (q2); probe 103 at ts 15: EQUAL distance
    // 5 both ways -> backward wins; probe 104: only a forward candidate
    var ls = Seq((101L, "a", 14L, 1L), (102L, "a", 18L, 1L),
      (103L, "a", 15L, 1L), (104L, "b", 5L, 1L), (105L, "c", 9L, 1L))
    var rs = Seq((1L, "a", 10L, 1.0), (2L, "a", 20L, 2.0),
      (3L, "a", 20L, 3.0), (9L, "b", 50L, 9.0))
    v.build(probes(ls: _*), quotes(rs: _*))
    assert(snap(v) === expectedNearest(ls, rs))
    assert(snap(v).contains((101L, Some(1L), Some(1.0))), "nearer backward")
    assert(snap(v).contains((102L, Some(2L), Some(2.0))), "forward, least pk")
    assert(snap(v).contains((103L, Some(1L), Some(1.0))), "distance tie -> backward")
    assert(snap(v).contains((104L, Some(9L), Some(9.0))), "forward-only match")
    assert(snap(v).contains((105L, None, None)), "no candidate -> pad")

    // deltas re-pick under nearest on both sides
    v.refreshLeft(probes((101L, "a", 19L, 2L)),
      Some(probes((103L, "zz", 0L, 0L)).select(col("p_pk").cast("string"))))
    ls = ls.filterNot(r => r._1 == 101L || r._1 == 103L) :+ (101L, "a", 19L, 2L)
    assert(snap(v) === expectedNearest(ls, rs))
    v.refreshRight(quotes((4L, "a", 16L, 4.0)),
      Some(quotes((1L, "zz", 0L, 0.0)).select(col("q_pk").cast("string"))))
    rs = rs.filterNot(_._1 == 1L) :+ (4L, "a", 16L, 4.0)
    assert(snap(v) === expectedNearest(ls, rs))
  }

  test("nearest + tolerance: a nearer out-of-bound side loses to the farther in-bound one") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = new AsOfJoinView(store, "t_asof_near_tol",
      "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"),
      direction = "nearest",
      tolerance = Some((l, r) => abs(l - r) <= lit(6L)))
    // probe 100 at ts 20: back q1(18, d2) in bound; probe 101 at ts 10:
    // the nearer side is backward q2(2, d8) but it is OUT of bound while
    // forward q3(15, d5) is IN bound -> tolerance flips the choice to
    // forward. probe 102: both sides out of bound -> pad.
    v.build(
      probes((100L, "a", 20L, 1L), (101L, "b", 10L, 1L), (102L, "c", 50L, 1L)),
      quotes((1L, "a", 18L, 1.0), (2L, "b", 2L, 2.0), (3L, "b", 15L, 3.0),
        (4L, "c", 30L, 4.0), (5L, "c", 80L, 5.0)))
    assert(snap(v) === Set(
      (100L, Some(1L), Some(1.0)),
      (101L, Some(3L), Some(3.0)), // back d8 out of bound, fwd d5 wins
      (102L, None, None)))         // d20 / d30 both out
    // a right delta that lands a NEARER but out-of-bound candidate
    // changes nothing; one in bound steals
    v.refreshRight(quotes((6L, "b", 3L, 6.0)), None)
    assert(snap(v).contains((101L, Some(3L), Some(3.0))))
    v.refreshRight(quotes((7L, "b", 12L, 7.0)), None)
    assert(snap(v).contains((101L, Some(7L), Some(7.0))))
  }

  test("null timestamps never match: null-ts candidates drop, null-ts probes pad (both directions)") {
    def probesN(rows: (Long, String, Option[Long], Long)*) =
      rows.toSeq.toDF("p_pk", "p_jk", "p_ts", "p_val")
    def quotesN(rows: (Long, String, Option[Long], Double)*) =
      rows.toSeq.toDF("q_pk", "q_jk", "q_ts", "q_px")
    for ((dir, nm) <- Seq("backward" -> "t_asof_nullb", "forward" -> "t_asof_nullf",
        "nearest" -> "t_asof_nulln")) {
      val store = BucketedViewStore.temp(spark, 8)
      val v = new AsOfJoinView(store, nm,
        "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
        "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"),
        direction = dir)
      v.build(
        probesN((100L, "a", Some(15L), 1L), (101L, "a", None, 1L)),
        quotesN((1L, "a", Some(10L), 1.0), (2L, "a", Some(20L), 2.0),
          (3L, "a", None, 99.0)))
      val got = snap(v)
      assert(got.contains((101L, None, None)),
        s"$dir: a null-ts probe must take the pad, got $got")
      assert(!got.exists(_._2.contains(3L)),
        s"$dir: a null-ts candidate must never be picked, got $got")
    }
  }

  test("composite join keys on the as-of view: separator-bearing parts pick correctly") {
    def probes2(rows: (Long, String, String, Long, Long)*) =
      rows.toSeq.toDF("p_pk", "p_j1", "p_j2", "p_ts", "p_val")
    def quotes2(rows: (Long, String, String, Long, Double)*) =
      rows.toSeq.toDF("q_pk", "q_j1", "q_j2", "q_ts", "q_px")
    val store = BucketedViewStore.temp(spark, 8)
    val v = new AsOfJoinView(store, "t_asof_comp",
      "p_pk", Seq("p_j1", "p_j2"), "p_ts", Seq("p_pk", "p_j1", "p_j2", "p_ts", "p_val"),
      "q_pk", Seq("q_j1", "q_j2"), "q_ts", Seq("q_pk", "q_j1", "q_j2", "q_ts", "q_px"),
      saltBuckets = 3)
    // the concat_ws-colliding tuple pair: each probe must pick ONLY from
    // its own tuple's timeline
    val kA = ("a\u0001", "x"); val kB = ("a", "\u0001x")
    v.build(
      probes2((100L, kA._1, kA._2, 15L, 1L), (101L, kB._1, kB._2, 15L, 1L)),
      quotes2((1L, kA._1, kA._2, 10L, 1.0), (2L, kB._1, kB._2, 12L, 2.0),
        (3L, kB._1, kB._2, 14L, 3.0)))
    assert(snap(v) === Set((100L, Some(1L), Some(1.0)), (101L, Some(3L), Some(3.0))))
    // a right delta at ONE tuple leaves the colliding twin untouched
    v.refreshRight(quotes2((4L, kA._1, kA._2, 13L, 4.0)), None)
    assert(snap(v) === Set((100L, Some(4L), Some(4.0)), (101L, Some(3L), Some(3.0))))
    v.refreshLeft(probes2((101L, kB._1, kB._2, 11L, 1L)), None)
    assert(snap(v) === Set((100L, Some(4L), Some(4.0)), (101L, None, None)))
  }

  test("generic cascade: the as-of view feeds a downstream JoinView by CDC replay") {
    import graft.engine.JoinView
    val store = BucketedViewStore.temp(spark, 8)
    val v = mk(store, "t_asof_casc")
    // downstream: the as-of view's rows joined to a small dim on the
    // probe key — replay must carry retractions, re-keys and re-picks
    val down = new JoinView(store, "t_asof_casc_dn",
      "p_pk", "p_jk", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "d_pk", "d_jk", Seq("d_pk", "d_jk", "d_w"))
    def dimDf(rows: (Long, String, Double)*) =
      rows.toSeq.toDF("d_pk", "d_jk", "d_w")
    var ls = Seq((100L, "a", 10L, 1L), (101L, "a", 25L, 2L), (102L, "b", 40L, 3L))
    var rs = Seq((1L, "a", 5L, 1.0), (2L, "a", 20L, 2.0))
    val dim = Seq((7L, "a", 1.5), (8L, "b", 2.5))
    v.build(probes(ls: _*), quotes(rs: _*))
    down.build(v.df, dimDf(dim: _*))

    def snapDn(): Set[(Long, Double)] =
      down.df.select("p_pk", "d_w").as[(Long, Double)].collect().toSet
    def expectedDn(): Set[(Long, Double)] =
      ls.flatMap { case (pk, jk, _, _) =>
        dim.filter(_._2 == jk).map(d => (pk, d._3)) }.toSet
    assert(snapDn() === expectedDn())

    // a LEFT batch (probe re-keyed a->b, one retracted) replays into
    // the downstream off the as-of view's CDC alone
    var from = v.epoch
    v.refreshLeft(probes((101L, "b", 26L, 2L)),
      Some(probes((100L, "zz", 0L, 0L)).select(col("p_pk").cast("string"))))
    v.cascadeInto(down, from, v.epoch)
    ls = ls.filterNot(r => r._1 == 100L || r._1 == 101L) :+ (101L, "b", 26L, 2L)
    assert(snapDn() === expectedDn())

    // a RIGHT batch changes PICKS (not membership): the diffed as-of
    // delta reaches the downstream as upserts of only the re-picked
    // rows; row 102 keeps its pad-side emission (jk b has no quotes)
    from = v.epoch
    v.refreshRight(quotes((3L, "a", 30L, 3.0)), None)
    v.cascadeInto(down, from, v.epoch)
    rs = rs :+ (3L, "a", 30L, 3.0)
    assert(snapDn() === expectedDn())
    // and the downstream's own right side refreshes independently
    down.refreshRight(dimDf((8L, "b", 9.5)), None)
    assert(snapDn() === (expectedDn() -- Set((101L, 2.5), (102L, 2.5))
      ++ Set((101L, 9.5), (102L, 9.5))))
  }
}
