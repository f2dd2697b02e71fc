package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{AsOfJoinView, BucketedViewStore, FilterJoinView}

/** Round-17 as-of view surface: DATE timestamps under every direction
  * (nearest distances in epoch days), the fail-fast type check for
  * 'nearest' over undistanced types, the RIGHT-KEYED serving twin, and
  * the generalized cascade into a membership filter. */
class AsOfJoinViewExtSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def probesD(rows: (Long, String, String, Long)*) =
    rows.toSeq.toDF("p_pk", "p_jk", "p_d", "p_val")
      .select(col("p_pk"), col("p_jk"), col("p_d").cast("date").as("p_ts"), col("p_val"))
  private def quotesD(rows: (Long, String, String, Double)*) =
    rows.toSeq.toDF("q_pk", "q_jk", "q_d", "q_px")
      .select(col("q_pk"), col("q_jk"), col("q_d").cast("date").as("q_ts"), col("q_px"))

  private def mkD(store: BucketedViewStore, nm: String, dir: String) =
    new AsOfJoinView(store, nm,
      "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"),
      direction = dir)

  test("DATE timestamps work in all three directions (nearest = day distance)") {
    val store = BucketedViewStore.temp(spark, 8)
    val ls = Seq((100L, "a", "2024-01-10", 1L), (101L, "a", "2024-01-15", 1L),
      (102L, "a", "2024-01-02", 1L))
    val rs = Seq((1L, "a", "2024-01-08", 1.0), (2L, "a", "2024-01-20", 2.0))
    def snap(v: AsOfJoinView) =
      v.df.select("p_pk", "q_pk").as[(Long, Option[Long])].collect().toSet
    val b = mkD(store, "t_date_b", "backward")
    b.build(probesD(ls: _*), quotesD(rs: _*))
    assert(snap(b) === Set((100L, Some(1L)), (101L, Some(1L)), (102L, None)))
    val f = mkD(store, "t_date_f", "forward")
    f.build(probesD(ls: _*), quotesD(rs: _*))
    assert(snap(f) === Set((100L, Some(2L)), (101L, Some(2L)), (102L, Some(1L))))
    // nearest: Jan-10 is 2 days from q1 and 10 from q2 -> q1; Jan-15 is
    // 7 from q1 and 5 from q2 -> q2; Jan-02 is 6 from q1 only side
    val n = mkD(store, "t_date_n", "nearest")
    n.build(probesD(ls: _*), quotesD(rs: _*))
    assert(snap(n) === Set((100L, Some(1L)), (101L, Some(2L)), (102L, Some(1L))))
    // a date delta maintains the pick: a new quote 1 day after Jan-15
    n.refreshRight(quotesD((3L, "a", "2024-01-16", 3.0)), None)
    assert(snap(n).contains((101L, Some(3L))))
  }

  test("nearest over a STRING ts column fails fast at build, not silently") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = new AsOfJoinView(store, "t_str_n",
      "p_pk", "p_jk", "p_s", Seq("p_pk", "p_jk", "p_s"),
      "q_pk", "q_jk", "q_s", Seq("q_pk", "q_jk", "q_s"),
      direction = "nearest")
    val l = Seq((1L, "a", "x1")).toDF("p_pk", "p_jk", "p_s")
    val r = Seq((9L, "a", "x2")).toDF("q_pk", "q_jk", "q_s")
    val err = intercept[IllegalArgumentException] { v.build(l, r) }
    assert(err.getMessage.contains("nearest"))
    assert(err.getMessage.contains("timestamp"))
  }

  private def probesL(rows: (Long, String, Long, Long)*) =
    rows.toSeq.toDF("p_pk", "p_jk", "p_ts", "p_val")
  private def quotesL(rows: (Long, String, Long, Double)*) =
    rows.toSeq.toDF("q_pk", "q_jk", "q_ts", "q_px")

  test("rightKeyed twin serves by right pk and stays exact under re-picks and losses") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = new AsOfJoinView(store, "t_rk",
      "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"),
      rightKeyed = true)
    var ls = Seq((100L, "a", 5L, 1L), (101L, "a", 10L, 1L), (102L, "a", 25L, 1L),
      (104L, "b", 40L, 1L))
    var rs = Seq((1L, "a", 10L, 1.0), (2L, "a", 20L, 2.0), (9L, "b", 50L, 9.0))
    v.build(probesL(ls: _*), quotesL(rs: _*))

    def expectedFor(q: Long): Set[Long] = ls.flatMap { case (pk, jk, ts, _) =>
      rs.filter(r => r._2 == jk && r._3 <= ts)
        .sortBy(r => (r._3, r._1)).lastOption
        .filter(_._1 == q).map(_ => pk)
    }.toSet
    def servedFor(qs: Long*): Set[(Long, Long)] =
      v.byRightKeys(qs.map(_.toString).toDF("emit_key"))
        .select("p_pk", "q_pk").as[(Long, Long)].collect().toSet

    assert(servedFor(1L) === expectedFor(1L).map(p => (p, 1L)))
    assert(servedFor(2L) === expectedFor(2L).map(p => (p, 2L)))

    // LEFT batch: 101 hops keys (leaves q1 for q9's key), 100 retracts
    v.refreshLeft(probesL((101L, "b", 60L, 1L)),
      Some(probesL((100L, "zz", 0L, 0L)).select(col("p_pk").cast("string"))))
    ls = ls.filterNot(p => p._1 == 100L || p._1 == 101L) :+ (101L, "b", 60L, 1L)
    assert(servedFor(1L) === expectedFor(1L).map(p => (p, 1L)))
    assert(servedFor(9L) === expectedFor(9L).map(p => (p, 9L)))

    // RIGHT batch: a later quote STEALS 102 from q2; q2's twin rows
    // must retract (the lost match), the thief's must appear
    v.refreshRight(quotesL((3L, "a", 24L, 3.0)), None)
    rs = rs :+ (3L, "a", 24L, 3.0)
    assert(servedFor(2L) === expectedFor(2L).map(p => (p, 2L)))
    assert(servedFor(3L) === expectedFor(3L).map(p => (p, 3L)))

    // RIGHT delete: q9 retracts -> its probes fall back or pad; q9's
    // twin bucket must empty
    v.refreshRight(quotesL(), Some(quotesL((9L, "zz", 0L, 0.0))
      .select(col("q_pk").cast("string"))))
    rs = rs.filterNot(_._1 == 9L)
    assert(servedFor(9L) === Set.empty[(Long, Long)])

    // the plain view rejects the right-keyed read
    val plain = new AsOfJoinView(store, "t_rk_plain",
      "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"))
    plain.build(probesL(ls: _*), quotesL(rs: _*))
    val err = intercept[IllegalArgumentException] {
      plain.byRightKeys(Seq("1").toDF("emit_key"))
    }
    assert(err.getMessage.contains("rightKeyed"))
  }

  test("generic cascade: the as-of view feeds a downstream SEMI filter by CDC replay") {
    val store = BucketedViewStore.temp(spark, 8)
    val v = new AsOfJoinView(store, "t_casc_asof",
      "p_pk", "p_jk", "p_ts", Seq("p_pk", "p_jk", "p_ts", "p_val"),
      "q_pk", "q_jk", "q_ts", Seq("q_pk", "q_jk", "q_ts", "q_px"))
    // downstream: keep only probes whose JOIN KEY is in a live set
    val fv = new FilterJoinView(store, "t_casc_semi",
      "p_pk", "p_jk",
      Seq("p_pk", "p_jk", "p_ts", "p_val", "q_pk", "q_ts", "q_px"),
      "m_k", "m_k", "semi")
    val ls = Seq((100L, "a", 5L, 1L), (101L, "a", 15L, 1L), (104L, "b", 40L, 1L),
      (105L, "c", 9L, 1L))
    val rs = Seq((1L, "a", 10L, 1.0), (9L, "b", 50L, 9.0))
    val live = Seq("a", "b").toDF("m_k")
    v.build(probesL(ls: _*), quotesL(rs: _*))
    fv.build(v.df, live)
    def served: Set[(Long, Option[Long])] =
      fv.df.select("p_pk", "q_pk").as[(Long, Option[Long])].collect().toSet
    assert(served === Set((100L, None), (101L, Some(1L)), (104L, None)))
    // upstream LEFT batch: 105 hops to a live key, 104 retracts — the
    // downstream membership view hears it purely through CDC replay
    v.refreshLeft(probesL((105L, "a", 30L, 2L)),
      Some(probesL((104L, "zz", 0L, 0L)).select(col("p_pk").cast("string"))))
    v.cascadeInto(fv, 0, v.epoch)
    assert(served === Set((100L, None), (101L, Some(1L)), (105L, Some(1L))))
    // upstream RIGHT batch: a new quote re-picks 105 — the re-pick
    // arrives downstream as an ordinary upsert
    val from = v.epoch
    v.refreshRight(quotesL((2L, "a", 28L, 2.0)), None)
    v.cascadeInto(fv, from, v.epoch)
    assert(served === Set((100L, None), (101L, Some(1L)), (105L, Some(2L))))
    // downstream's OWN right batch: key "a" dies — its rows flip out
    fv.refreshRight(Seq("b").toDF("m_k"),
      Some(Seq("a").toDF("m_k").select(col("m_k").cast("string"))))
    assert(served === Set.empty[(Long, Option[Long])])
  }
}
