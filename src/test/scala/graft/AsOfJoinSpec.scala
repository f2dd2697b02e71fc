package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOfJoin, AsOfJoinExec}

/** The native as-of join operator: semantics, plan shape, extension
  * wiring, and exact agreement with the union+window spelling. */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("asof backward: basic semantics, ties, and no-match nulls") {
    val probes = Seq(
      (1L, "u1", 10L), // after both clicks at 5,8 -> 8 wins
      (2L, "u1", 5L),  // equal to click ts=5 (inclusive) -> 5
      (3L, "u1", 4L),  // before every click -> null
      (4L, "u2", 99L), // u2 has no clicks -> null
      (5L, "u3", 7L)   // two clicks at ts=7 -> larger tie id wins
    ).toDF("p_id", "user", "p_ts")
    val builds = Seq(
      (101L, "u1", 5L, 1.5),
      (102L, "u1", 8L, 2.5),
      (103L, "u3", 7L, 10.0),
      (104L, "u3", 7L, 20.0)
    ).toDF("c_id", "c_user", "c_ts", "c_value")
    val got = AsOfJoin.backward(probes, builds,
        Seq("user"), Seq("c_user"), "p_ts", "c_ts", rightTie = Seq("c_id"))
      .select(col("p_id"), col("c_value"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got === Map(
      1L -> Some(2.5), 2L -> Some(1.5), 3L -> None, 4L -> None, 5L -> Some(20.0)))
  }

  test("asof backward: null probe keys/times never match; null build rows ignored") {
    val probes = Seq(
      (1L, Some("u1"), Some(10L)),
      (2L, None, Some(10L)),       // null key -> null extend
      (3L, Some("u1"), None)       // null time -> null extend
    ).toDF("p_id", "user", "p_ts")
    val builds = Seq(
      (101L, Some("u1"), Some(5L), 1.5),
      (102L, None, Some(1L), 7.7),       // null key build row: ignored
      (103L, Some("u1"), None, 8.8)      // null time build row: ignored
    ).toDF("c_id", "c_user", "c_ts", "c_value")
    val got = AsOfJoin.backward(probes, builds,
        Seq("user"), Seq("c_user"), "p_ts", "c_ts", rightTie = Seq("c_id"))
      .select(col("p_id"), col("c_value"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got === Map(1L -> Some(1.5), 2L -> None, 3L -> None))
  }

  test("asof backward: self-join inputs are de-ambiguated") {
    val ev = Seq((1L, "u1", 3L, 0.5), (2L, "u1", 7L, 1.5)).toDF("id", "user", "ts", "v")
    // both sides from the SAME DataFrame: attribute ids collide unless the
    // operator re-aliases the build side
    val got = AsOfJoin.backward(ev, ev, Seq("user"), Seq("user"), "ts", "ts", Seq("id"))
    val out = got.queryExecution.analyzed.output
    assert(out.map(_.exprId).distinct.length === out.length,
      "build side must get fresh attribute ids")
    // inclusive backward: each row at least matches itself
    assert(got.count() === 2)
  }

  test("asof backward: plan uses AsOfJoinExec with clustered exchanges") {
    val probes = Seq((1L, "u1", 10L)).toDF("p_id", "user", "p_ts")
    val builds = Seq((101L, "u1", 5L, 1.5)).toDF("c_id", "c_user", "c_ts", "c_value")
    val df = AsOfJoin.backward(probes, builds,
      Seq("user"), Seq("c_user"), "p_ts", "c_ts", Seq("c_id"))
    df.collect() // finalize any adaptive re-planning first
    // string-match: AQE wraps stages in leaf QueryStageExec nodes that
    // tree-collect cannot traverse
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"expected AsOfJoinExec in:\n$plan")
    // both children must arrive clustered + sorted (key, time[, tie]) —
    // Catalyst inserts the exchanges and sorts from the required
    // distribution/ordering
    assert(plan.split("hashpartitioning").length - 1 >= 2, s"expected two exchanges in:\n$plan")
    assert(plan.split("Sort \\[").length - 1 >= 2, s"expected per-side sorts in:\n$plan")
    assert(plan.contains("c_id"), s"expected tie column in the build sort in:\n$plan")
  }

  test("asof forward: first at-or-after wins, smallest tie, no-match nulls") {
    val probes = Seq(
      (1L, "u1", 6L),  // clicks at 5,8 -> 8 is first at-or-after
      (2L, "u1", 8L),  // equal ts (inclusive) -> 8
      (3L, "u1", 9L),  // after every click -> null
      (4L, "u2", 1L),  // u2 has no clicks -> null
      (5L, "u3", 7L),  // two clicks at ts=7 -> SMALLER tie id wins
      (6L, "u3", 7L)   // same head serves a second probe (not consumed)
    ).toDF("p_id", "user", "p_ts")
    val builds = Seq(
      (101L, "u1", 5L, 1.5),
      (102L, "u1", 8L, 2.5),
      (103L, "u3", 7L, 10.0),
      (104L, "u3", 7L, 20.0)
    ).toDF("c_id", "c_user", "c_ts", "c_value")
    val got = AsOfJoin.forward(probes, builds,
        Seq("user"), Seq("c_user"), "p_ts", "c_ts", rightTie = Seq("c_id"))
      .select(col("p_id"), col("c_value"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got === Map(
      1L -> Some(2.5), 2L -> Some(2.5), 3L -> None, 4L -> None,
      5L -> Some(10.0), 6L -> Some(10.0)))
  }

  test("asof tolerance: bounds the match distance inclusively, both directions") {
    val probes = Seq(
      (1L, "u1", 10L), // nearest earlier click at 8: dist 2 <= 3 -> match
      (2L, "u1", 20L), // nearest earlier click at 8: dist 12 > 3 -> null
      (3L, "u1", 11L)  // dist 3, inclusive boundary -> match
    ).toDF("p_id", "user", "p_ts")
    val builds = Seq(
      (101L, "u1", 5L, 1.5),
      (102L, "u1", 8L, 2.5)
    ).toDF("c_id", "c_user", "c_ts", "c_value")
    val back = AsOfJoin.backward(probes, builds,
        Seq("user"), Seq("c_user"), "p_ts", "c_ts", Seq("c_id"),
        tolerance = Some(3L))
      .select(col("p_id"), col("c_value"))
      .as[(Long, Option[Double])].collect().toMap
    assert(back === Map(1L -> Some(2.5), 2L -> None, 3L -> Some(2.5)))

    val fprobes = Seq(
      (1L, "u1", 3L), // next click at 5: dist 2 <= 2 -> match
      (2L, "u1", 1L), // next click at 5: dist 4 > 2 -> null
      (3L, "u1", 6L)  // next click at 8: dist 2 (boundary) -> match
    ).toDF("p_id", "user", "p_ts")
    val fwd = AsOfJoin.forward(fprobes, builds,
        Seq("user"), Seq("c_user"), "p_ts", "c_ts", Seq("c_id"),
        tolerance = Some(2L))
      .select(col("p_id"), col("c_value"))
      .as[(Long, Option[Double])].collect().toMap
    assert(fwd === Map(1L -> Some(1.5), 2L -> None, 3L -> Some(2.5)))
  }

  test("asof tolerance: rejected for non-integral time columns at build time") {
    val probes = Seq((1L, "u1", 1.5)).toDF("p_id", "user", "p_ts")
    val builds = Seq((101L, "u1", 1.0, 1.5)).toDF("c_id", "c_user", "c_ts", "c_value")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(probes, builds,
        Seq("user"), Seq("c_user"), "p_ts", "c_ts", Nil, tolerance = Some(1L))
    }
    assert(e.getMessage.contains("tolerance requires"))
  }

  test("asof native agrees exactly with the union+window spelling on events") {
    val native = SparkEntry.queries("join_asof_native")(spark, sf)
    val window = SparkEntry.queries("join_asof")(spark, sf)
    assert(native.schema.fieldNames === window.schema.fieldNames)
    val n = native.as[(Long, Long, Option[Double])].collect().toSeq
    val w = window.as[(Long, Long, Option[Double])].collect().toSeq
    assert(n.nonEmpty)
    assert(n === w)
  }

  test("GraftExtensions wires functions and the as-of strategy at build time") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // a session built with the extensions resolves native functions from
      // plain SQL with no register() call...
      val h = ext.sql("SELECT simhash64('the quick brown fox') AS h").collect().head.getLong(0)
      val h2 = ext.sql("SELECT simhash64('the quick brown fox') AS h").collect().head.getLong(0)
      assert(h === h2)
      // the quantile-sketch family rides the same injection (agg + scalar)
      val q = ext.sql(
        "SELECT qsketch_quantile(qsketch(CAST(v AS DOUBLE)), 0.5) AS q " +
          "FROM VALUES (1.0), (2.0), (3.0) t(v)").collect().head.getDouble(0)
      assert(q === 2.0)
      // ...and carries the injected planner strategy (not via experimental)
      assert(ext.experimental.extraStrategies.isEmpty)
      assert(ext.sessionState.planner.strategies.contains(graft.plans.AsOfJoinStrategy))
      import ext.implicits._
      val probes = Seq((1L, "u1", 10L)).toDF("p_id", "user", "p_ts")
      val builds = Seq((101L, "u1", 5L, 1.5)).toDF("c_id", "c_user", "c_ts", "c_value")
      val got = AsOfJoin.backward(probes, builds,
          Seq("user"), Seq("c_user"), "p_ts", "c_ts", Seq("c_id"))
        .select(col("c_value")).as[Option[Double]].collect()
      assert(got.toSeq === Seq(Some(1.5)))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("asof nearest: argmin |dt|, ties backward, per-side tie rules, tolerance") {
    val probes = Seq((1L, "u1", 14L), (2L, "u1", 18L), (3L, "u1", 15L),
      (4L, "u2", 5L), (5L, "u3", 9L)).toDF("p_id", "user", "p_ts")
    val builds = Seq((101L, "u1", 10L, 1.0), (102L, "u1", 20L, 2.0),
      (103L, "u1", 20L, 3.0), (109L, "u2", 50L, 9.0))
      .toDF("c_id", "c_user", "c_ts", "c_value")
    def run(tol: Option[Long]) =
      AsOfJoin.nearest(probes, builds, Seq("user"), Seq("c_user"),
          "p_ts", "c_ts", Seq("c_id"), tolerance = tol)
        .select("p_id", "c_id", "c_value")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
    // 14 -> backward 10 (d4) beats forward 20 (d6); 18 -> forward wins
    // (d2), equal-time pair resolves to the LEAST id; 15 -> EQUAL
    // distance 5 both ways resolves backward; u2 -> forward-only match;
    // u3 -> no candidate
    assert(run(None) === Set(
      (1L, Some(101L), Some(1.0)), (2L, Some(102L), Some(2.0)),
      (3L, Some(101L), Some(1.0)), (4L, Some(109L), Some(9.0)),
      (5L, None, None)))
    // tolerance 4: probe 2's forward d2 stays, probe 1's backward d4
    // stays, probe 3 loses BOTH d5 sides, u2's d45 drops
    assert(run(Some(4L)) === Set(
      (1L, Some(101L), Some(1.0)), (2L, Some(102L), Some(2.0)),
      (3L, None, None), (4L, None, None), (5L, None, None)))
  }

  test("asof nearest: a probe AT a build time takes it backward (distance zero)") {
    val probes = Seq((1L, "u1", 20L)).toDF("p_id", "user", "p_ts")
    val builds = Seq((101L, "u1", 20L, 1.0), (102L, "u1", 21L, 2.0))
      .toDF("c_id", "c_user", "c_ts", "c_value")
    val got = AsOfJoin.nearest(probes, builds, Seq("user"), Seq("c_user"),
        "p_ts", "c_ts", Seq("c_id"))
      .select("c_id").as[Option[Long]].collect().toSeq
    assert(got === Seq(Some(101L)))
  }

  test("asof nearest: null probe time pads; null build time never matches") {
    val probes = Seq((1L, "u1", Some(15L)), (2L, "u1", None))
      .toDF("p_id", "user", "p_ts")
    val builds = Seq((101L, "u1", Some(10L), 1.0), (103L, "u1", None, 9.0))
      .toDF("c_id", "c_user", "c_ts", "c_value")
    val got = AsOfJoin.nearest(probes, builds, Seq("user"), Seq("c_user"),
        "p_ts", "c_ts", Seq("c_id"))
      .select("p_id", "c_id").as[(Long, Option[Long])].collect().toSet
    assert(got === Set((1L, Some(101L)), (2L, None)))
  }
}
