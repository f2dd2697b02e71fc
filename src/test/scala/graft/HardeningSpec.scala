package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{BucketedViewStore, JoinSketchView, JoinView, MapIndex, SketchQuantileView}
import graft.engine.MapIndex.emit

/** Round-17 hardening: the salted single-part-key write guard, the
  * empty-sketch NULL contract of `qsketch_quantile`, and the sketch
  * rollup (global + per-group quantiles from one state). */
class HardeningSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sep = 1.toChar.toString // the CompositeKey shard separator

  test("a salted single-column key containing the shard separator fails the write loudly") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_saltguard",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk"),
      saltBuckets = 4)
    val bad = Seq((1L, "a" + sep + "b", 10L)).toDF("l_pk", "l_jk", "l_val")
    val r = Seq((9L, "a")).toDF("r_pk", "r_jk")
    val err = intercept[Exception] { jv.build(bad, r) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("shard separator")),
      s"expected the shard-separator guard, got: $err")
    // clean single-part keys under the same salt build fine (the guard
    // compiles to one contains() and never fires)
    val jv2 = new JoinView(store, "t_saltguard_ok",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk"),
      saltBuckets = 4)
    val ok = Seq((1L, "a", 10L)).toDF("l_pk", "l_jk", "l_val")
    jv2.build(ok, r)
    assert(jv2.df.count() === 1L)
  }

  test("qsketch_quantile over an empty sketch is NULL and the column is nullable") {
    graft.functions.QuantileSketch.register(spark)
    val out = Seq(Option.empty[Double], Option.empty[Double]).toDF("v")
      .agg(expr("qsketch(v, 64)").as("sk"))
      .select(expr("qsketch_quantile(sk, 0.5)").as("q"),
        expr("qsketch_n(sk)").as("n"))
    // the sketch column itself is non-nullable (the aggregate always
    // serializes); the decoded quantile must STILL declare nullable —
    // an empty sketch decodes to NULL regardless of child nullability
    assert(out.schema("q").nullable,
      "qsketch_quantile must be nullable over a non-nullable sketch")
    val row = out.head()
    assert(row.isNullAt(0))
    assert(row.getLong(1) === 0L)
  }

  private def rankErr(vals: Seq[Double], est: Double, p: Double): Double = {
    val r = vals.count(_ <= est).toDouble
    math.abs(r - math.ceil(vals.size * p)) / vals.size
  }

  test("sketch rollup: the merged ALL row serves the global distribution from state alone") {
    val store = BucketedViewStore.temp(spark, 8)
    val idx = MapIndex.columns("qsr_base")(col("id").cast("string"),
      array(emit(col("g"), col("v"))))
    val v = new SketchQuantileView(store, idx, "qsr_base__state", k = 256)
    val rnd = new scala.util.Random(17)
    // deliberately skewed per-group ranges so the global distribution
    // differs from every per-group one
    val rows = (0 until 9000).map { i =>
      val g = i % 3
      (i.toLong, s"g$g", g * 100 + rnd.nextDouble() * 100)
    }
    v.build(rows.toDF("id", "g", "v"))
    val roll = v.quantilesRollup(Seq("q50" -> 0.5, "q95" -> 0.95)).collect()
    assert(roll.map(_.getString(0)).toSet === Set("g0", "g1", "g2", "ALL"))
    val all = roll.find(_.getString(0) == "ALL").get
    assert(all.getLong(1) === rows.size.toLong, "merged n must stay exact")
    val vals = rows.map(_._3)
    assert(rankErr(vals, all.getDouble(2), 0.5) <= 0.06)
    assert(rankErr(vals, all.getDouble(3), 0.95) <= 0.06)
    // per-group rows ride along unchanged
    val g1 = roll.find(_.getString(0) == "g1").get
    assert(g1.getLong(1) === rows.count(_._2 == "g1").toLong)
    assert(rankErr(rows.filter(_._2 == "g1").map(_._3), g1.getDouble(2), 0.5) <= 0.06)
    // maintenance keeps the rollup fresh: tombstone g2 entirely — the
    // ALL row must re-merge to just g0 + g1
    v.refresh(Seq.empty[(Long, String, Double)].toDF("id", "g", "v"),
      Some(rows.filter(_._2 == "g2").map(_._1).toDF("id")
        .select(col("id").cast("string"))))
    val roll2 = v.quantilesRollup(Seq("q50" -> 0.5)).collect()
    assert(roll2.map(_.getString(0)).toSet === Set("g0", "g1", "ALL"))
    val all2 = roll2.find(_.getString(0) == "ALL").get
    val vals2 = rows.filterNot(_._2 == "g2").map(_._3)
    assert(all2.getLong(1) === vals2.size.toLong)
    assert(rankErr(vals2, all2.getDouble(2), 0.5) <= 0.06)
  }

  test("sketch-over-join: per-key sketches maintain from the join CDC (merge, rebuild, vanish)") {
    val store = BucketedViewStore.temp(spark, 8)
    val jv = new JoinView(store, "t_jsk",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk"))
    val rnd = new scala.util.Random(7)
    var live = (0 until 3000).map(i => (i.toLong, s"g${i % 3}", rnd.nextDouble() * 100))
    val dims = Seq((100L, "g0"), (101L, "g1"), (102L, "g2"))
    jv.build(live.toDF("l_pk", "l_jk", "l_val"), dims.toDF("r_pk", "r_jk"))
    val sk = new JoinSketchView(jv, "t_jsk__state", "l_val", k = 256)
    sk.build()

    def check(expectKeys: Set[String]): Unit = {
      val byG = live.filter(r => expectKeys(r._2)).groupBy(_._2)
        .view.mapValues(_.map(_._3)).toMap
      val served = sk.quantiles(Seq("q50" -> 0.5)).collect()
      assert(served.map(_.getString(0)).toSet === byG.keySet)
      served.foreach { r =>
        val vals = byG(r.getString(0))
        assert(r.getLong(1) === vals.size.toLong, s"${r.getString(0)}: n exact")
        assert(rankErr(vals, r.getDouble(2), 0.5) <= 0.06)
      }
    }
    check(Set("g0", "g1", "g2"))

    // LEFT batch: inserts into g1 (merge path), upserts in g0 (value
    // +1000 — a retraction, rebuild path), tombstones in g2
    val ins = (3000 until 3800).map(i => (i.toLong, "g1", rnd.nextDouble() * 100))
    val ups = live.filter(r => r._2 == "g0" && r._1 % 5 == 0)
      .map(r => (r._1, r._2, r._3 + 1000))
    val dels = live.filter(r => r._2 == "g2" && r._1 % 4 == 0).map(_._1)
    jv.refreshLeft((ins ++ ups).toDF("l_pk", "l_jk", "l_val"),
      Some(dels.toDF("l_pk").select(col("l_pk").cast("string"))))
    live = live.filterNot(r => dels.contains(r._1))
      .map(r => if (r._2 == "g0" && r._1 % 5 == 0) (r._1, r._2, r._3 + 1000) else r) ++ ins
    sk.catchUp()
    check(Set("g0", "g1", "g2"))

    // RIGHT batch: dim g2 DROPS — its group's sketch must vanish
    jv.refreshRight(Seq.empty[(Long, String)].toDF("r_pk", "r_jk"),
      Some(Seq(102L).toDF("r_pk").select(col("r_pk").cast("string"))))
    live = live.filterNot(_._2 == "g2")
    sk.catchUp()
    check(Set("g0", "g1"))

    // rollup: ALL = g0 ∪ g1 from state alone
    val all = sk.quantilesRollup(Seq("q50" -> 0.5)).collect()
      .find(_.getString(0) == "ALL").get
    assert(all.getLong(1) === live.size.toLong)
    assert(rankErr(live.map(_._3), all.getDouble(2), 0.5) <= 0.06)

    // reopen from the persisted watermark: idempotent catch-up
    val re = JoinSketchView.attach(jv, "t_jsk__state", "l_val", k = 256)
    re.catchUp()
    check(Set("g0", "g1"))

    // padded upstreams are refused
    val fo = new JoinView(store, "t_jsk_fo",
      "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
      "r_pk", "r_jk", Seq("r_pk", "r_jk"), joinType = "full_outer")
    val err = intercept[IllegalArgumentException] {
      new JoinSketchView(fo, "t_jsk_fo__state", "l_val")
    }
    assert(err.getMessage.contains("pads right"))
  }
}
