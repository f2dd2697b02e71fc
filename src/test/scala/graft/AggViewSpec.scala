package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{AggView, MapIndex, ViewStore}
import graft.engine.MapIndex.emit

/** The completed "reduce" half (engine/AggView.scala): incremental
  * grouped-aggregate maintenance must equal a from-scratch recompute
  * after ANY sequence of upserts and tombstones. */
class AggViewSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // index: key -> (category, amount); emissions grouped by category
  private val idx = MapIndex.columns("aggview_test")(
    col("id").cast("string"),
    array(emit(col("cat"), col("amt"))))

  private def src(rows: (Int, String, Double)*): DataFrame =
    rows.toDF("id", "cat", "amt")

  /** Collect the state as a comparable canonical form. */
  private def snap(agg: AggView): Map[String, (Long, BigDecimal, Double, Double)] =
    agg.state.collect().map { r =>
      r.getAs[String]("emit_key") -> ((
        r.getAs[Long]("cnt"),
        BigDecimal(r.getAs[java.math.BigDecimal]("sum_value")),
        r.getAs[Double]("min_value"),
        r.getAs[Double]("max_value")))
    }.toMap

  test("refresh merges deltas: upsert moves a row across groups; tombstone retracts") {
    val store = ViewStore.temp(spark)
    val base0 = idx.materialize(
      src((1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0), (4, "b", 7.0)), store)
    val agg0 = AggView.build(base0, "state")
    assert(snap(agg0) === Map(
      "a" -> ((2L, BigDecimal("30.0000"), 10.0, 20.0)),
      "b" -> ((2L, BigDecimal("12.0000"), 5.0, 7.0))))

    // row 2 moves a -> b with a new amount; row 3 tombstoned
    val (base1, agg1) = agg0.refresh(base0,
      src((2, "b", 99.0)), Some(Seq("3").toDF("src_key")))
    assert(snap(agg1) === Map(
      "a" -> ((1L, BigDecimal("10.0000"), 10.0, 10.0)),
      "b" -> ((2L, BigDecimal("106.0000"), 7.0, 99.0))))
    // and the maintained state equals a full recompute of the new base
    assert(snap(agg1) === snap(AggView.build(base1, "state_recomputed")))
  }

  test("a group whose last row is retracted vanishes, and can reappear later") {
    val store = ViewStore.temp(spark)
    val base0 = idx.materialize(src((1, "solo", 3.0), (2, "big", 8.0)), store)
    val agg0 = AggView.build(base0, "state")

    val (base1, agg1) = agg0.refresh(base0, src(), Some(Seq("1").toDF("src_key")))
    assert(snap(agg1) === Map("big" -> ((1L, BigDecimal("8.0000"), 8.0, 8.0))))

    val (_, agg2) = agg1.refresh(base1, src((9, "solo", 4.5)))
    assert(snap(agg2) === Map(
      "big" -> ((1L, BigDecimal("8.0000"), 8.0, 8.0)),
      "solo" -> ((1L, BigDecimal("4.5000"), 4.5, 4.5))))
  }

  test("min/max survive retraction of the current extremum (touched-group recompute)") {
    val store = ViewStore.temp(spark)
    val base0 = idx.materialize(
      src((1, "g", 1.0), (2, "g", 50.0), (3, "g", 10.0)), store)
    val agg0 = AggView.build(base0, "state")
    // delete the max AND the min in one batch: runner-ups must surface
    val (_, agg1) = agg0.refresh(base0, src(),
      Some(Seq("1", "2").toDF("src_key")))
    assert(snap(agg1) === Map("g" -> ((1L, BigDecimal("10.0000"), 10.0, 10.0))))
  }

  test("bucketed state: maintenance equals flat recompute; only touched buckets rewritten") {
    import graft.engine.{BucketedAggView, BucketedViewStore}
    val bstore = BucketedViewStore.temp(spark, numBuckets = 16)
    // many groups so the touched set maps to FEW buckets
    val rows = (1 to 200).map(i => (i, s"g${i % 40}", i * 1.0))
    val bav = BucketedAggView.build(bstore, idx, src(rows: _*), "bagg_state")
    def snapB = bav.state.collect().map { r =>
      r.getAs[String]("emit_key") -> ((
        r.getAs[Long]("cnt"),
        BigDecimal(r.getAs[java.math.BigDecimal]("sum_value")),
        r.getAs[Double]("min_value"), r.getAs[Double]("max_value")))
    }.toMap

    // upsert two rows (one moves groups) + tombstone one row
    val (baseStats, stateStats) = bav.refresh(idx,
      src((1, "g39", 500.0), (2, "g2", 3.25)),
      Some(Seq("3").toDF("src_key")))
    // the state write touched at most the buckets of the 4 affected groups
    // (g1 lost row 1, g39 gained it, g2 replaced row 2, g3 lost row 3)
    assert(stateStats.emitBucketsRewritten <= 4,
      s"state rewrite should be bucket-scoped, got $stateStats")
    assert(stateStats.emitBucketsRewritten < stateStats.totalBuckets)
    assert(baseStats.emitBucketsRewritten < baseStats.totalBuckets)

    // equivalence with a from-scratch flat recompute of the post base
    val truth = rows.filterNot(r => Set(1, 2, 3)(r._1)) ++
      Seq((1, "g39", 500.0), (2, "g2", 3.25))
    val expect = truth.groupBy(_._2).map { case (g, vs) =>
      val amts = vs.map(_._3)
      g -> ((amts.size.toLong,
        amts.map(a => BigDecimal(a).setScale(4)).sum.setScale(4),
        amts.min, amts.max))
    }
    assert(snapB === expect)
    // point read prunes to one bucket and returns the aggregate struct
    val g39 = bav.get("g39").collect()
    assert(g39.length === 1)
  }

  test("null emission values: skipped by sum/min/max, counted by cnt, paths agree") {
    val store = ViewStore.temp(spark)
    val nidx = MapIndex.columns("aggview_null")(
      col("id").cast("string"),
      array(emit(col("cat"), col("amt"))))
    def nsrc(rows: (Int, String, Option[Double])*): DataFrame =
      rows.toDF("id", "cat", "amt")
    val base0 = nidx.materialize(
      nsrc((1, "g", Some(2.0)), (2, "g", None), (3, "h", None)), store)
    val agg0 = AggView.build(base0, "state")
    // all-null group h: sum normalized to 0, min/max null, cnt counts rows
    val s0 = agg0.state.collect().map(r => r.getAs[String]("emit_key") ->
      ((r.getAs[Long]("cnt"), BigDecimal(r.getAs[java.math.BigDecimal]("sum_value")),
        Option(r.getAs[java.lang.Double]("min_value"))))).toMap
    assert(s0("g") === ((2L, BigDecimal("2.0000"), Some(2.0))))
    assert(s0("h") === ((1L, BigDecimal("0.0000"), None)))
    // maintenance over a null-valued upsert agrees with a full rebuild
    val (base1, agg1) = agg0.refresh(base0, nsrc((1, "g", None)))
    val a = agg1.state.orderBy("emit_key").collect().map(_.toSeq)
    val b = AggView.build(base1, "state_rb").state.orderBy("emit_key").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("non-numeric emission values are rejected at build time") {
    val store = ViewStore.temp(spark)
    val sidx = MapIndex.columns("aggview_str")(
      col("id").cast("string"),
      array(emit(col("cat"), col("txt"))))
    val base = sidx.materialize(
      Seq((1, "g", "not a number")).toDF("id", "cat", "txt"), store)
    val e = intercept[IllegalArgumentException](AggView.build(base, "state"))
    assert(e.getMessage.contains("numeric emission values"))
  }

  test("randomized batches: incremental state equals full recompute at every step") {
    val rnd = new scala.util.Random(42)
    val store = ViewStore.temp(spark)
    val cats = Vector("a", "b", "c", "d")
    var truth = (1 to 30).map(i =>
      i -> (cats(rnd.nextInt(cats.size)), math.round(rnd.nextDouble() * 1e4) / 100.0)).toMap
    var base = idx.materialize(src(truth.toSeq.map { case (i, (c, a)) => (i, c, a) }: _*), store)
    var agg = AggView.build(base, "state")

    for (step <- 1 to 4) {
      val upsertIds = rnd.shuffle(truth.keys.toVector).take(6)
      val newIds = Seq(100 + step * 10, 101 + step * 10)
      val ups = (upsertIds ++ newIds).map(i =>
        (i, cats(rnd.nextInt(cats.size)), math.round(rnd.nextDouble() * 1e4) / 100.0))
      val delIds = rnd.shuffle((truth.keys.toSet -- upsertIds).toVector).take(4)
      truth = truth -- delIds ++ ups.map(u => u._1 -> (u._2, u._3))
      val r = agg.refresh(base, src(ups: _*),
        Some(delIds.map(_.toString).toDF("src_key")))
      base = r._1; agg = r._2
      val expect = truth.values.groupBy(_._1).map { case (c, vs) =>
        val amts = vs.map(_._2).toSeq
        c -> ((amts.size.toLong,
          amts.map(a => BigDecimal(a).setScale(4)).sum.setScale(4),
          amts.min, amts.max))
      }
      assert(snap(agg) === expect, s"divergence at step $step")
    }
  }
}
