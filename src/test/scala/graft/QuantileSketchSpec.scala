package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{BucketedViewStore, MapIndex, SketchQuantileView}
import graft.engine.MapIndex.emit
import graft.functions.QuantileSketch

/** Mergeable quantile sketch ([[graft.functions.QuantileSketch]]) and
  * its maintained state ([[graft.engine.SketchQuantileView]]): the
  * deterministic rank-error bound must hold under single-stream
  * updates, arbitrary merges, distributed aggregation, and the
  * insert-merge / rebuild-on-delete maintenance split. */
class QuantileSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** |true rank of sketch estimate − target rank| as a fraction of n. */
  private def rankErr(vals: Seq[Double], est: Double, p: Double): Double = {
    val sorted = vals.sorted
    val target = math.max(1, math.ceil(p * vals.size))
    val rank = sorted.count(_ <= est)
    math.abs(rank - target) / vals.size.toDouble
  }

  test("single-stream sketch: exact under k, bounded rank error over it") {
    val small = (1 to 100).map(_.toDouble)
    val s1 = new QuantileSketch.Sketch(128)
    small.foreach(s1.update)
    // n < k: everything sits in level 0 — exact type-1 quantiles
    assert(s1.quantile(0.5) === 50.0)
    assert(s1.quantile(0.95) === 95.0)
    assert(s1.n === 100L)

    val rnd = new scala.util.Random(7)
    // heavy-tailed values spanning six orders of magnitude — the
    // unknown-domain case the grid state cannot serve
    val big = (1 to 60000).map(_ => math.exp(rnd.nextGaussian() * 3.0))
    val s2 = new QuantileSketch.Sketch(1024)
    big.foreach(s2.update)
    assert(s2.n === big.size.toLong)
    for (p <- Seq(0.05, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val e = rankErr(big, s2.quantile(p), p)
      assert(e <= 0.05, s"p=$p rank error $e exceeds the 5% bound")
    }
  }

  test("merge: error bound composes by total weight, not merge order") {
    val rnd = new scala.util.Random(11)
    val all = (1 to 50000).map(_ => rnd.nextDouble() * 1e9)
    val parts = all.grouped(1700).toSeq
    def sk(vs: Seq[Double]) = {
      val s = new QuantileSketch.Sketch(1024); vs.foreach(s.update); s
    }
    // left-fold and a skewed pairing order must both stay in bound
    val folded = parts.map(sk).reduceLeft { (a, b) => a.merge(b); a }
    assert(folded.n === all.size.toLong)
    for (p <- Seq(0.1, 0.5, 0.9))
      assert(rankErr(all, folded.quantile(p), p) <= 0.05, s"fold p=$p")
    // serialization round-trip preserves the sketch exactly
    val rt = QuantileSketch.deserialize(folded.serialize())
    assert(rt.n === folded.n)
    for (p <- Seq(0.1, 0.5, 0.9))
      assert(rt.quantile(p) === folded.quantile(p))
  }

  test("distributed aggregation and qsketch_merge agree with the bound") {
    QuantileSketch.register(spark)
    val rnd = new scala.util.Random(23)
    val rows = (1 to 40000).map(i => (s"g${i % 3}", rnd.nextDouble() * 1e6))
    val df = rows.toDF("g", "v").repartition(32)
    val agg = df.groupBy("g").agg(expr("qsketch(v, 1024)").as("sk"))
    val served = agg.select(col("g"),
        expr("qsketch_n(sk)").as("n"),
        expr("qsketch_quantile(sk, 0.5)").as("q50")).collect()
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    served.foreach { r =>
      val vals = byG(r.getString(0))
      assert(r.getLong(1) === vals.size.toLong, "qsketch_n must be exact")
      assert(rankErr(vals, r.getDouble(2), 0.5) <= 0.05)
    }
    // second-level merge of stored sketches (the maintained-state fold)
    val merged = agg.select(lit("all").as("g"), col("sk"))
      .groupBy("g").agg(expr("qsketch_merge(sk)").as("sk"))
      .select(expr("qsketch_n(sk)").as("n"),
        expr("qsketch_quantile(sk, 0.9)").as("q90")).head()
    assert(merged.getLong(0) === rows.size.toLong)
    assert(rankErr(rows.map(_._2), merged.getDouble(1), 0.9) <= 0.05)
  }

  test("maintained view: insert batches fold, delete batches rebuild only dirty groups") {
    val store = BucketedViewStore.temp(spark, 8)
    val idx = MapIndex.columns("qsv_base")(col("id").cast("string"),
      array(emit(col("g"), col("v"))))
    val v = new SketchQuantileView(store, idx, "qsv_base__state", k = 256)
    val rnd = new scala.util.Random(31)
    var live = (0 until 6000).map(i => (i.toLong, s"g${i % 3}", rnd.nextDouble() * 100))
    v.build(live.toDF("id", "g", "v"))

    def check(): Unit = {
      val byG = live.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
      val served = v.quantiles(Seq("q50" -> 0.5, "q95" -> 0.95)).collect()
      assert(served.map(_.getString(0)).toSet === byG.keySet)
      served.foreach { r =>
        val vals = byG(r.getString(0))
        assert(r.getLong(1) === vals.size.toLong,
          s"group ${r.getString(0)}: n must stay exact under maintenance")
        assert(rankErr(vals, r.getDouble(2), 0.5) <= 0.06)
        assert(rankErr(vals, r.getDouble(3), 0.95) <= 0.06)
      }
    }
    check()

    // INSERT-ONLY batch (new ids): the merge path — g2 untouched rows
    // never re-read (bucket-pruned), state still in bound
    val ins = (6000 until 8000).map(i => (i.toLong, s"g${i % 2}", rnd.nextDouble() * 100))
    v.refresh(ins.toDF("id", "g", "v"), None)
    live = live ++ ins
    check()

    // DELETE batch: tombstone a slice of g0 — the rebuild path; g0's
    // sketch must reflect exactly the survivors (n is exact)
    val delIds = live.filter(r => r._2 == "g0" && r._1 % 5 == 0).map(_._1)
    v.refresh(Seq.empty[(Long, String, Double)].toDF("id", "g", "v"),
      Some(delIds.toDF("id").select(col("id").cast("string"))))
    live = live.filterNot(r => delIds.contains(r._1))
    check()

    // UPSERT batch (replaces existing ids — a retraction + insert):
    // also the rebuild path
    val ups = live.filter(_._1 % 7 == 0).map(r => (r._1, r._2, r._3 + 1000))
    v.refresh(ups.toDF("id", "g", "v"), None)
    live = live.map(r => if (r._1 % 7 == 0) (r._1, r._2, r._3 + 1000) else r)
    check()
  }
}
