package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{MapIndex, ViewStore, WindowedSketchView}
import graft.engine.MapIndex.emit

/** Windowed mergeable quantile sketches (engine/WindowedSketchView.scala):
  * window serves must decode the EXACT fold count and rank-bounded
  * estimates after any mix of insert-only folds and dirty-pair rebuilds;
  * eviction and watermark refusals ride the shared SliceStore plumbing. */
class WindowedSketchViewSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val DAY = 86400L

  private val idx = MapIndex.columns("winsk_test")(
    col("id").cast("string"),
    array(emit(col("grp"), struct(col("ts").as("ts"), col("v").as("v")))))

  private def ts(day: Int, hour: Int = 12): Timestamp =
    new Timestamp((day * DAY + hour * 3600L) * 1000L)

  private def src(rows: (Int, String, Timestamp, Double)*): DataFrame =
    rows.toDF("id", "grp", "ts", "v")

  private def root(): String =
    Files.createTempDirectory("graft-winsk-").resolve("w").toString

  /** (n, est50) per group over the window. */
  private def decode(df: DataFrame): Map[String, (Long, Double)] =
    df.collect().map(r => r.getAs[String]("emit_key") ->
      ((r.getAs[Long]("n"), r.getAs[Double]("est50")))).toMap

  test("window merge decodes exact counts and rank-bounded medians") {
    val store = ViewStore.temp(spark)
    // group a: 1..100 spread over days 0-3; group b: constant 5.0 on day 1
    val rows = (1 to 100).map(i => (i, "a", ts(i % 4), i.toDouble)) ++
      (101 to 110).map(i => (i, "b", ts(1), 5.0))
    val base = idx.materialize(src(rows: _*), store)
    val w = WindowedSketchView.build(base, root(), DAY, k = 64)
    val all = decode(w.quantiles(0L, 4 * DAY, Seq("est50" -> 0.5)))
    assert(all("a")._1 === 100L)
    assert(all("b") === ((10L, 5.0))) // constant group: estimate is exact
    // true rank of the a-median within 5% of target (the sketch bound at
    // this k over 100 values is far tighter; 5% mirrors the gates)
    val est = all("a")._2
    val rank = (1 to 100).count(_ <= est)
    assert(math.abs(rank - 50) <= 5, s"median $est rank $rank")
    // a sub-window only sees its slices: day 0 holds i%4==0 values
    val d0 = decode(w.quantiles(0L, DAY, Seq("est50" -> 0.5)))
    assert(d0("a")._1 === 25L)
    assert(!d0.contains("b"))
  }

  test("insert-only refresh folds without touching other pairs; deletes rebuild dirty pairs") {
    val store = ViewStore.temp(spark)
    val rows = (1 to 50).map(i => (i, "a", ts(0), i.toDouble))
    val base = idx.materialize(src(rows: _*), store)
    val r = root()
    val w = WindowedSketchView.build(base, r, DAY, k = 64)
    // day-1 inserts are a brand-new slice: pure merge path, day-0
    // version pointer must NOT move (no rewrite of untouched slices)
    val v0 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(r, "s0", "_LATEST")).trim
    w.refresh(base, src((51 to 60).map(i => (i, "a", ts(1), 1000.0 + i)): _*), None)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(r, "s0", "_LATEST")).trim === v0)
    assert(decode(w.quantiles(0L, 2 * DAY, Seq("est50" -> 0.5)))("a")._1 === 60L)
    assert(decode(w.quantiles(DAY, 2 * DAY, Seq("est50" -> 0.5)))("a")._1 === 10L)
    // delete half of day 0: dirty rebuild must drop the count to 25
    w.refresh(base, src(), Some((1 to 25).map(_.toString).toDF("src_key")))
    val after = decode(w.quantiles(0L, DAY, Seq("est50" -> 0.5)))
    assert(after("a")._1 === 25L)
    // rebuilt sketch summarizes ONLY the survivors 26..50
    assert(after("a")._2 >= 26.0 && after("a")._2 <= 50.0)
  }

  test("coarsened sketch slices merge into whole-history quantiles; frozen range refuses") {
    val store = ViewStore.temp(spark)
    val rows = (1 to 100).map(i => (i, "a", ts(i % 10), i.toDouble))
    val base = idx.materialize(src(rows: _*), store)
    val w = WindowedSketchView.build(base, root(), DAY, k = 64)
    assert(w.coarsen(7 * DAY, 7 * DAY) === Seq(0L))
    // whole-history serve spans the coarse slice + three fine days
    val all = decode(w.quantiles(0L, 10 * DAY, Seq("est50" -> 0.5)))
    assert(all("a")._1 === 100L)
    val rank = (1 to 100).count(_ <= all("a")._2)
    assert(math.abs(rank - 50) <= 5, s"median ${all("a")._2} rank $rank")
    // the coarse slice alone folds exactly the days-0..6 values
    assert(decode(w.quantiles(0L, 7 * DAY, Seq("est50" -> 0.5)))("a")._1 === 70L)
    val fz = intercept[IllegalArgumentException](
      w.refresh(base, src((999, "a", ts(2), 1.0)), None))
    assert(fz.getMessage.contains("frozen"))
  }

  test("eviction drops slices; sub-watermark windows and late batches refuse") {
    val store = ViewStore.temp(spark)
    val rows = (0 to 2).flatMap(d => (1 to 10).map(i => (d * 100 + i, "a", ts(d), i.toDouble)))
    val base = idx.materialize(src(rows: _*), store)
    val w = WindowedSketchView.build(base, root(), DAY, k = 64)
    assert(w.evictBefore(DAY) === Seq(0L))
    assert(decode(w.trailingQuantiles(2, Seq("est50" -> 0.5)))("a")._1 === 20L)
    val sub = intercept[IllegalArgumentException](
      w.quantiles(0L, DAY, Seq("est50" -> 0.5)))
    assert(sub.getMessage.contains("watermark"))
    val late = intercept[IllegalArgumentException](
      w.refresh(base, src((999, "a", ts(0), 1.0)), None))
    assert(late.getMessage.contains("evicted slices"))
  }
}
