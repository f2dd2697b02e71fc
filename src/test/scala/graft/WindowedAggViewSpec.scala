package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{MapIndex, ViewStore, WindowedAggView}
import graft.engine.MapIndex.emit

/** Time-sliced windowed aggregates with watermark eviction
  * (engine/WindowedAggView.scala): slice-local maintenance must equal a
  * from-scratch recompute, eviction must drop expired slices WITHOUT
  * rewriting survivors, and late changes below the watermark must refuse. */
class WindowedAggViewSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val DAY = 86400L

  // index: id -> (group, struct(ts, v)) — the windowed emission contract
  private val idx = MapIndex.columns("winagg_test")(
    col("id").cast("string"),
    array(emit(col("grp"), struct(col("ts").as("ts"), col("v").as("v")))))

  private def ts(day: Int, hour: Int = 12): Timestamp =
    new Timestamp((day * DAY + hour * 3600L) * 1000L)

  private def src(rows: (Int, String, Timestamp, Double)*): DataFrame =
    rows.toDF("id", "grp", "ts", "v")

  private def snap(v: WindowedAggView): Set[(Long, String, Long, BigDecimal, Double, Double)] =
    v.state.collect().map { r =>
      (r.getAs[Long]("slice_start"), r.getAs[String]("emit_key"),
        r.getAs[Long]("cnt"), BigDecimal(r.getAs[java.math.BigDecimal]("sum_value")),
        r.getAs[Double]("min_value"), r.getAs[Double]("max_value"))
    }.toSet

  private def tempRoot(): String =
    Files.createTempDirectory("graft-winagg-").resolve("w").toString

  test("build slices by day; refresh migrates a moved event across the boundary") {
    val store = ViewStore.temp(spark)
    val base = idx.materialize(
      src((1, "a", ts(0), 10.0), (2, "a", ts(0, 23), 20.0),
          (3, "a", ts(1), 5.0), (4, "b", ts(1), 7.0)), store)
    val w = WindowedAggView.build(base, tempRoot(), DAY)
    assert(w.liveSlices === Seq(0L, DAY))
    assert(snap(w) === Set(
      (0L, "a", 2L, BigDecimal("30.0000"), 10.0, 20.0),
      (DAY, "a", 1L, BigDecimal("5.0000"), 5.0, 5.0),
      (DAY, "b", 1L, BigDecimal("7.0000"), 7.0, 7.0)))
    // id=2 moves 23:00 day0 -> +2h = 01:00 day1 (slice migration) and
    // doubles its value; id=4 is tombstoned (its group vanishes from day1)
    val up = src((2, "a", new Timestamp((DAY + 3600L) * 1000L), 40.0))
    w.refresh(base, up, Some(Seq("4").toDF("src_key")))
    assert(snap(w) === Set(
      (0L, "a", 1L, BigDecimal("10.0000"), 10.0, 10.0),
      (DAY, "a", 2L, BigDecimal("45.0000"), 5.0, 40.0)))
  }

  test("aligned window merges slices; misaligned and sub-watermark windows refuse") {
    val store = ViewStore.temp(spark)
    val base = idx.materialize(
      src((1, "a", ts(0), 1.0), (2, "a", ts(1), 2.0), (3, "a", ts(2), 4.0),
          (4, "b", ts(2), 9.0)), store)
    val w = WindowedAggView.build(base, tempRoot(), DAY)
    val win = w.window(DAY, 3 * DAY).collect()
      .map(r => r.getAs[String]("emit_key") ->
        ((r.getAs[Long]("cnt"), r.getAs[Double]("min_value"), r.getAs[Double]("max_value"))))
      .toMap
    assert(win === Map("a" -> ((2L, 2.0, 4.0)), "b" -> ((1L, 9.0, 9.0))))
    // trailing(2) = last two slices
    val tr = w.trailing(2).collect().map(r =>
      r.getAs[String]("emit_key") -> r.getAs[Long]("cnt")).toMap
    assert(tr === Map("a" -> 2L, "b" -> 1L))
    val mis = intercept[IllegalArgumentException](w.window(DAY + 1, 3 * DAY))
    assert(mis.getMessage.contains("not aligned"))
    // an aligned window with no covered slices is empty, not an error
    assert(w.window(10 * DAY, 11 * DAY).count() === 0L)
    w.evictBefore(DAY)
    val sub = intercept[IllegalArgumentException](w.window(0L, 2 * DAY))
    assert(sub.getMessage.contains("watermark"))
  }

  test("eviction drops expired slices only, never rewrites survivors; late refresh refuses") {
    val store = ViewStore.temp(spark)
    val base = idx.materialize(
      src((1, "a", ts(0), 1.0), (2, "a", ts(1), 2.0), (3, "b", ts(2), 3.0)), store)
    val root = tempRoot()
    val w = WindowedAggView.build(base, root, DAY)
    val survivorVersions = Seq(DAY, 2 * DAY).map(s0 =>
      s0 -> Files.readString(Paths.get(root, s"s$s0", "_LATEST")).trim)
    assert(w.evictBefore(DAY) === Seq(0L))
    assert(w.watermark === DAY)
    assert(w.liveSlices === Seq(DAY, 2 * DAY))
    assert(!Files.exists(Paths.get(root, "s0")))
    // surviving slice state was NOT rewritten: same version pointers
    survivorVersions.foreach { case (s0, v) =>
      assert(Files.readString(Paths.get(root, s"s$s0", "_LATEST")).trim === v) }
    // monotone watermark
    val back = intercept[IllegalArgumentException](w.evictBefore(0L))
    assert(back.getMessage.contains("monotonically"))
    // a change touching the evicted slice refuses loudly
    val late = src((9, "a", ts(0), 99.0))
    val err = intercept[IllegalArgumentException](w.refresh(base, late, None))
    assert(err.getMessage.contains("evicted slices"))
    // the refusal happened AFTER the base refresh but BEFORE any state
    // write: surviving slices still intact
    survivorVersions.foreach { case (s0, v) =>
      assert(Files.readString(Paths.get(root, s"s$s0", "_LATEST")).trim === v) }
  }

  test("a batch that empties a slice drops its directory; attach checks alignment") {
    val store = ViewStore.temp(spark)
    val base = idx.materialize(
      src((1, "a", ts(0), 1.0), (2, "b", ts(1), 2.0)), store)
    val root = tempRoot()
    val w = WindowedAggView.build(base, root, DAY)
    assert(w.liveSlices === Seq(0L, DAY))
    // attach with the built width works; a different width refuses (slice
    // DAY is not aligned to a 7-day width — slice 0 alone could never tell)
    assert(WindowedAggView.attach(spark, root, DAY).liveSlices === Seq(0L, DAY))
    val bad = intercept[IllegalArgumentException](
      WindowedAggView.attach(spark, root, 7 * DAY))
    assert(bad.getMessage.contains("different width"))
    w.refresh(base, src(), Some(Seq("2").toDF("src_key")))
    assert(w.liveSlices === Seq(0L))
    assert(!Files.exists(Paths.get(root, s"s$DAY")))
  }

  test("coarsen merges aged slices exactly; frozen range refuses; windows respect coarse width") {
    val store = ViewStore.temp(spark)
    val rows = (0 to 9).flatMap(d =>
      Seq((d * 10 + 1, "a", ts(d), d * 1.0 + 1), (d * 10 + 2, "b", ts(d), 100.0 - d)))
    val base = idx.materialize(src(rows: _*), store)
    val w = WindowedAggView.build(base, tempRoot(), DAY)
    assert(w.coarsen(7 * DAY, 7 * DAY) === Seq(0L))
    // layout: one 7-day coarse slice + three fine days, widths marked
    val st = w.state.collect()
    assert(st.map(r => r.getAs[Long]("slice_start") -> r.getAs[Long]("slice_w"))
      .toMap === Map(0L -> 7 * DAY, 7 * DAY -> DAY, 8 * DAY -> DAY, 9 * DAY -> DAY))
    // merged partials exact: group a over days 0..6 = values 1..7
    val a0 = st.filter(r => r.getAs[Long]("slice_start") == 0L &&
      r.getAs[String]("emit_key") == "a").head
    assert(a0.getAs[Long]("cnt") === 7L)
    assert(BigDecimal(a0.getAs[java.math.BigDecimal]("sum_value")) === BigDecimal(28))
    assert(a0.getAs[Double]("min_value") === 1.0 && a0.getAs[Double]("max_value") === 7.0)
    // a window covering the coarse slice serves; one splitting it refuses
    assert(w.window(0L, 8 * DAY).collect()
      .map(r => r.getAs[String]("emit_key") -> r.getAs[Long]("cnt"))
      .toMap === Map("a" -> 8L, "b" -> 8L))
    val sp = intercept[IllegalArgumentException](w.window(2 * DAY, 8 * DAY))
    assert(sp.getMessage.contains("splits"))
    // refreshes below the frozen horizon refuse; above it they still work
    val fz = intercept[IllegalArgumentException](
      w.refresh(base, src((999, "a", ts(3), 9.0)), None))
    assert(fz.getMessage.contains("frozen"))
    w.refresh(base, src((998, "a", ts(8), 50.0)), None)
    assert(w.window(8 * DAY, 9 * DAY).collect()
      .find(_.getAs[String]("emit_key") == "a").get.getAs[Long]("cnt") === 2L)
    // evicting inside the coarse slice refuses; at its end it drops whole
    val ev = intercept[IllegalArgumentException](w.evictBefore(3 * DAY))
    assert(ev.getMessage.contains("splits"))
    assert(w.evictBefore(7 * DAY) === Seq(0L))
    assert(w.liveSlices === Seq(7 * DAY, 8 * DAY, 9 * DAY))
  }

  test("date-keyed emissions slice on UTC midnights") {
    val store = ViewStore.temp(spark)
    val didx = MapIndex.columns("winagg_date_test")(
      col("id").cast("string"),
      array(emit(col("grp"),
        struct(col("ts").cast("date").as("ts"), col("v").as("v")))))
    val base = didx.materialize(
      src((1, "a", ts(0, 1), 1.0), (2, "a", ts(0, 23), 2.0), (3, "a", ts(1, 5), 4.0)),
      store)
    val w = WindowedAggView.build(base, tempRoot(), DAY)
    assert(w.liveSlices === Seq(0L, DAY))
    val d0 = w.sliceState(0L).collect().head
    assert(d0.getAs[Long]("cnt") === 2L) // both day-0 hours land on the date
    w.refresh(base, src((3, "a", ts(0), 8.0)), None) // date moves day 1 -> 0
    assert(w.liveSlices === Seq(0L))
    assert(w.sliceState(0L).collect().head.getAs[Long]("cnt") === 3L)
  }

  test("a member directory surviving a crashed coarsen is shadowed, then healed") {
    val store = ViewStore.temp(spark)
    val rows = (0 to 8).map(d => (d + 1, "a", ts(d), d * 1.0 + 1))
    val base = idx.materialize(src(rows: _*), store)
    val root = tempRoot()
    val w = WindowedAggView.build(base, root, DAY)
    // stash a member aside, coarsen, then restore it — the exact on-disk
    // state a crash between the coarse publish and the member drops leaves
    val stash = Files.createTempDirectory("graft-stash-")
    copyTree(Paths.get(root, s"s$DAY"), stash.resolve(s"s$DAY"))
    assert(w.coarsen(7 * DAY, 7 * DAY) === Seq(0L))
    copyTree(stash.resolve(s"s$DAY"), Paths.get(root, s"s$DAY"))
    // raw listing sees the leftover; the serving view shadows it
    assert(w.liveSlices.contains(DAY))
    assert(w.effectiveSlices.map(_._1) === Seq(0L, 7 * DAY, 8 * DAY))
    // serves are unaffected: day 1's value 2.0 counted ONCE (in the coarse
    // slice), not twice
    val a0 = w.window(0L, 7 * DAY).collect()
      .find(_.getAs[String]("emit_key") == "a").get
    assert(a0.getAs[Long]("cnt") === 7L)
    // healing drops the leftover
    assert(w.dropShadowed() === Seq(DAY))
    assert(!Files.exists(Paths.get(root, s"s$DAY")))
  }

  private def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    val stream = Files.walk(from)
    try stream.forEach { p =>
      val t = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t); () }
    } finally stream.close()
  }

  test("incremental state equals a from-scratch recompute after mixed batches") {
    val store = ViewStore.temp(spark)
    val rows0 = (1 to 40).map(i =>
      (i, if (i % 3 == 0) "x" else "y", ts(i % 5, i % 24), i * 1.5))
    val base = idx.materialize(src(rows0: _*), store)
    val w = WindowedAggView.build(base, tempRoot(), DAY)
    val ups = src((3, "x", ts(6), 100.0), (7, "y", ts(0, 1), -2.0), (41, "z", ts(2), 8.0))
    w.refresh(base, ups, Some(Seq("5", "10").toDF("src_key")))
    val expect = WindowedAggView.build(
      idx.materialize(src((rows0.filterNot(r => Set(5, 10, 3, 7).contains(r._1)) ++
        Seq((3, "x", ts(6), 100.0), (7, "y", ts(0, 1), -2.0), (41, "z", ts(2), 8.0))): _*),
        ViewStore.temp(spark)), tempRoot(), DAY)
    assert(snap(w) === snap(expect))
  }
}
