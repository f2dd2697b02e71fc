package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{MapIndex, ViewStore, WindowedDistinctView}
import graft.engine.MapIndex.emit

/** Windowed KMV distinct counts (engine/WindowedSketchView.scala,
  * functions/KmvSketch.scala): distinct is non-additive across slices, so
  * the window serve must DEDUPLICATE users appearing in many days via the
  * hash-set merge — exact below k, bounded past it, deletion-safe through
  * the dirty-pair rebuild. */
class WindowedDistinctViewSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val DAY = 86400L

  private val idx = MapIndex.columns("windist_test")(
    col("id").cast("string"),
    array(emit(col("grp"), struct(col("ts").as("ts"), col("u").as("v")))))

  private def ts(day: Int, hour: Int = 12): Timestamp =
    new Timestamp((day * DAY + hour * 3600L) * 1000L)

  private def src(rows: (Int, String, Timestamp, Double)*): DataFrame =
    rows.toDF("id", "grp", "ts", "u")

  private def root(): String =
    Files.createTempDirectory("graft-windist-").resolve("w").toString

  private def decode(df: DataFrame): Map[String, (Long, Boolean)] =
    df.collect().map(r => r.getAs[String]("emit_key") ->
      ((r.getAs[Long]("distinct_est"), r.getAs[Boolean]("estimated")))).toMap

  test("window merge deduplicates users across slices; exact below k") {
    val store = ViewStore.temp(spark)
    // user u appears on days 0,1,2; three more users on day 1 only
    val rows = Seq(
      (1, "a", ts(0), 7.0), (2, "a", ts(1), 7.0), (3, "a", ts(2), 7.0),
      (4, "a", ts(1), 8.0), (5, "a", ts(1), 9.0), (6, "a", ts(1), 10.0),
      (7, "b", ts(0), 7.0))
    val base = idx.materialize(src(rows: _*), store)
    val w = WindowedDistinctView.build(base, root(), DAY, k = 1024)
    // per-day states would sum to 6 for group a; the window merge must say 4
    assert(decode(w.distinct(0L, 3 * DAY)) ===
      Map("a" -> ((4L, false)), "b" -> ((1L, false))))
    assert(decode(w.distinct(DAY, 2 * DAY)) === Map("a" -> ((4L, false))))
    assert(decode(w.trailingDistinct(3)) ===
      Map("a" -> ((4L, false)), "b" -> ((1L, false))))
  }

  test("estimator regime past k stays within the KMV error bound") {
    val store = ViewStore.temp(spark)
    // 400 distinct users spread over 4 days, k = 32 (sigma ~ 18%)
    val rows = (1 to 400).map(i => (i, "a", ts(i % 4), i.toDouble))
    val base = idx.materialize(src(rows: _*), store)
    val w = WindowedDistinctView.build(base, root(), DAY, k = 32)
    val (est, full) = decode(w.distinct(0L, 4 * DAY))("a")
    assert(full, "400 distinct hashes must overflow a k=32 state")
    assert(math.abs(est - 400L) <= 200L, s"estimate $est vs exact 400")
    // per-slice duplicates are free: re-folding the same users adds nothing
    w.refresh(base, src((1, "a", ts(1), 1.0)), None) // user 1 moves day 0 -> 1
    val (est2, _) = decode(w.distinct(0L, 4 * DAY))("a")
    assert(math.abs(est2 - 400L) <= 200L, s"estimate $est2 vs exact 400")
  }

  test("deletes rebuild dirty pairs: a vanished user leaves the window count") {
    val store = ViewStore.temp(spark)
    val rows = Seq(
      (1, "a", ts(0), 1.0), (2, "a", ts(0), 2.0), (3, "a", ts(1), 3.0),
      (4, "a", ts(1), 1.0)) // user 1 also on day 1
    val base = idx.materialize(src(rows: _*), store)
    val w = WindowedDistinctView.build(base, root(), DAY, k = 64)
    assert(decode(w.distinct(0L, 2 * DAY))("a")._1 === 3L)
    // drop user 1's day-0 row: day 0 loses them, the window keeps them
    // (they still appear on day 1) — per-slice rebuild, window dedup
    w.refresh(base, src(), Some(Seq("1").toDF("src_key")))
    assert(decode(w.distinct(0L, DAY))("a")._1 === 1L)
    assert(decode(w.distinct(0L, 2 * DAY))("a")._1 === 3L)
    // drop their day-1 row too: now the window forgets them
    w.refresh(base, src(), Some(Seq("4").toDF("src_key")))
    assert(decode(w.distinct(0L, 2 * DAY))("a")._1 === 2L)
  }
}
