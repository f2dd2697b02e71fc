package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{MapIndex, ViewStore, WindowedTopFreqView}
import graft.engine.MapIndex.emit

/** Windowed Misra-Gries frequent items (functions/MgSketch.scala): the
  * n/(k+1) survival guarantee must COMPOSE across the slice merge, the
  * fold count must stay exact, and deletions must rebuild dirty pairs. */
class WindowedTopFreqViewSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val DAY = 86400L

  private val idx = MapIndex.columns("wintf_test")(
    col("id").cast("string"),
    array(emit(col("grp"), struct(col("ts").as("ts"), col("v").as("v")))))

  private def ts(day: Int, hour: Int = 12): Timestamp =
    new Timestamp((day * DAY + hour * 3600L) * 1000L)

  private def src(rows: (Int, String, Timestamp, Double)*): DataFrame =
    rows.toDF("id", "grp", "ts", "v")

  private def root(): String =
    Files.createTempDirectory("graft-wintf-").resolve("w").toString

  private def decode(df: DataFrame): (Long, Set[Double]) = {
    val rows = df.collect()
    (rows.head.getAs[Long]("n"), rows.map(_.getAs[Double]("item")).toSet)
  }

  test("frequent items survive the slice merge; fold count exact; extras verifiable") {
    val store = ViewStore.temp(spark)
    // 300 rows over 3 days: item 1.0 takes 40% (spread over all days),
    // item 2.0 takes 25%, the rest is a long tail of singletons — with
    // k=4 both heavy items are > n/(k+1) = 20% and MUST survive
    val rows =
      (1 to 120).map(i => (i, "a", ts(i % 3), 1.0)) ++
      (121 to 195).map(i => (i, "a", ts(i % 3), 2.0)) ++
      (196 to 300).map(i => (i, "a", ts(i % 3), 100.0 + i))
    val base = idx.materialize(src(rows: _*), store)
    val w = WindowedTopFreqView.build(base, root(), DAY, k = 4)
    val (n, items) = decode(w.candidates(0L, 3 * DAY))
    assert(n === 300L)
    assert(items.contains(1.0) && items.contains(2.0),
      s"heavy items must survive the merged candidates, got $items")
    assert(items.size <= 4, s"at most k candidates after the merge: $items")
    // single-slice serve: the per-day states carry the same guarantee
    val (n0, items0) = decode(w.candidates(0L, DAY))
    assert(n0 === 100L && items0.contains(1.0) && items0.contains(2.0))
  }

  test("deletes rebuild dirty pairs: a purged heavy item leaves the candidates") {
    val store = ViewStore.temp(spark)
    val rows =
      (1 to 60).map(i => (i, "a", ts(0), 7.0)) ++
      (61 to 100).map(i => (i, "a", ts(0), 200.0 + i)) ++
      (101 to 140).map(i => (i, "a", ts(1), 9.0))
    val base = idx.materialize(src(rows: _*), store)
    val w = WindowedTopFreqView.build(base, root(), DAY, k = 4)
    assert(decode(w.candidates(0L, 2 * DAY))._2.contains(7.0))
    // purge every 7.0 row: the day-0 pair rebuilds without them
    w.refresh(base, src(), Some((1 to 60).map(_.toString).toDF("src_key")))
    val (n, items) = decode(w.candidates(0L, 2 * DAY))
    assert(n === 80L)
    assert(!items.contains(7.0), s"purged item must not survive a rebuild: $items")
    assert(items.contains(9.0))
  }
}
