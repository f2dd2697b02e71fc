package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.WindowedFeedRollup

/** Feed-driven windowed rollup (engine/WindowedFeedRollup.scala): folds a
  * CDC feed with full-value delete rows — retraction without any base
  * read — under the NULL-sum rule and the consumed-epoch guard. */
class WindowedFeedRollupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val DAY = 86400L

  private def ts(day: Int): Timestamp = new Timestamp((day * DAY + 43200L) * 1000L)

  private def snap(rows: (String, Timestamp, java.lang.Double)*): DataFrame =
    rows.toDF("g", "ts", "v")

  private def feed(rows: (String, String, Timestamp, java.lang.Double)*): DataFrame =
    rows.toDF("change_type", "g", "ts", "v")

  private def root(): String =
    Files.createTempDirectory("graft-winfeed-").resolve("w").toString

  private def decode(df: DataFrame): Map[(Long, String), (Long, Long, Option[BigDecimal])] =
    df.collect().map { r =>
      (r.getAs[Long]("slice_start"), r.getAs[String]("emit_key")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("vcnt"),
          Option(r.getAs[java.math.BigDecimal]("sum_value")).map(BigDecimal(_))))
    }.toMap

  test("feed deletes retract without a base read; NULL-sum rule; epoch guard") {
    val w = WindowedFeedRollup.build(
      snap(("a", ts(0), 10.0), ("a", ts(0), 20.0), ("b", ts(0), null)),
      col("ts"), col("g"), col("v"), spark, root(), DAY, upstreamEpoch = 0)
    val st0 = decode(w.state)
    assert(st0((0L, "a")) === ((2L, 2L, Some(BigDecimal(30)))))
    // all-NULL group: sum serves as SQL NULL, not 0
    assert(st0((0L, "b")) === ((1L, 0L, None)))
    // fold a feed: retract one a-row (full old values in the delete),
    // heal b with a real value, open a new slice
    w.applyChanges(feed(
        ("delete", "a", ts(0), 20.0),
        ("insert", "b", ts(0), 5.0),
        ("insert", "a", ts(1), 7.0)), 1,
      col("ts"), col("g"), col("v"))
    val st1 = decode(w.state)
    assert(st1((0L, "a")) === ((1L, 1L, Some(BigDecimal(10)))))
    assert(st1((0L, "b")) === ((2L, 1L, Some(BigDecimal(5))))) // healed to a number
    assert(st1((DAY, "a")) === ((1L, 1L, Some(BigDecimal(7)))))
    // window merge keeps the NULL-sum rule per merged group
    val win = w.window(0L, 2 * DAY).collect()
      .map(r => r.getAs[String]("emit_key") -> r.getAs[Long]("cnt")).toMap
    assert(win === Map("a" -> 2L, "b" -> 2L))
    // re-applying the same epoch refuses (double-count guard)
    val err = intercept[IllegalArgumentException](
      w.applyChanges(feed(("insert", "a", ts(1), 1.0)), 1,
        col("ts"), col("g"), col("v")))
    assert(err.getMessage.contains("already folded"))
    // a group retracted to zero rows vanishes
    w.applyChanges(feed(("delete", "a", ts(1), 7.0)), 2,
      col("ts"), col("g"), col("v"))
    assert(!decode(w.state).contains((DAY, "a")))
  }
}
