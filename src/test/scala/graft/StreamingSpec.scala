package graft

import java.sql.Timestamp
import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{MapIndex, ViewStore}
import graft.engine.MapIndex.emit
import graft.streaming.{StreamingEvents, StreamingMapIndex}

/** Structured-Streaming maintenance: the push-based write path (O3/O17)
  * plus event-time windowed aggregation with watermarks. */
class StreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: SQLContext = spark.sqlContext

  private def primary(name: String) =
    MapIndex.columns(name)(col("key"), array(emit(lit("test"), col("test"))))

  test("foreachBatch upsert maintains the view across micro-batches (O3/O4)") {
    val store = ViewStore.temp(spark)
    val idx = primary("stream_primary")
    val sm = new StreamingMapIndex(idx, store)
    val input = MemoryStream[(String, Int)]
    val q = sm.writer(input.toDF().toDF("key", "test")).start()
    input.addData("asdf" -> 123, "other" -> 7)
    q.processAllAvailable()
    assert(store.load(idx).get("test").as[Int].collect().sorted === Seq(7, 123))
    // next micro-batch overwrites 'asdf' — exactly one new value survives
    input.addData("asdf" -> 345)
    q.processAllAvailable()
    assert(store.load(idx).get("test").as[Int].collect().sorted === Seq(7, 345))
    q.stop()
  }

  test("streaming cascade propagates incremental changes (O17)") {
    val store = ViewStore.temp(spark)
    val idx = primary("stream_casc_primary")
    val secondary = MapIndex.columns("stream_casc_secondary")(col("key"),
      array(emit(lit("test2"), col("value")(0)("emit_value"))))
    val sm = new StreamingMapIndex(idx, store, cascades = Seq(secondary))
    val input = MemoryStream[(String, Int)]
    val q = sm.writer(input.toDF().toDF("key", "test")).start()
    input.addData("asdf" -> 123)
    q.processAllAvailable()
    assert(store.load(secondary).get("test2").as[Int].collect().toSeq === Seq(123))
    input.addData("asdf" -> 345) // cascaded overwrite (test-replication.js:39-51)
    q.processAllAvailable()
    assert(store.load(secondary).get("test2").as[Int].collect().toSeq === Seq(345))
    q.stop()
  }

  test("streaming cascade falls back to a rebuild when grace retains no endpoints") {
    // grace 0: the CDC replay's (v, v+1] endpoints are never both
    // readable, so the cascade must rebuild instead of failing the batch
    val store = new graft.engine.ViewStore(spark,
      java.nio.file.Files.createTempDirectory("graft-g0-").toString,
      graceVersions = 0)
    val idx = primary("stream_g0_primary")
    val secondary = MapIndex.columns("stream_g0_secondary")(col("key"),
      array(emit(lit("test2"), col("value")(0)("emit_value"))))
    val sm = new StreamingMapIndex(idx, store, cascades = Seq(secondary))
    val input = MemoryStream[(String, Int)]
    val q = sm.writer(input.toDF().toDF("key", "test")).start()
    input.addData("asdf" -> 123)
    q.processAllAvailable()
    input.addData("asdf" -> 345)
    q.processAllAvailable()
    assert(store.load(secondary).get("test2").as[Int].collect().toSeq === Seq(345))
    q.stop()
  }

  test("streaming tombstone retracts downstream (O5 through the cascade)") {
    val store = ViewStore.temp(spark)
    val idx = primary("stream_del_primary")
    val secondary = MapIndex.columns("stream_del_secondary")(col("key"),
      array(emit(lit("test2"), col("value")(0)("emit_value"))))
    val sm = new StreamingMapIndex(idx, store, cascades = Seq(secondary))
    val input = MemoryStream[(String, Int, Boolean)]
    val q = sm.writer(input.toDF().toDF("key", "test", "deleted")).start()
    input.addData(("asdf", 123, false), ("keep", 9, false))
    q.processAllAvailable()
    input.addData(("asdf", 0, true)) // {key, deleted: true}
    q.processAllAvailable()
    assert(store.load(idx).get("test").as[Int].collect().toSeq === Seq(9))
    assert(store.load(secondary).get("test2").as[Int].collect().toSeq === Seq(9))
    q.stop()
  }

  test("streaming aggregate maintenance equals a from-scratch rebuild after every batch") {
    import graft.engine.AggView
    import graft.streaming.StreamingAggMapIndex
    val store = ViewStore.temp(spark)
    val idx = MapIndex.columns("stream_agg")(col("key"),
      array(emit(col("cat"), col("amt"))))
    val sm = new StreamingAggMapIndex(idx, store, "stream_agg__state")
    val input = MemoryStream[(String, String, Double, Boolean)]
    val q = sm.writer(input.toDF().toDF("key", "cat", "amt", "deleted")).start()

    def stateNow = AggView.attach(spark, store, "stream_agg__state").state
      .select("emit_key", "cnt", "sum_value", "min_value", "max_value")
      .collect().map(_.toSeq).toSet
    def rebuilt = {
      // recompute from the CURRENT base view into a throwaway state name
      val st = AggView.build(store.load(idx), s"rebuild_${System.nanoTime()}")
      st.state.select("emit_key", "cnt", "sum_value", "min_value", "max_value")
        .collect().map(_.toSeq).toSet
    }

    input.addData(("k1", "a", 10.0, false), ("k2", "a", 20.0, false), ("k3", "b", 5.0, false))
    q.processAllAvailable()
    assert(stateNow === rebuilt)
    // overwrite k2 into another group + tombstone k3 (its group vanishes)
    input.addData(("k2", "c", 7.5, false), ("k3", "x", 0.0, true))
    q.processAllAvailable()
    assert(stateNow === rebuilt)
    assert(stateNow.map(_.head) === Set("a", "c"))
    q.stop()
  }

  test("streaming upsert over the bucketed store touches only its buckets") {
    import graft.engine.BucketedViewStore
    import graft.streaming.BucketedStreamingMapIndex
    val store = BucketedViewStore.temp(spark, numBuckets = 16)
    val idx = MapIndex.columns("stream_bucketed")(col("key"),
      array(emit(col("key"), col("test"))))
    val sm = new BucketedStreamingMapIndex(idx, store)
    val input = MemoryStream[(String, Int)]
    val q = sm.writer(input.toDF().toDF("key", "test")).start()
    input.addData((1 to 50).map(i => s"k$i" -> i): _*)
    q.processAllAvailable()
    assert(store.df(idx.name).count() === 50)
    val m0 = store.manifest(idx.name)
    input.addData("k7" -> 700) // second micro-batch: one key
    q.processAllAvailable()
    q.stop()
    assert(store.get(idx.name, "k7").as[Int].collect().toSeq === Seq(700))
    val m1 = store.manifest(idx.name)
    val bumped = m1.count { case ((kind, b), v) =>
      kind != "epoch" && m0.get((kind, b)).exists(_ < v) }
    assert(bumped <= 2, s"micro-batch of one key bumped $bumped buckets") // 1 emit + 1 meta
  }

  test("streaming pair graph: micro-batched maintenance equals the one-shot build") {
    import graft.engine.BucketedViewStore
    import graft.operators.PairGraphIndex
    val g = new PairGraphIndex(spark, BucketedViewStore.temp(spark, 4),
      "pg_stream")
    val sm = new graft.streaming.StreamingPairGraph(g)
    val input = MemoryStream[(Long, String)]
    val q = sm.writer(input.toDF().toDF("doc_id", "text")).start()
    input.addData(1L -> "a b c d e", 2L -> "a b c d f", 3L -> "x y z w v")
    q.processAllAvailable()
    input.addData(4L -> "a b c d e q", 3L -> "a b c d g") // add 4, upsert 3
    q.processAllAvailable()
    q.stop()
    val scratch = new PairGraphIndex(spark, BucketedViewStore.temp(spark, 4),
      "pg_stream_scratch")
    scratch.build(Seq(1L -> "a b c d e", 2L -> "a b c d f",
      3L -> "a b c d g", 4L -> "a b c d e q").toDF("doc_id", "text"))
    def ps(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(ps(g.pairs).nonEmpty, "fixture must produce near-dup pairs")
    assert(ps(g.pairs) === ps(scratch.pairs))
  }

  test("streaming components: per-batch labeling equals from-scratch resolution") {
    import graft.engine.BucketedViewStore
    import graft.operators.{Components, ComponentsIndex, PairGraphIndex}
    val g = new PairGraphIndex(spark, BucketedViewStore.temp(spark, 4),
      "pgc_stream")
    val ci = new ComponentsIndex(spark, BucketedViewStore.temp(spark, 4), "pgc_stream")
    val sm = new graft.streaming.StreamingPairGraph(g, Some(ci))
    val input = MemoryStream[(Long, String)]
    val q = sm.writer(input.toDF().toDF("doc_id", "text")).start()
    // batch 1: {1,2} near-dups, 3 alone — bootstrap both stages
    input.addData(1L -> "a b c d e", 2L -> "a b c d f", 3L -> "x y z w v")
    q.processAllAvailable()
    // batch 2: 4 joins the {1,2} cluster, 3 rewritten INTO the cluster
    input.addData(4L -> "a b c d e q", 3L -> "a b c d g")
    q.processAllAvailable()
    q.stop()
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "component").as[(Long, Long)].collect().toMap
    val scratch = labels(Components.resolve(g.pairs.select("i", "j")))
    assert(scratch.nonEmpty, "fixture must produce a near-dup cluster")
    assert(labels(ci.components) === scratch)
  }

  test("streaming auto-compaction folds micro-batch file accretion; results unchanged") {
    import graft.engine.BucketedViewStore
    import graft.streaming.BucketedStreamingMapIndex
    import scala.jdk.CollectionConverters._
    val store = new BucketedViewStore(spark,
      java.nio.file.Files.createTempDirectory("graft-scompact-").toString,
      numBuckets = 2, writeSalt = 8)
    val idx = MapIndex.columns("stream_autocompact")(col("key"),
      array(emit(col("key"), col("test"))))
    // every 2nd batch compacts (maxFilesPerBucket default 1)
    val sm = new BucketedStreamingMapIndex(idx, store, compactEvery = 2)
    val input = MemoryStream[(String, Int)]
    // keep the salted slices observable (see the salted-write test)
    val coalesce0 = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val q = sm.writer(input.toDF().toDF("key", "test")).start()
    try {
      input.addData((1 to 400).map(i => s"k$i" -> i): _*)
      q.processAllAvailable()
      input.addData((1 to 100).map(i => s"k$i" -> (i * 10)): _*) // batch 2 → compact
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce0)
    }
    // post-compaction: every live emit bucket is back to one file
    val files = store.manifest(idx.name).collect { case (("emit", b), v) =>
      val dir = java.nio.file.Paths.get(store.baseDir, idx.name, s"kb=$b", s"v$v")
      val s0 = java.nio.file.Files.list(dir)
      try s0.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
      finally s0.close()
    }
    assert(files.nonEmpty && files.forall(_ == 1),
      s"auto-compaction must fold each live bucket to one file, saw $files")
    // and the stream's results are exactly the upsert semantics
    assert(store.df(idx.name).count() === 400)
    assert(store.get(idx.name, "k7").as[Int].collect().toSeq === Seq(70))
    assert(store.get(idx.name, "k300").as[Int].collect().toSeq === Seq(300))
  }

  test("bucketed streaming cascade propagates incremental changes (O17 at scale)") {
    import graft.engine.BucketedViewStore
    import graft.streaming.BucketedStreamingMapIndex
    val store = BucketedViewStore.temp(spark, numBuckets = 8)
    val idx = MapIndex.columns("bstream_casc")(col("key"),
      array(emit(lit("test"), col("test"))))
    val secondary = MapIndex.columns("bstream_casc2")(col("key"),
      array(emit(lit("test2"), col("value")(0)("emit_value"))))
    val sm = new BucketedStreamingMapIndex(idx, store, cascades = Seq(secondary))
    val input = MemoryStream[(String, Int)]
    val q = sm.writer(input.toDF().toDF("key", "test")).start()
    input.addData("asdf" -> 123, "other" -> 9)
    q.processAllAvailable()
    assert(store.get(secondary.name, "test2").as[Int].collect().sorted
      === Seq(9, 123))
    // cascaded overwrite through the bucketed store (test-replication.js:39-51)
    input.addData("asdf" -> 345)
    q.processAllAvailable()
    assert(store.get(secondary.name, "test2").as[Int].collect().sorted
      === Seq(9, 345))
    q.stop()
  }

  test("bucketed streaming tombstone retracts downstream through the cascade") {
    import graft.engine.BucketedViewStore
    import graft.streaming.BucketedStreamingMapIndex
    val store = BucketedViewStore.temp(spark, numBuckets = 8)
    val idx = MapIndex.columns("bstream_del")(col("key"),
      array(emit(lit("test"), col("test"))))
    val secondary = MapIndex.columns("bstream_del2")(col("key"),
      array(emit(lit("test2"), col("value")(0)("emit_value"))))
    val sm = new BucketedStreamingMapIndex(idx, store, cascades = Seq(secondary))
    val input = MemoryStream[(String, Int, Boolean)]
    val q = sm.writer(input.toDF().toDF("key", "test", "deleted")).start()
    input.addData(("asdf", 123, false), ("keep", 9, false))
    q.processAllAvailable()
    input.addData(("asdf", 0, true)) // {key, deleted: true}
    q.processAllAvailable()
    assert(store.get(idx.name, "test").as[Int].collect().toSeq === Seq(9))
    assert(store.get(secondary.name, "test2").as[Int].collect().toSeq === Seq(9))
    q.stop()
  }

  test("stateful sessionizer closes sessions across micro-batches") {
    import graft.streaming.StatefulSessionizer
    import graft.streaming.StatefulSessionizer.{ClosedSession, Event}
    val input = MemoryStream[Event]
    val q = StatefulSessionizer.sessions(input.toDS()).writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_out")
      .start()
    val min = 60L * 1000000
    // batch 1: two events 5 min apart (one open session)
    input.addData(Event(1, 0), Event(1, 5 * min))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() === 0) // still open
    // batch 2: an event 45 min later closes the first session
    input.addData(Event(1, 50 * min))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").as[ClosedSession].collect().toSeq
    assert(closed === Seq(ClosedSession(1, 0, 2, 5 * min)))
    // a second user's lone event stays open and emits nothing
    input.addData(Event(2, 0))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() === 1)
    q.stop()
  }

  test("stateful funnel carries stage flags across micro-batches; order respected") {
    import graft.streaming.StatefulFunnel
    import graft.streaming.StatefulFunnel.{Event, Flags}
    val input = MemoryStream[Event]
    val q = StatefulFunnel.flags(input.toDS()).writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_out")
      .start()
    def latest(u: Long): Flags = spark.table("funnel_out").as[Flags]
      .collect().filter(_.user_id == u)
      .foldLeft(Flags(u, false, false, false))((a, b) => Flags(u,
        a.seen_view || b.seen_view, a.seen_s2 || b.seen_s2, a.seen_s3 || b.seen_s3))
    // user 1: click BEFORE view (same batch, out of order in arrival —
    // the fold sorts) must NOT count as click-after-view
    input.addData(Event(1, 20, 2, "view"), Event(1, 10, 1, "click"))
    q.processAllAvailable()
    assert(latest(1) === Flags(1, true, false, false))
    // next batch: click now follows the view (state crossed the batch);
    // purchase in the same batch follows that click
    input.addData(Event(1, 30, 3, "click"), Event(1, 40, 4, "purchase"))
    q.processAllAvailable()
    assert(latest(1) === Flags(1, true, true, true))
    // user 2: purchase before any click-after-view stays un-reached
    input.addData(Event(2, 10, 5, "purchase"), Event(2, 20, 6, "view"))
    q.processAllAvailable()
    assert(latest(2) === Flags(2, true, false, false))
    q.stop()
  }

  test("streaming exact dedup keeps first doc per content hash, bounded state") {
    import graft.streaming.StreamingDedup
    val input = MemoryStream[(Timestamp, String, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingDedup.firstPerContent(docs).writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out")
      .start()
    def t(s: String) = Timestamp.valueOf(s)
    input.addData(
      (t("2024-01-01 10:00:00"), "d1", "alpha beta"),
      (t("2024-01-01 10:01:00"), "d2", "alpha beta"), // dup in-batch
      (t("2024-01-01 10:02:00"), "d3", "gamma delta"))
    q.processAllAvailable()
    input.addData((t("2024-01-01 10:30:00"), "d4", "alpha beta")) // dup cross-batch
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_out").select("doc_id").as[String].collect().toSet
    assert(kept.intersect(Set("d1", "d2")).size === 1) // exactly one of the dups
    assert(kept.contains("d3") && !kept.contains("d4"))
  }

  test("incremental LSH near-dup index equals the one-shot batch pipeline") {
    import graft.streaming.StreamingNearDupIndex
    val sf = "/root/testdata/sf0.001"
    val docs = graft.engine.Tables.documents(spark, sf)
      .select("doc_id", "text").persist()
    val n = docs.count()
    // one-shot ground truth: the batch pipeline over the full corpus
    val batchPairs = graft.operators.PipelineQueries.minhashLshPairs(spark, sf)
      .select("i", "j", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(batchPairs.nonEmpty, "spec corpus is known to contain near-dups")
    // stream the same corpus in 3 arbitrary micro-batches
    for (split <- Seq(Seq(0L, n / 3, 2 * n / 3, n), Seq(0L, n / 5, n / 2, n))) {
      val dir = java.nio.file.Files.createTempDirectory("neardup").toString
      val idx = new StreamingNearDupIndex(spark, dir)
      val flagged = split.sliding(2).flatMap { case Seq(lo, hi) =>
        idx.applyBatch(docs.filter(col("doc_id") >= lo && col("doc_id") < hi))
          .as[(Long, Long, Double)].collect()
      }.map { case (i, j, jc) => (math.min(i, j), math.max(i, j), jc) }.toSet
      assert(flagged === batchPairs,
        s"split $split: incremental flags must equal the batch pipeline")
    }
    docs.unpersist()
  }

  test("streaming near-dup writer flags cross-batch duplicates from a doc stream") {
    import graft.streaming.StreamingNearDupIndex
    val dir = java.nio.file.Files.createTempDirectory("neardup_stream").toString
    val out = s"$dir/flagged"
    val input = MemoryStream[(Long, String)]
    val idx = new StreamingNearDupIndex(spark, s"$dir/index")
    val q = idx.writer(input.toDF().toDF("doc_id", "text"), out)
      .option("checkpointLocation", s"$dir/ckpt").start()
    input.addData(1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "completely unrelated text about spark physical planning")
    q.processAllAvailable()
    // near-dup of doc 1 arrives two batches later
    input.addData(3L -> "the quick brown fox jumps over the lazy dog today")
    q.processAllAvailable()
    q.stop()
    val flagged = spark.read.parquet(out).select("i", "j")
      .as[(Long, Long)].collect().toSet
    assert(flagged === Set(1L -> 3L), s"got $flagged")
  }

  test("stream-stream interval join matches purchases to in-window clicks") {
    val clickIn = MemoryStream[(Timestamp, Long, Double)]
    val purchIn = MemoryStream[(Timestamp, Long, Long)]
    val clicks = clickIn.toDF().toDF("ts", "user_id", "value")
    val purchases = purchIn.toDF().toDF("ts", "user_id", "event_id")
    val q = StreamingEvents.clickPurchaseJoin(clicks, purchases).writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join_out")
      .start()
    def t(s: String) = Timestamp.valueOf(s)
    clickIn.addData(
      (t("2024-01-01 10:00:00"), 1L, 1.5), // in window of the 10:30 purchase
      (t("2024-01-01 09:00:00"), 1L, 9.9), // too old (> 1h before purchase)
      (t("2024-01-01 10:10:00"), 2L, 2.5)) // other user
    purchIn.addData((t("2024-01-01 10:30:00"), 1L, 100L))
    q.processAllAvailable()
    // advance both watermarks far enough to emit/evict
    clickIn.addData((t("2024-01-01 13:00:00"), 9L, 0.0))
    purchIn.addData((t("2024-01-01 13:00:00"), 9L, 999L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join_out")
      .select(col("event_id"), col("user_id"), col("click_value"))
      .as[(Long, Long, Double)].collect().toSet
    assert(rows.contains((100L, 1L, 1.5)))
    assert(!rows.exists(_._3 == 9.9), "out-of-interval click must not join")
    assert(!rows.exists(_._2 == 2L), "other user's click must not join")
  }

  test("watermarked hourly window agg emits closed windows in append mode") {
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamingEvents.hourlyAgg(events).writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("hourly_out")
      .start()
    def t(s: String) = Timestamp.valueOf(s)
    input.addData(
      (t("2024-01-01 10:05:00"), "click", 1.5),
      (t("2024-01-01 10:55:00"), "click", 2.5),
      (t("2024-01-01 11:05:00"), "view", 4.0))
    q.processAllAvailable()
    input.addData((t("2024-01-01 13:00:00"), "click", 8.0)) // advance watermark
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("hourly_out")
      .select(col("hour").cast("string"), col("event_type"), col("cnt"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    // windows fully below the watermark (10:00, 11:00) must have been emitted
    assert(rows.contains(("2024-01-01 10:00:00", "click", 2L, 4.0)))
    assert(rows.contains(("2024-01-01 11:00:00", "view", 1L, 4.0)))
  }

  test("custom UDAF (heavy_hitters) runs inside a watermarked streaming window") {
    // TypedImperativeAggregate buffers serialize into streaming state, so
    // the engine's custom sketches compose with Structured Streaming —
    // per-window frequent users over an event stream
    graft.functions.Sketches.register(spark)
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr("heavy_hitters(user_id, 4)").as("frequent"))
      .select(col("window.start").as("hour"), col("frequent"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("hh_out")
      .start()
    def t(s: String) = Timestamp.valueOf(s)
    // user 7 dominates the 10:00 window across micro-batches
    input.addData((t("2024-01-01 10:05:00"), 7L), (t("2024-01-01 10:10:00"), 7L),
      (t("2024-01-01 10:15:00"), 1L))
    q.processAllAvailable()
    input.addData((t("2024-01-01 10:20:00"), 7L), (t("2024-01-01 10:25:00"), 2L))
    q.processAllAvailable()
    input.addData((t("2024-01-01 13:00:00"), 9L)) // advance watermark past 10:00
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("hh_out")
      .select(col("hour").cast("string"), col("frequent"))
      .as[(String, Seq[Long])].collect().toMap
    // the closed 10:00 window merged sketch state across micro-batches:
    // user 7 (3 of 5 events, above N/k) must be in the candidate set
    assert(rows.contains("2024-01-01 10:00:00"), s"windows: ${rows.keySet}")
    assert(rows("2024-01-01 10:00:00").contains(7L), s"got ${rows("2024-01-01 10:00:00")}")
  }
}
