package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.{MapIndex, ViewStore}
import graft.engine.MapIndex.emit

/**
 * Property tests for the maintenance invariants (SURVEY.md §5), driven by
 * seeded ScalaCheck generators (each case runs real Spark jobs, so a small
 * deterministic sample instead of the default 100):
 *  - overwrite idempotence: write(k,v1); write(k,v2) ≡ write(k,v2)
 *  - tombstone ≡ never written
 *  - get(k) ≡ filter(emit_key = k) of a full scan
 */
class PropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val idx = MapIndex.columns("prop")(col("key"),
    array(emit(col("key"), col("v"))))

  private def build(rows: Seq[(String, Int)]) = {
    val store = ViewStore.temp(spark)
    (store, idx.materialize(rows.toDF("key", "v"), store))
  }

  private val keyGen = Gen.oneOf("a", "b", "c", "d")
  private val rowsGen = Gen.listOfN(6, Gen.zip(keyGen, Gen.choose(0, 99)))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("overwrite idempotence: refreshing twice equals refreshing once") {
    (1 to 4).foreach { i =>
      val rows = sample(rowsGen, 100L + i)
      val k = sample(keyGen, 200L + i)
      val (v1, v2) = (i * 7 % 100, i * 13 % 100)
      val (_, view) = build(rows)
      val twice = view.refresh(Seq(k -> v1).toDF("key", "v"))
        .refresh(Seq(k -> v2).toDF("key", "v"))
      val once = view.refresh(Seq(k -> v2).toDF("key", "v"))
      val a = twice.df.select("src_key", "emit_key", "emit_value")
        .as[(String, String, Int)].collect().sorted.toSeq
      val b = once.df.select("src_key", "emit_key", "emit_value")
        .as[(String, String, Int)].collect().sorted.toSeq
      assert(a === b, s"case $i rows=$rows k=$k")
    }
  }

  test("tombstone equals never-written") {
    (1 to 4).foreach { i =>
      val rows = sample(rowsGen, 300L + i).toMap.toSeq // unique source keys
      val k = "zz" // outside keyGen's range
      val (_, withK) = build(rows :+ (k -> i))
      val deleted = withK.refresh(Seq.empty[(String, Int)].toDF("key", "v"),
        Some(Seq(k).toDF("src_key")))
      val (_, never) = build(rows)
      val a = deleted.df.select("src_key", "emit_value")
        .as[(String, Int)].collect().sorted.toSeq
      val b = never.df.select("src_key", "emit_value")
        .as[(String, Int)].collect().sorted.toSeq
      assert(a === b, s"case $i rows=$rows")
    }
  }

  test("bucketed store equals flat store over random upsert/tombstone sequences") {
    import graft.engine.BucketedViewStore
    // the scale store and the reference-shaped flat store must agree on
    // ANY maintenance history, not just the hand-written cases
    val opGen = Gen.zip(Gen.oneOf(true, false), rowsGen) // (isUpsert, rows)
    (1 to 3).foreach { i =>
      val initial = sample(rowsGen, 600L + i).toMap.toSeq
      val ops = sample(Gen.listOfN(3, opGen), 700L + i)
      val bucketed = BucketedViewStore.temp(spark, numBuckets = 8)
      val flat = ViewStore.temp(spark)
      bucketed.materialize(idx, initial.toDF("key", "v"))
      var flatView = idx.materialize(initial.toDF("key", "v"), flat)
      ops.foreach { case (isUpsert, rows) =>
        if (isUpsert) {
          val batch = rows.toMap.toSeq.toDF("key", "v") // unique keys per batch
          bucketed.refresh(idx, batch)
          flatView = flatView.refresh(batch)
        } else {
          val dels = Some(rows.map(_._1).distinct.toDF("src_key"))
          val empty = Seq.empty[(String, Int)].toDF("key", "v")
          bucketed.refresh(idx, empty, dels)
          flatView = flatView.refresh(empty, dels)
        }
      }
      val a = bucketed.df(idx.name).select("src_key", "emit_key", "emit_value")
        .as[(String, String, Int)].collect().sorted.toSeq
      val b = flatView.df.select("src_key", "emit_key", "emit_value")
        .as[(String, String, Int)].collect().sorted.toSeq
      assert(a === b, s"case $i ops=$ops")
    }
  }

  test("change feed replay reconstructs the final snapshot on random histories") {
    import graft.engine.BucketedViewStore
    // the CDC invariant both stores promise: for ANY maintenance history,
    // v0 ∪ feed-inserts − feed-deletes (exact rows, uid included) == vN.
    // This is what makes a bootstrapped consumer + replay equivalent to
    // re-reading the view.
    val opGen = Gen.zip(Gen.oneOf(true, false), rowsGen)
    def rows4(df: org.apache.spark.sql.DataFrame): Set[(String, String, Int, Long)] =
      df.select("src_key", "emit_key", "emit_value", "uid")
        .as[(String, String, Int, Long)].collect().toSet
    (1 to 3).foreach { i =>
      val initial = sample(rowsGen, 900L + i).toMap.toSeq
      val ops = sample(Gen.listOfN(3, opGen), 1000L + i)
      val flat = new ViewStore(spark,
        java.nio.file.Files.createTempDirectory("graft-prop-cdc-").toString,
        graceVersions = 10)
      val bucketed = new BucketedViewStore(spark,
        java.nio.file.Files.createTempDirectory("graft-prop-cdcb-").toString,
        numBuckets = 8, graceVersions = 10, changeRetention = 10)
      var flatView = idx.materialize(initial.toDF("key", "v"), flat)
      bucketed.materialize(idx, initial.toDF("key", "v"))
      ops.foreach { case (isUpsert, rows) =>
        if (isUpsert) {
          val batch = rows.toMap.toSeq.toDF("key", "v")
          flatView = flatView.refresh(batch)
          bucketed.refresh(idx, batch)
        } else {
          val dels = Some(rows.map(_._1).distinct.toDF("src_key"))
          val empty = Seq.empty[(String, Int)].toDF("key", "v")
          flatView = flatView.refresh(empty, dels)
          bucketed.refresh(idx, empty, dels)
        }
      }
      val n = ops.size
      val feed = flatView.changesBetween(0, n)
      val replayed = rows4(flatView.asOf(0)) ++
        rows4(feed.filter(col("change_type") === "insert")) --
        rows4(feed.filter(col("change_type") === "delete"))
      assert(replayed === rows4(flatView.df), s"case $i flat ops=$ops")
      val bFeed = bucketed.changesBetween(idx.name, 0, n)
      val bReplayed = rows4(bucketed.dfAsOf(idx.name, 0)) ++
        rows4(bFeed.filter(col("change_type") === "insert")) --
        rows4(bFeed.filter(col("change_type") === "delete"))
      assert(bReplayed === rows4(bucketed.df(idx.name)), s"case $i bucketed ops=$ops")
    }
  }

  test("topk_by equals the window row_number spelling on random groups") {
    graft.functions.Sketches.register(spark)
    // unique ids, no nulls — the documented contract under which the two
    // spellings promise identical answers
    val rowGen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0.0, 9.0).map(x => math.rint(x * 4) / 4)))
    (1 to 4).foreach { i =>
      val rows = sample(rowGen, 600L + i).zipWithIndex
        .map { case ((g, s), id) => (g, s, id.toLong) }
      val df = rows.toDF("g", "s", "id").repartition(7)
      val viaAgg = df.groupBy("g")
        .agg(expr("topk_by(s, id, 3)").as("top"))
        .select(col("g"), explode(col("top")).as("t"))
        .select(col("g"), col("t.score"), col("t.id"))
        .as[(Long, Double, Long)].collect().sorted.toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("s").desc, col("id"))
      val viaWin = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select(col("g"), col("s"), col("id"))
        .as[(Long, Double, Long)].collect().sorted.toSeq
      assert(viaAgg === viaWin, s"case $i")
    }
  }

  test("heavy_hitters completeness holds on random zipf-ish streams") {
    graft.functions.Sketches.register(spark)
    // values drawn with heavy skew; every value above N/k must survive
    val valGen = Gen.frequency(
      5 -> Gen.const(0L), 3 -> Gen.const(1L), 2 -> Gen.choose(2L, 40L))
    (1 to 3).foreach { i =>
      val vals = sample(Gen.listOfN(400, valGen), 700L + i)
      val df = vals.toDF("v").repartition(9)
      val k = 8
      val cand = df.agg(expr(s"heavy_hitters(v, $k)")).as[Seq[Long]].head().toSet
      val counts = vals.groupBy(identity).view.mapValues(_.size).toMap
      val mustHave = counts.filter(_._2 > vals.size.toDouble / k).keySet
      assert(mustHave.subsetOf(cand), s"case $i: lost ${mustHave -- cand}")
      assert(cand.size <= k, s"case $i: $cand")
    }
  }

  test("net change-feed replay equals the snapshot diff over random histories") {
    import graft.engine.MaterializedView
    // retain every version + sidecar for the whole history so the full
    // (0, last] range stays addressable
    val store = new ViewStore(spark,
      java.nio.file.Files.createTempDirectory("graft-net-").toString,
      graceVersions = 12)
    val nidx = MapIndex.columns("net_replay")(col("key"),
      array(emit(col("key"), col("v"))))
    val batchGen = Gen.zip(
      Gen.listOfN(4, Gen.zip(keyGen, Gen.choose(0, 99))), // upserts
      Gen.someOf(Seq("a", "b", "c", "d")))                // tombstones
    var view = nidx.materialize(
      Seq("a" -> 1, "b" -> 2, "c" -> 3).toDF("key", "v"), store)
    (1 to 5).foreach { i =>
      val (ups, dels) = sample(batchGen, 900L + i)
      // a key both upserted and tombstoned in one batch: tombstone wins
      // in the refresh contract only if the upsert doesn't re-emit it —
      // keep the history unambiguous by excluding tombstoned keys
      val cleanUps = ups.filterNot { case (k, _) => dels.contains(k) }
      view = view.refresh(cleanUps.toDF("key", "v"),
        Some(dels.toSeq.toDF("src_key")))
    }
    val last = store.latestVersion(nidx.name).get
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, Int, Long)] =
      df.select("src_key", "emit_key", "emit_value", "uid")
        .as[(String, String, Int, Long)].collect().toSet
    val s0 = rows(store.readVersion(nidx.name, 0))
    val sN = rows(store.readVersion(nidx.name, last))
    val net = store.changesNetBetween(nidx.name, 0, last)
    val delUids = net.filter(col("change_type") === "delete")
      .select("uid").as[Long].collect().toSet
    val inserts = rows(net.filter(col("change_type") === "insert"))
    // replay: start snapshot minus net deletes plus net inserts = end snapshot
    assert(s0.filterNot(r => delUids.contains(r._4)) ++ inserts === sN)
    // netting is real: no more rows than the gross feed, and a key touched
    // twice contributes at most its first deletes + last inserts
    val grossN = store.changesBetween(nidx.name, 0, last).count()
    assert(net.count() <= grossN)
  }

  test("feed reads survive snapshot GC at graceVersions = 1") {
    import graft.engine.BucketedViewStore
    // The r8 escape: every replay property ran at grace 10-12, so
    // changesBetween's former from-SNAPSHOT precondition was never
    // exercised against a GC'd endpoint — and the driver's two-refresh
    // net-feed fixture on the default grace-1 store failed every run.
    // Sidecar life is a consumer-lag budget DECOUPLED from snapshot
    // (time-travel) life: after two refreshes on a grace-1 store the v0
    // snapshot is gone but sidecars v1,v2 remain, and the (0, 2] feed —
    // gross and net — must still replay onto the final snapshot.
    val store = new ViewStore(spark,
      java.nio.file.Files.createTempDirectory("graft-grace1-").toString,
      graceVersions = 1)
    val gidx = MapIndex.columns("grace1_feed")(col("key"),
      array(emit(col("key"), col("v"))))
    def rows4(df: org.apache.spark.sql.DataFrame): Set[(String, String, Int, Long)] =
      df.select("src_key", "emit_key", "emit_value", "uid")
        .as[(String, String, Int, Long)].collect().toSet
    var view = gidx.materialize(
      Seq("a" -> 1, "b" -> 2, "c" -> 3).toDF("key", "v"), store)
    val s0 = rows4(view.df) // capture v0 rows BEFORE GC reclaims them
    view = view.refresh(Seq("a" -> 10).toDF("key", "v"))                   // v1
    view = view.refresh(Seq("a" -> 100, "d" -> 7).toDF("key", "v"),
      Some(Seq("b").toDF("src_key")))                                      // v2
    // snapshot v0 is reclaimed (time-travel horizon passed)...
    assert(store.readableVersions(gidx.name) === Seq(1, 2))
    intercept[IllegalArgumentException](store.readVersion(gidx.name, 0))
    // ...but both feeds over (0, 2] still serve from sidecars and replay
    // exactly onto the live snapshot (uid-exact, the CDC invariant)
    val sN = rows4(view.df)
    val gross = store.changesBetween(gidx.name, 0, 2)
    val gDel = gross.filter(col("change_type") === "delete")
      .select("uid").as[Long].collect().toSet
    assert(s0.filterNot(r => gDel.contains(r._4)) ++
      rows4(gross.filter(col("change_type") === "insert"))
        .filterNot(r => gDel.contains(r._4)) === sN)
    val net = store.changesNetBetween(gidx.name, 0, 2)
    val nDel = net.filter(col("change_type") === "delete")
      .select("uid").as[Long].collect().toSet
    assert(s0.filterNot(r => nDel.contains(r._4)) ++
      rows4(net.filter(col("change_type") === "insert")) === sN)
    // a third refresh pushes sidecar v1 past the horizon: a range that
    // needs it fails loudly naming the sidecar, while (1, 3] still serves
    view = view.refresh(Seq("c" -> 30).toDF("key", "v"))                   // v3
    val e = intercept[IllegalArgumentException](
      store.changesBetween(gidx.name, 0, 3))
    assert(e.getMessage.contains("sidecar v1"))
    assert(store.changesBetween(gidx.name, 1, 3).count() > 0)
    // a toVersion beyond the published head must stay unreadable (a
    // crashed writer's orphan sidecar is not a feed)
    intercept[IllegalArgumentException](store.changesBetween(gidx.name, 2, 4))
    // bucketed analog at grace 1: epoch-0 manifest is past the grace
    // horizon but the (0, 2] feed serves from its retention-governed
    // sidecars (changeRetention default 8)
    val bstore = new BucketedViewStore(spark,
      java.nio.file.Files.createTempDirectory("graft-grace1b-").toString,
      numBuckets = 4, graceVersions = 1)
    bstore.materialize(gidx, Seq("a" -> 1, "b" -> 2).toDF("key", "v"))
    val bs0 = rows4(bstore.df(gidx.name))
    bstore.refresh(gidx, Seq("a" -> 10).toDF("key", "v"))
    bstore.refresh(gidx, Seq("b" -> 20).toDF("key", "v"))
    val bFeed = bstore.changesBetween(gidx.name, 0, 2)
    val bDel = bFeed.filter(col("change_type") === "delete")
      .select("uid").as[Long].collect().toSet
    assert(bs0.filterNot(r => bDel.contains(r._4)) ++
      rows4(bFeed.filter(col("change_type") === "insert")) ===
      rows4(bstore.df(gidx.name)))
  }

  test("error contracts: guards fail loud with actionable messages") {
    import graft.functions.{Sketches, VectorFunctions}
    Sketches.register(spark)
    VectorFunctions.register(spark)
    // vec_dot dimension mismatch must raise, not truncate
    val e1 = intercept[Exception] {
      Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
        .select(expr("vec_dot(a, b)")).collect()
    }
    assert(e1.getMessage != null)
    // bottomk_distinct arity and k validation
    val e2 = intercept[Exception] {
      spark.range(5).agg(expr("bottomk_distinct(id, 2, 3)")).collect()
    }
    assert(e2.getMessage.contains("bottomk_distinct"))
    val e3 = intercept[Exception] {
      spark.range(5).agg(expr("bottomk_distinct(id, 0)")).collect()
    }
    assert(e3.getMessage.contains("positive"))
    // heavy_hitters requires a BIGINT column
    val e4 = intercept[Exception] {
      Seq("x").toDF("s").agg(expr("heavy_hitters(s, 4)")).collect()
    }
    assert(e4.getMessage.contains("BIGINT"))
    // components non-convergence guard fires rather than returning
    // half-propagated labels
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("i", "j")
    val e5 = intercept[IllegalStateException] {
      graft.operators.Components.minLabel(chain, maxIter = 1)
    }
    assert(e5.getMessage.contains("converge"))
  }

  test("native as-of join equals the union+window spelling on random tied streams") {
    import org.apache.spark.sql.expressions.Window
    // small key/time ranges force heavy ties — the case where the two
    // spellings' tie-break contracts must agree exactly
    val probeGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 20L)))
    val buildGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 20L), Gen.choose(0, 99)))
    (1 to 3).foreach { i =>
      val probes = sample(probeGen, 700L + i).zipWithIndex
        .map { case ((u, t), id) => (id.toLong, u, t) }
      val builds = sample(buildGen, 800L + i).zipWithIndex
        .map { case ((u, t, v), id) => (1000L + id, u, t, v.toDouble) }
      val pDf = probes.toDF("p_id", "user", "p_ts")
      val bDf = builds.toDF("b_id", "b_user", "b_ts", "b_value")
      val native = graft.plans.AsOfJoin.backward(pDf, bDf,
          Seq("user"), Seq("b_user"), "p_ts", "b_ts", rightTie = Seq("b_id"))
        .select(col("p_id"), col("b_value"))
        .as[(Long, Option[Double])].collect().toMap
      // the union+window spelling: builds sort before probes at equal ts
      // (inclusive), larger build id last (last-wins == largest tie)
      val w = Window.partitionBy("user")
        .orderBy(col("ts"), col("is_probe"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val windowed = probes.toDF("id", "user", "ts")
        .select(col("id"), col("user"), col("ts"),
          lit(1).as("is_probe"), lit(null).cast("double").as("b_value"))
        .unionByName(builds.toDF("id", "user", "ts", "b_value")
          .select(col("id"), col("user"), col("ts"),
            lit(0).as("is_probe"), col("b_value")))
        .withColumn("last_v", last("b_value", ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1)
        .select(col("id"), col("last_v"))
        .as[(Long, Option[Double])].collect().toMap
      assert(native === windowed, s"trial $i: spellings disagree")
    }
  }

  test("get(k) equals full-scan filter on the emitted key") {
    (1 to 4).foreach { i =>
      val rows = sample(rowsGen, 400L + i)
      val k = sample(keyGen, 500L + i)
      val (_, view) = build(rows)
      val viaGet = view.get(k).as[Int].collect().sorted.toSeq
      val viaScan = view.scan()
        .filter(col("emit_key") === k).select("emit_value")
        .as[Int].collect().sorted.toSeq
      assert(viaGet === viaScan, s"case $i rows=$rows k=$k")
    }
  }

  test("pair graph: random change histories equal from-scratch rebuilds") {
    import graft.engine.BucketedViewStore
    import graft.operators.PairGraphIndex
    // tiny vocabulary → shared shingles everywhere; cap 3 → cap
    // membership flips constantly across batches, the global-coupling
    // case the incremental maintenance must track exactly
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val text = Gen.listOfN(6, word).map(_.mkString(" "))
    val docGen = Gen.zip(Gen.choose(1L, 12L), text)
    def corpusOf(m: Map[Long, String]) =
      m.toSeq.map { case (id, t) => (id, t) }.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j", "jaccard").as[(Long, Long, Double)].collect().toSet
    // 2 trials × 3 rounds: each round runs three store refreshes plus a
    // full scratch rebuild, so trials are expensive — the directed
    // cap-crossing unit test covers the deterministic cases
    (1 to 2).foreach { trial =>
      val g = new PairGraphIndex(spark, BucketedViewStore.temp(spark, 4),
        s"pg_prop$trial", maxDf = 3, threshold = 0.2)
      var state = sample(Gen.listOfN(6, docGen), 900L + trial)
        .toMap // dup ids collapse: last write wins, like an upsert batch
      g.build(corpusOf(state))
      (1 to 3).foreach { round =>
        val ups = sample(Gen.listOfN(3, docGen), 1000L * trial + round).toMap
        val delIds = sample(Gen.listOfN(2, Gen.choose(1L, 12L)),
          2000L * trial + round).toSet -- ups.keySet // upsert wins over delete
        state = (state ++ ups) -- delIds
        val dels = if (delIds.isEmpty) None
          else Some(delIds.toSeq.toDF("doc_id"))
        g.refresh(corpusOf(ups), dels)
        val scratch = new PairGraphIndex(spark, BucketedViewStore.temp(spark, 4),
          s"pg_prop${trial}_$round", maxDf = 3, threshold = 0.2)
        scratch.build(corpusOf(state))
        assert(pairSet(g.pairs) === pairSet(scratch.pairs),
          s"trial $trial round $round state=$state")
        assert(g.sizes.as[(Long, Long)].collect().toSet ===
          scratch.sizes.as[(Long, Long)].collect().toSet,
          s"sizes diverged: trial $trial round $round state=$state")
        // dual-keyed mirror invariant: the j-major side of the stored
        // emissions projects the IDENTICAL pair relation as the i-major
        // side `pairs` serves — one source row emits both mirrors
        // atomically, and no history of refreshes may ever skew them
        val jSide = g.store.df(g.pairsName)
          .filter(col("emit_key") === col("emit_value.j").cast("string"))
          .select(col("emit_value.i").as("i"), col("emit_value.j").as("j"),
            col("emit_value.score").as("jaccard"))
        assert(pairSet(jSide) === pairSet(g.pairs),
          s"mirror skew: trial $trial round $round state=$state")
      }
    }
  }

  test("join view equals the recomputed join over random two-sided histories") {
    import graft.engine.JoinView
    // small key domains force real collisions: shared join keys, moved
    // rows, orphaned sides, healed matches
    val lRowGen = Gen.zip(Gen.choose(1L, 10L), Gen.oneOf("a", "b", "c", "d"),
      Gen.choose(0L, 99L))
    val rRowGen = Gen.zip(Gen.choose(100L, 106L), Gen.oneOf("a", "b", "c", "d", "e"),
      Gen.choose(0.0, 9.0).map(x => math.rint(x * 4) / 4))
    def lDf(rows: Map[Long, (String, Long)]) =
      rows.toSeq.map { case (k, (j, v)) => (k, j, v) }
        .toDF("l_pk", "l_jk", "l_val")
    def rDf(rows: Map[Long, (String, Double)]) =
      rows.toSeq.map { case (k, (j, v)) => (k, j, v) }
        .toDF("r_pk", "r_jk", "r_val")
    def joined(l: Map[Long, (String, Long)], r: Map[Long, (String, Double)]) =
      (for {
        (lk, (lj, lv)) <- l.toSeq
        (rk, (rj, rv)) <- r.toSeq if lj == rj
      } yield (lk, rk, lv, rv)).toSet
    (1 to 3).foreach { trial =>
      val store = graft.engine.BucketedViewStore.temp(spark, 4)
      val jv = new JoinView(store, s"jv_prop$trial",
        "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
        "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"))
      var lState = sample(Gen.listOfN(6, lRowGen), 400L + trial)
        .map { case (k, j, v) => k -> (j, v) }.toMap
      var rState = sample(Gen.listOfN(4, rRowGen), 500L + trial)
        .map { case (k, j, v) => k -> (j, v) }.toMap
      jv.build(lDf(lState), rDf(rState))
      (1 to 3).foreach { round =>
        val leftTurn = (trial + round) % 2 == 0
        if (leftTurn) {
          val ups = sample(Gen.listOfN(3, lRowGen), 1000L * trial + round)
            .map { case (k, j, v) => k -> (j, v) }.toMap
          val delIds = sample(Gen.listOfN(2, Gen.choose(1L, 10L)),
            2000L * trial + round).toSet -- ups.keySet
          lState = (lState ++ ups) -- delIds
          jv.refreshLeft(lDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        } else {
          val ups = sample(Gen.listOfN(2, rRowGen), 3000L * trial + round)
            .map { case (k, j, v) => k -> (j, v) }.toMap
          val delIds = sample(Gen.listOfN(1, Gen.choose(100L, 106L)),
            4000L * trial + round).toSet -- ups.keySet
          rState = (rState ++ ups) -- delIds
          jv.refreshRight(rDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        }
        val got = jv.df.select("l_pk", "r_pk", "l_val", "r_val")
          .as[(Long, Long, Long, Double)].collect().toSet
        assert(got === joined(lState, rState),
          s"trial $trial round $round L=$lState R=$rState")
      }
    }
  }

  test("left-outer join view equals the recomputed left join on random histories") {
    import graft.engine.JoinView
    val lRowGen = Gen.zip(Gen.choose(1L, 10L), Gen.oneOf("a", "b", "c", "d"),
      Gen.choose(0L, 99L))
    val rRowGen = Gen.zip(Gen.choose(100L, 106L), Gen.oneOf("a", "b", "c", "d", "e"),
      Gen.choose(0.0, 9.0).map(x => math.rint(x * 4) / 4))
    def lDf(rows: Map[Long, (String, Long)]) =
      rows.toSeq.map { case (k, (j, v)) => (k, j, v) }
        .toDF("l_pk", "l_jk", "l_val")
    def rDf(rows: Map[Long, (String, Double)]) =
      rows.toSeq.map { case (k, (j, v)) => (k, j, v) }
        .toDF("r_pk", "r_jk", "r_val")
    // LEFT JOIN semantics: every left row appears; null-padded when no
    // right key matches, once per matching right row otherwise
    def leftJoined(l: Map[Long, (String, Long)], r: Map[Long, (String, Double)])
        : Set[(Long, Option[Long], Long, Option[Double])] =
      l.toSeq.flatMap { case (lk, (lj, lv)) =>
        val ms = r.toSeq.collect { case (rk, (rj, rv)) if rj == lj => (rk, rv) }
        if (ms.isEmpty) Seq((lk, None: Option[Long], lv, None: Option[Double]))
        else ms.map { case (rk, rv) => (lk, Some(rk), lv, Some(rv)) }
      }.toSet
    (1 to 2).foreach { trial =>
      val store = graft.engine.BucketedViewStore.temp(spark, 4)
      val jv = new JoinView(store, s"jvlo_prop$trial",
        "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
        "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"),
        joinType = "left_outer")
      var lState = sample(Gen.listOfN(6, lRowGen), 800L + trial)
        .map { case (k, j, v) => k -> (j, v) }.toMap
      var rState = sample(Gen.listOfN(4, rRowGen), 900L + trial)
        .map { case (k, j, v) => k -> (j, v) }.toMap
      jv.build(lDf(lState), rDf(rState))
      (1 to 3).foreach { round =>
        val leftTurn = (trial + round) % 2 == 0
        if (leftTurn) {
          val ups = sample(Gen.listOfN(3, lRowGen), 9000L * trial + round)
            .map { case (k, j, v) => k -> (j, v) }.toMap
          val delIds = sample(Gen.listOfN(2, Gen.choose(1L, 10L)),
            9500L * trial + round).toSet -- ups.keySet
          lState = (lState ++ ups) -- delIds
          jv.refreshLeft(lDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        } else {
          val ups = sample(Gen.listOfN(2, rRowGen), 9800L * trial + round)
            .map { case (k, j, v) => k -> (j, v) }.toMap
          val delIds = sample(Gen.listOfN(1, Gen.choose(100L, 106L)),
            9900L * trial + round).toSet -- ups.keySet
          rState = (rState ++ ups) -- delIds
          jv.refreshRight(rDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        }
        val got = jv.df.select("l_pk", "r_pk", "l_val", "r_val")
          .as[(Long, Option[Long], Long, Option[Double])].collect().toSet
        assert(got === leftJoined(lState, rState),
          s"trial $trial round $round L=$lState R=$rState")
      }
    }
  }

  test("full-outer join view equals the recomputed full join on random histories") {
    import graft.engine.JoinView
    val lRowGen = Gen.zip(Gen.choose(1L, 10L), Gen.oneOf("a", "b", "c", "d"),
      Gen.choose(0L, 99L))
    val rRowGen = Gen.zip(Gen.choose(100L, 106L), Gen.oneOf("a", "b", "c", "d", "e"),
      Gen.choose(0.0, 9.0).map(x => math.rint(x * 4) / 4))
    def lDf(rows: Map[Long, (String, Long)]) =
      rows.toSeq.map { case (k, (j, v)) => (k, j, v) }
        .toDF("l_pk", "l_jk", "l_val")
    def rDf(rows: Map[Long, (String, Double)]) =
      rows.toSeq.map { case (k, (j, v)) => (k, j, v) }
        .toDF("r_pk", "r_jk", "r_val")
    // FULL JOIN semantics: matched pairs once per pair; unmatched left
    // rows null-padded right; unmatched right rows null-padded left
    def fullJoined(l: Map[Long, (String, Long)], r: Map[Long, (String, Double)])
        : Set[(Option[Long], Option[Long], Option[Long], Option[Double])] = {
      val leftSide = l.toSeq.flatMap { case (lk, (lj, lv)) =>
        val ms = r.toSeq.collect { case (rk, (rj, rv)) if rj == lj => (rk, rv) }
        if (ms.isEmpty)
          Seq((Some(lk), None: Option[Long], Some(lv), None: Option[Double]))
        else ms.map { case (rk, rv) => (Some(lk), Some(rk), Some(lv), Some(rv)) }
      }
      val rightOnly = r.toSeq.collect {
        case (rk, (rj, rv)) if !l.values.exists(_._1 == rj) =>
          (None: Option[Long], Some(rk), None: Option[Long], Some(rv))
      }
      (leftSide ++ rightOnly).toSet
    }
    // the rollup riding the same history: group by the RIGHT join key
    // (left-pads under NULL), sum the LEFT value (right-pads count with
    // a sum-invisible null) — per-group over the full-join multiset
    def rolled(l: Map[Long, (String, Long)], r: Map[Long, (String, Double)])
        : Map[Option[String], (Long, Long)] = {
      val rows: Seq[(Option[String], Option[Long])] =
        l.toSeq.flatMap { case (_, (lj, lv)) =>
          val n = r.values.count(_._1 == lj)
          if (n == 0) Seq((None: Option[String], Some(lv)))
          else Seq.fill(n)((Some(lj), Some(lv)))
        } ++ r.toSeq.collect {
          case (_, (rj, _)) if !l.values.exists(_._1 == rj) =>
            (Some(rj), None: Option[Long])
        }
      rows.groupBy(_._1).map { case (g, xs) =>
        g -> (xs.size.toLong, xs.flatMap(_._2).sum) }
    }
    (1 to 2).foreach { trial =>
      val store = graft.engine.BucketedViewStore.temp(spark, 4)
      val jv = new JoinView(store, s"jvfo_prop$trial",
        "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
        "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"),
        joinType = "full_outer")
      var lState = sample(Gen.listOfN(6, lRowGen), 1800L + trial)
        .map { case (k, j, v) => k -> (j, v) }.toMap
      var rState = sample(Gen.listOfN(4, rRowGen), 1900L + trial)
        .map { case (k, j, v) => k -> (j, v) }.toMap
      jv.build(lDf(lState), rDf(rState))
      val agg = new graft.engine.JoinAggView(jv, s"jvfo_prop${trial}__rollup",
        "r_jk", "l_val")
      agg.build()
      def aggGot(): Map[Option[String], (Long, Long)] =
        agg.state.select(col("emit_key"), col("cnt"),
            coalesce(col("sum_value").cast("long"), lit(0L)))
          .as[(Option[String], Long, Long)].collect()
          .map(t => t._1 -> (t._2, t._3)).toMap
      assert(aggGot() === rolled(lState, rState), s"trial $trial build")
      (1 to 3).foreach { round =>
        val leftTurn = (trial + round) % 2 == 0
        if (leftTurn) {
          val ups = sample(Gen.listOfN(3, lRowGen), 11000L * trial + round)
            .map { case (k, j, v) => k -> (j, v) }.toMap
          val delIds = sample(Gen.listOfN(2, Gen.choose(1L, 10L)),
            11500L * trial + round).toSet -- ups.keySet
          lState = (lState ++ ups) -- delIds
          jv.refreshLeft(lDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        } else {
          val ups = sample(Gen.listOfN(2, rRowGen), 11800L * trial + round)
            .map { case (k, j, v) => k -> (j, v) }.toMap
          val delIds = sample(Gen.listOfN(1, Gen.choose(100L, 106L)),
            11900L * trial + round).toSet -- ups.keySet
          rState = (rState ++ ups) -- delIds
          jv.refreshRight(rDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        }
        val got = jv.df.select("l_pk", "r_pk", "l_val", "r_val")
          .as[(Option[Long], Option[Long], Option[Long], Option[Double])]
          .collect().toSet
        assert(got === fullJoined(lState, rState),
          s"trial $trial round $round L=$lState R=$rState")
        agg.catchUp()
        assert(aggGot() === rolled(lState, rState),
          s"rollup trial $trial round $round L=$lState R=$rState")
      }
    }
  }

  test("aggregate-over-join rollup equals recomputed join+group-by on random histories") {
    import graft.engine.{JoinAggView, JoinView}
    val lRowGen = Gen.zip(Gen.choose(1L, 10L), Gen.oneOf("a", "b", "c", "d"),
      Gen.choose(0L, 99L))
    val rRowGen = Gen.zip(Gen.choose(100L, 106L), Gen.oneOf("a", "b", "c", "d", "e"),
      Gen.choose(0.0, 9.0).map(x => math.rint(x * 4) / 4))
    def lDf(rows: Map[Long, (String, Long)]) =
      rows.toSeq.map { case (k, (j, v)) => (k, j, v) }
        .toDF("l_pk", "l_jk", "l_val")
    def rDf(rows: Map[Long, (String, Double)]) =
      rows.toSeq.map { case (k, (j, v)) => (k, j, v) }
        .toDF("r_pk", "r_jk", "r_val")
    // expected rollup: group the recomputed join multiset by join key
    def rollup(l: Map[Long, (String, Long)], r: Map[Long, (String, Double)]) =
      (for {
        (_, (lj, lv)) <- l.toSeq
        (_, (rj, _)) <- r.toSeq if lj == rj
      } yield (lj, lv)).groupBy(_._1)
        .map { case (j, xs) => j -> (xs.size.toLong, xs.map(_._2).sum) }
    (1 to 2).foreach { trial =>
      val store = graft.engine.BucketedViewStore.temp(spark, 4)
      val jv = new JoinView(store, s"jva_prop$trial",
        "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
        "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"))
      var lState = sample(Gen.listOfN(6, lRowGen), 600L + trial)
        .map { case (k, j, v) => k -> (j, v) }.toMap
      var rState = sample(Gen.listOfN(4, rRowGen), 700L + trial)
        .map { case (k, j, v) => k -> (j, v) }.toMap
      jv.build(lDf(lState), rDf(rState))
      val agg = new JoinAggView(jv, s"jva_prop${trial}__rollup", "l_jk", "l_val")
      agg.build()
      (1 to 3).foreach { round =>
        val leftTurn = (trial + round) % 2 == 0
        if (leftTurn) {
          val ups = sample(Gen.listOfN(3, lRowGen), 5000L * trial + round)
            .map { case (k, j, v) => k -> (j, v) }.toMap
          val delIds = sample(Gen.listOfN(2, Gen.choose(1L, 10L)),
            6000L * trial + round).toSet -- ups.keySet
          lState = (lState ++ ups) -- delIds
          jv.refreshLeft(lDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        } else {
          val ups = sample(Gen.listOfN(2, rRowGen), 7000L * trial + round)
            .map { case (k, j, v) => k -> (j, v) }.toMap
          val delIds = sample(Gen.listOfN(1, Gen.choose(100L, 106L)),
            8000L * trial + round).toSet -- ups.keySet
          rState = (rState ++ ups) -- delIds
          jv.refreshRight(rDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        }
        agg.catchUp()
        val got = agg.state
          .select(col("emit_key"), col("cnt"), col("sum_value").cast("long"))
          .as[(String, Long, Long)].collect()
          .map(t => t._1 -> (t._2, t._3)).toMap
        assert(got === rollup(lState, rState),
          s"trial $trial round $round L=$lState R=$rState")
      }
    }
  }

  test("rollup value-refcount min/max/distinct equals recomputed aggregates on random histories") {
    import graft.engine.{JoinAggView, JoinView}
    val lRowGen = Gen.zip(Gen.choose(1L, 10L), Gen.oneOf("a", "b", "c"),
      Gen.choose(0L, 9L)) // small value domain: heavy duplicate multiplicity
    val rRowGen = Gen.zip(Gen.choose(100L, 104L), Gen.oneOf("a", "b", "c", "d"),
      Gen.choose(0.0, 9.0).map(x => math.rint(x)))
    def lDf(rows: Map[Long, (String, Long)]) =
      rows.toSeq.map { case (k, (j, v)) => (k, j, v) }
        .toDF("l_pk", "l_jk", "l_val")
    def rDf(rows: Map[Long, (String, Double)]) =
      rows.toSeq.map { case (k, (j, v)) => (k, j, v) }
        .toDF("r_pk", "r_jk", "r_val")
    // expected per-group (min, max, distinct) over the recomputed join
    // multiset — the deletion-safe aggregates the refcount state serves
    def multi(l: Map[Long, (String, Long)], r: Map[Long, (String, Double)]) =
      (for {
        (_, (lj, lv)) <- l.toSeq
        (_, (rj, _)) <- r.toSeq if lj == rj
      } yield (lj, lv)).groupBy(_._1)
        .map { case (j, xs) =>
          val vs = xs.map(_._2)
          j -> (vs.min, vs.max, vs.distinct.size.toLong) }
    (1 to 2).foreach { trial =>
      val store = graft.engine.BucketedViewStore.temp(spark, 4)
      val jv = new JoinView(store, s"jvm_prop$trial",
        "l_pk", "l_jk", Seq("l_pk", "l_jk", "l_val"),
        "r_pk", "r_jk", Seq("r_pk", "r_jk", "r_val"))
      var lState = sample(Gen.listOfN(7, lRowGen), 2600L + trial)
        .map { case (k, j, v) => k -> (j, v) }.toMap
      var rState = sample(Gen.listOfN(4, rRowGen), 2700L + trial)
        .map { case (k, j, v) => k -> (j, v) }.toMap
      jv.build(lDf(lState), rDf(rState))
      val agg = new JoinAggView(jv, s"jvm_prop${trial}__rollup", "l_jk", "l_val",
        trackValues = true)
      agg.build()
      (1 to 3).foreach { round =>
        val leftTurn = (trial + round) % 2 == 0
        if (leftTurn) {
          val ups = sample(Gen.listOfN(3, lRowGen), 15000L * trial + round)
            .map { case (k, j, v) => k -> (j, v) }.toMap
          val delIds = sample(Gen.listOfN(2, Gen.choose(1L, 10L)),
            16000L * trial + round).toSet -- ups.keySet
          lState = (lState ++ ups) -- delIds
          jv.refreshLeft(lDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        } else {
          val ups = sample(Gen.listOfN(2, rRowGen), 17000L * trial + round)
            .map { case (k, j, v) => k -> (j, v) }.toMap
          val delIds = sample(Gen.listOfN(1, Gen.choose(100L, 104L)),
            18000L * trial + round).toSet -- ups.keySet
          rState = (rState ++ ups) -- delIds
          jv.refreshRight(rDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        }
        agg.catchUp()
        val got = agg.multiState
          .select(col("emit_key"), col("min_value").cast("long"),
            col("max_value").cast("long"), col("n_distinct"))
          .as[(String, Long, Long, Long)].collect()
          .map(t => t._1 -> (t._2, t._3, t._4)).toMap
        assert(got === multi(lState, rState),
          s"trial $trial round $round L=$lState R=$rState")
      }
    }
  }

  test("composite-key salted join view equals the recomputed join on adversarial random histories") {
    import graft.engine.JoinView
    // key-part alphabet chosen to stress the escaped spelling: raw
    // separator, raw escape char, and strings that concat_ws would
    // collide across part boundaries
    val partGen = Gen.oneOf("a", "a\u0001", "\u0001a", "b\u0002", "\u0002\u0001", "c")
    val lRowGen = Gen.zip(Gen.choose(1L, 10L), partGen, partGen, Gen.choose(0L, 99L))
    val rRowGen = Gen.zip(Gen.choose(100L, 106L), partGen, partGen,
      Gen.choose(0.0, 9.0).map(x => math.rint(x * 4) / 4))
    def lDf(rows: Map[Long, (String, String, Long)]) =
      rows.toSeq.map { case (k, (j1, j2, v)) => (k, j1, j2, v) }
        .toDF("l_pk", "l_j1", "l_j2", "l_val")
    def rDf(rows: Map[Long, (String, String, Double)]) =
      rows.toSeq.map { case (k, (j1, j2, v)) => (k, j1, j2, v) }
        .toDF("r_pk", "r_j1", "r_j2", "r_val")
    def joined(l: Map[Long, (String, String, Long)],
        r: Map[Long, (String, String, Double)]) =
      (for {
        (lk, (lj1, lj2, lv)) <- l.toSeq
        (rk, (rj1, rj2, rv)) <- r.toSeq if lj1 == rj1 && lj2 == rj2
      } yield (lk, rk, lv, rv)).toSet
    (1 to 2).foreach { trial =>
      val store = graft.engine.BucketedViewStore.temp(spark, 4)
      val jv = new JoinView(store, s"jvck_prop$trial",
        "l_pk", Seq("l_j1", "l_j2"), Seq("l_pk", "l_j1", "l_j2", "l_val"),
        "r_pk", Seq("r_j1", "r_j2"), Seq("r_pk", "r_j1", "r_j2", "r_val"),
        saltBuckets = 3)
      var lState = sample(Gen.listOfN(6, lRowGen), 4400L + trial)
        .map { case (k, j1, j2, v) => k -> (j1, j2, v) }.toMap
      var rState = sample(Gen.listOfN(4, rRowGen), 4500L + trial)
        .map { case (k, j1, j2, v) => k -> (j1, j2, v) }.toMap
      jv.build(lDf(lState), rDf(rState))
      (1 to 3).foreach { round =>
        val leftTurn = (trial + round) % 2 == 0
        if (leftTurn) {
          val ups = sample(Gen.listOfN(3, lRowGen), 5000L * trial + round)
            .map { case (k, j1, j2, v) => k -> (j1, j2, v) }.toMap
          val delIds = sample(Gen.listOfN(2, Gen.choose(1L, 10L)),
            6000L * trial + round).toSet -- ups.keySet
          lState = (lState ++ ups) -- delIds
          jv.refreshLeft(lDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        } else {
          val ups = sample(Gen.listOfN(2, rRowGen), 7000L * trial + round)
            .map { case (k, j1, j2, v) => k -> (j1, j2, v) }.toMap
          val delIds = sample(Gen.listOfN(1, Gen.choose(100L, 106L)),
            8000L * trial + round).toSet -- ups.keySet
          rState = (rState ++ ups) -- delIds
          jv.refreshRight(rDf(ups),
            if (delIds.isEmpty) None
            else Some(delIds.toSeq.toDF("k").select(col("k").cast("string"))))
        }
        val got = jv.df.select("l_pk", "r_pk", "l_val", "r_val")
          .as[(Long, Long, Long, Double)].collect().toSet
        assert(got === joined(lState, rState),
          s"trial $trial round $round L=$lState R=$rState")
      }
    }
  }
}
