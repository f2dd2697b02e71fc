package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.BucketedViewStore
import graft.operators.{Components, ComponentsIndex}

/**
 * The incrementally-maintained components labeling (ComponentsIndex) must
 * equal a from-scratch resolution after EVERY change batch — merges
 * (an inserted edge joins two components), splits (a deleted bridge
 * breaks one apart), vanishing nodes (all edges gone → unlabeled), and
 * arbitrary seeded histories of mixed batches.
 */
class ComponentsIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def edgesDf(es: Seq[(Long, Long)]): DataFrame = es.toDF("i", "j")

  private def deltaDf(old: Seq[(Long, Long)], nw: Seq[(Long, Long)]): DataFrame = {
    val del = (old.toSet -- nw.toSet).toSeq.map { case (i, j) => (i, j, "delete") }
    val ins = (nw.toSet -- old.toSet).toSeq.map { case (i, j) => (i, j, "insert") }
    (del ++ ins).toDF("i", "j", "change_type")
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.select(col("doc_id").cast("long"), col("component").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def fresh(name: String): ComponentsIndex =
    new ComponentsIndex(spark, BucketedViewStore.temp(spark, 4), name)

  private def check(ci: ComponentsIndex, nw: Seq[(Long, Long)]): Unit =
    assert(labelsOf(ci.components) === labelsOf(Components.resolve(edgesDf(nw))))

  test("insert merges two components; the merged labeling is exact") {
    val p0 = Seq((1L, 2L), (3L, 4L))
    val p1 = p0 :+ (2L, 3L)
    val ci = fresh("cis_merge")
    ci.build(edgesDf(p0))
    ci.refresh(deltaDf(p0, p1), edgesDf(p1))
    check(ci, p1)
    assert(labelsOf(ci.components) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("deleting a bridge splits a component into two") {
    val p0 = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val p1 = Seq((1L, 2L), (3L, 4L)) // bridge (2,3) gone
    val ci = fresh("cis_split")
    ci.build(edgesDf(p0))
    ci.refresh(deltaDf(p0, p1), edgesDf(p1))
    check(ci, p1)
    assert(labelsOf(ci.components) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("a node losing its every edge drops out of the labeling") {
    val p0 = Seq((1L, 2L), (1L, 5L), (3L, 4L))
    val p1 = Seq((3L, 4L)) // 1, 2, 5 all edgeless now
    val ci = fresh("cis_vanish")
    ci.build(edgesDf(p0))
    ci.refresh(deltaDf(p0, p1), edgesDf(p1))
    check(ci, p1)
    assert(labelsOf(ci.components).keySet === Set(3L, 4L))
  }

  test("gross feed tolerated: delete+insert of an unchanged edge is a no-op") {
    val p0 = Seq((1L, 2L), (3L, 4L), (7L, 8L))
    val ci = fresh("cis_gross")
    ci.build(edgesDf(p0))
    // the pair-graph CDC retracts and reinserts every dirty pair even
    // when its row is unchanged — the labeling must come back identical
    val delta = Seq((1L, 2L, "delete"), (1L, 2L, "insert")).toDF("i", "j", "change_type")
    ci.refresh(delta, edgesDf(p0))
    check(ci, p0)
  }

  test("refresh CDC sidecar replays the old labeling to the new one") {
    val p0 = Seq((1L, 2L), (2L, 3L))
    val p1 = Seq((1L, 2L), (4L, 5L))
    val ci = fresh("cis_cdc")
    ci.build(edgesDf(p0))
    ci.refresh(deltaDf(p0, p1), edgesDf(p1))
    val v0 = ci.componentsAt(0).select("doc_id", "component")
    val feed = ci.changes(0, 1)
    val deletes = feed.filter(col("change_type") === "delete")
      .select("doc_id", "component")
    val inserts = feed.filter(col("change_type") === "insert")
      .select("doc_id", "component")
    val replayed = v0.exceptAll(deletes).unionByName(inserts)
    assert(labelsOf(replayed) === labelsOf(ci.components))
  }

  test("end-to-end chain: components maintained from the REAL pair-graph CDC under random doc histories") {
    import graft.engine.{BucketedAggView, MapIndex}
    import graft.engine.MapIndex.emit
    import graft.operators.PairGraphIndex
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def randText(): String =
      Seq.fill(6 + rnd.nextInt(5))(words(rnd.nextInt(words.size))).mkString(" ")
    // low threshold + tiny vocabulary → a dense, churning pair graph
    val store = BucketedViewStore.temp(spark, 4)
    val g = new PairGraphIndex(spark, store, "pgc_e2e", maxDf = 50, threshold = 0.3)
    val ci = new ComponentsIndex(spark, store, "pgc_e2e")
    // one relation further downstream: the keeper map (component → min
    // member) as a BucketedAggView whose base emits component → doc_id,
    // maintained from the LABELING's CDC — the full chain docs → pairs →
    // labeling → keeper map, every stage off the previous stage's feed
    val keeperIdx = MapIndex.columns("pgc_e2e_keeper")(
      col("doc_id").cast("string"),
      array(emit(col("component").cast("string"), col("doc_id"))))
    var corpus = (1L to 20L).map(id => id -> randText()).toMap
    g.build(corpus.toSeq.toDF("doc_id", "text"))
    ci.build(g.pairs)
    val kv = BucketedAggView.build(store, keeperIdx, ci.components, "pgc_e2e_keeper_state")
    (1 to 3).foreach { _ =>
      val upIds = corpus.keys.filter(_ => rnd.nextDouble() < 0.3).toSeq
      val newIds = Seq(corpus.keys.max + 1, corpus.keys.max + 2)
      val delIds = (corpus.keys.filter(_ => rnd.nextDouble() < 0.15).toSet -- upIds).toSeq
      val ups = (upIds ++ newIds).map(id => id -> randText())
      corpus = (corpus -- delIds) ++ ups
      val v0 = g.pairsVersion
      g.refresh(ups.toDF("doc_id", "text"),
        Some(delIds.toDF("doc_id")))
      val e0 = ci.epoch
      ci.refresh(g.pairsChanges(v0, g.pairsVersion), g.pairs)
      // the maintained labeling must equal a from-scratch resolution of
      // the maintained pair relation — this pins the CDC contract BETWEEN
      // the two classes, not just each class against synthetic inputs
      assert(labelsOf(ci.components) ===
        labelsOf(Components.resolve(g.pairs.select("i", "j"))))
      // keeper stage: catch up from the labeling's own CDC and require
      // the state to equal a from-scratch keeper recompute (component =
      // min member, cnt = cluster size) — the third stage of the chain
      val delta = ci.changes(e0, ci.epoch)
      val kUps = delta.filter(col("change_type") === "insert")
        .select("doc_id", "component")
      val kDels = delta.select(col("doc_id").cast("string").as("src_key")).distinct()
      kv.refresh(keeperIdx, kUps, Some(kDels))
      val gotKeepers = kv.state
        .select(col("emit_key").cast("long"), col("min_value").cast("long"),
          col("cnt").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val wantKeepers = ci.components.groupBy("component")
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotKeepers === wantKeepers)
    }
  }

  test("a small change batch rewrites only touched buckets of pairs and labeling") {
    import graft.operators.PairGraphIndex
    // 20 two-doc clusters with disjoint vocabularies: docs (2k, 2k+1)
    // share a unique text, so the base pair set is exactly those 20 pairs
    // and their emissions spread across the 16 emit buckets
    val g = new PairGraphIndex(spark, BucketedViewStore.temp(spark, 16),
      "pg_bstats", maxDf = 1000, threshold = 0.5)
    val corpus = (0L until 40L).map { id =>
      val k = id / 2
      (id, s"w${k}a w${k}b w${k}c w${k}d w${k}e")
    }
    g.build(corpus.toDF("doc_id", "text"))
    val ci = new ComponentsIndex(spark, BucketedViewStore.temp(spark, 16), "pg_bstats")
    ci.build(g.pairs)
    assert(g.pairs.count() === 20)
    // rewrite ONE doc to an unrelated text: pair (0,1) retracts, nothing
    // else changes — the dirty region is docs {0, 1} and the refresh I/O
    // must stay inside their buckets (the O(delta) claim of the
    // dual-keyed pair layout and the d:/c:-keyed labeling; the flat
    // layout this replaced rewrote the ENTIRE relation here)
    val v0 = g.pairsVersion
    val stats = g.refresh(Seq((0L, "zz yy xx ww vv")).toDF("doc_id", "text"), None)
    assert(stats.emitBucketsRewritten > 0)
    assert(stats.emitBucketsRewritten < stats.totalBuckets,
      s"pair refresh must not rewrite the whole pair view: $stats")
    val cstats = ci.refresh(g.pairsChanges(v0, g.pairsVersion), g.incidentPairs _)
    assert(cstats.emitBucketsRewritten > 0)
    assert(cstats.emitBucketsRewritten < cstats.totalBuckets,
      s"labeling refresh must not rewrite the whole labeling: $cstats")
    // and the maintained state is still exact after the pruned rewrite
    assert(g.pairs.count() === 19)
    assert(labelsOf(ci.components) ===
      labelsOf(Components.resolve(g.pairs.select("i", "j"))))
  }

  test("seeded random histories: maintained labeling equals from-scratch after every batch") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val nodes = 16
      def randomEdges(): Seq[(Long, Long)] = {
        val es = for {
          i <- 0 until nodes; j <- (i + 1) until nodes
          if rnd.nextDouble() < 0.12
        } yield (i.toLong, j.toLong)
        es
      }
      var cur = randomEdges()
      val ci = fresh(s"cis_rand_$trial")
      ci.build(edgesDf(cur))
      check(ci, cur)
      (1 to 3).foreach { _ =>
        // mutate: drop ~1/3 of current edges, add a fresh random set
        val kept = cur.filter(_ => rnd.nextDouble() > 0.33)
        val nw = (kept ++ randomEdges().filter(_ => rnd.nextDouble() < 0.5)).distinct
        ci.refresh(deltaDf(cur, nw), edgesDf(nw))
        check(ci, nw)
        cur = nw
      }
    }
  }
}
