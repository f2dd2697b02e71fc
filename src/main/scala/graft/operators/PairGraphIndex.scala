package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{BucketedViewStore, MapIndex}
import graft.engine.BucketedViewStore.RefreshStats
import graft.engine.MapIndex.emit
import graft.functions.Hashes

/**
 * EXACT incremental maintenance of the n-gram-Jaccard near-dup pair graph
 * — the engine's compute-on-write thesis (SURVEY §4.1) applied to the
 * most expensive relation a curation pipeline owns. A document change
 * batch updates the STORED pair graph in O(delta · df) work instead of
 * re-deriving shingle→posting→pair over the whole corpus, and the result
 * is byte-identical to a from-scratch rebuild over the post-batch corpus
 * (driver-gated by `dedup_pairs_incremental` against the same SQL oracle
 * as the batch derivation).
 *
 * State (all engine-maintained, all bucketed — partition-scoped refresh):
 *   - `<name>_sh`: shingle posting index, a bucketed map view
 *     `shingle → doc_id` (delete-then-insert per changed doc, touched
 *     buckets only; its CDC sidecar IS the delta this class consumes),
 *   - `<name>_docs`: doc text as a bucketed map view `doc_id → text`
 *     (dirty texts are fetched from here, bucket-pruned),
 *   - `<name>_sizes`: per-doc live-shingle counts, bucketed likewise,
 *   - `<name>_pairs`: the pair relation `(i, j, score)` as a DUAL-KEYED
 *     bucketed map view — see [[pairsIdx]].
 *
 * Exactness argument. `inter(i,j)` counts shingles shared by i and j that
 * are LIVE (document frequency ≤ [[maxDf]]); `n_i` counts i's live
 * shingles. A change batch can affect a pair only through (a) a changed
 * document on either side, or (b) a shared shingle whose CAP MEMBERSHIP
 * flips — df drifting while staying on one side of the cap changes
 * nothing, because only membership couples documents globally. So the
 * DIRTY set = changed docs ∪ current members of every posting list that
 * crossed the cap (either direction); every pair touching a dirty doc is
 * recomputed from the maintained index, every clean-clean pair and clean
 * size is provably unchanged and untouched on disk. Crossings are
 * detected from the refresh's own CDC delta: old df = new df − inserts +
 * deletes per touched shingle, with new df read from the index via the
 * bucket-pruned [[BucketedViewStore.getAll]].
 *
 * Scale shape: the posting-index refresh touches only the changed keys'
 * buckets; dirty-pair recomputation reads only the dirty docs' shingle
 * keys (bucket-pruned batch lookup) and joins posting lists bounded by
 * the df cap — O(dirty · df) candidate rows. SIZES and TEXT are bucketed
 * map views keyed by doc_id: maintenance is delete-then-insert for the
 * dirty docs (touched buckets only), and the refresh never consults the
 * source corpus at all. The PAIR relation is dual-keyed (each pair
 * emitted under both endpoints, owned by one `i:j` source key), so
 * retraction-by-either-endpoint is the store's ordinary partition-scoped
 * delete-then-insert: total refresh I/O is proportional to the dirty
 * endpoints' buckets, never to |pairs| — the flat-store O(|pairs|)
 * snapshot rewrite this layout replaces is gone.
 */
final class PairGraphIndex(
    val spark: SparkSession,
    /** every relation the graph owns lives here — postings, docs, sizes,
      * and the dual-keyed pair view (bucketed, partition-scoped refresh) */
    val store: BucketedViewStore,
    val name: String,
    val maxDf: Int = 1000,
    val threshold: Double = 0.5,
    /** key extractor over `text` — any expression yielding `array<long>`
      * with SET semantics per document (`shingle_hashes` for token
      * shingles, `winnow_hashes` for rolling-hash fingerprints, …); the
      * maintenance machinery is agnostic to what the keys mean, because
      * the exactness argument only uses set membership and the df cap. */
    val keysExpr: String = "shingle_hashes(text)",
    /** similarity from `(inter, n_i, n_j)`: Jaccard (default) or
      * containment overlap `inter / min(n_i, n_j)` — winnowing's measure. */
    val containment: Boolean = false,
    /** output score column name, matching the measure. */
    val scoreCol: String = "jaccard") {

  /** doc_id → one emission per distinct key hash (set semantics —
    * the key extractors dedupe within a document). */
  private[operators] val shingleIdx = MapIndex.columns(s"${name}_sh")(
    col("doc_id").cast("string"),
    transform(expr(keysExpr), h => emit(h, col("doc_id"))))

  val pairsName = s"${name}_pairs"
  private val sizesName = s"${name}_sizes"

  /** Sizes as a bucketed map view `doc_id → n`, so refreshing dirty docs
    * touches only their buckets and lookups are bucket-pruned. */
  private val sizesIdx = MapIndex.columns(sizesName)(
    col("doc_id").cast("string"),
    array(emit(col("doc_id"), col("n"))))

  /** Document text as a map view `doc_id → text`: the refresh's only
    * text source, read bucket-pruned for the dirty ids. */
  private val docsIdx = MapIndex.columns(s"${name}_docs")(
    col("doc_id").cast("string"),
    array(emit(col("doc_id"), col("text"))))

  /** The pair relation as a DUAL-KEYED bucketed map view. Source key =
    * the canonical pair id `i:j` (a pair is owned by exactly one source
    * key); emissions = the full `(i, j, score)` row under BOTH endpoint
    * keys. The two sides buy the two accesses a maintained graph needs:
    *   - retract-by-either-endpoint: deleting source key `i:j` removes
    *     both mirror rows through the store's meta back-pointers —
    *     rewriting only the two endpoints' buckets, which is what makes
    *     refresh I/O O(delta) instead of the flat store's O(|pairs|)
    *     snapshot rewrite;
    *   - incident-edge lookup ([[incidentPairs]]): every pair touching a
    *     doc set is a bucket-pruned [[BucketedViewStore.getAll]] on the
    *     endpoint keys — the read [[ComponentsIndex.refresh]] uses to
    *     collect its dirty-region edges without scanning the pair set.
    * The mirror invariant (both sides project the identical pair
    * relation) is structural — one source row produces both emissions
    * atomically — and property-tested over random change histories. */
  private[operators] val pairsIdx = MapIndex.columns(pairsName)(
    concat_ws(":", col("i"), col("j")),
    array(
      emit(col("i").cast("string"),
        struct(col("i"), col("j"), col(scoreCol).as("score"))),
      emit(col("j").cast("string"),
        struct(col("i"), col("j"), col(scoreCol).as("score")))))

  /** One row per pair from the dual-keyed emissions: keep the i-major
    * mirror (emit_key = i side). */
  private def primary(rows: DataFrame): DataFrame =
    rows.filter(col("emit_key") === col("emit_value.i").cast("string"))
      .select(col("emit_value.i").as("i"), col("emit_value.j").as("j"),
        col("emit_value.score").as(scoreCol))

  /** Whether [[build]] has run (the streaming wrapper bootstraps on the
    * first micro-batch). */
  def isBuilt: Boolean = store.manifest(pairsName).nonEmpty

  /** The maintained pair relation `(i, j, score)`. */
  def pairs: DataFrame = primary(store.df(pairsName))

  /** Current refresh epoch of the stored pair relation (0 = [[build]]). */
  def pairsVersion: Int = store.epoch(pairsName)

  /** The pair relation as of a retained `version` (time travel). */
  def pairsAt(version: Int): DataFrame = primary(store.dfAsOf(pairsName, version))

  /** EDGE-level CDC: the retracted (`delete`) and written (`insert`)
    * pairs of every refresh in `(from, to]` — each refresh's pair delta
    * is the store's own CDC sidecar, so downstream consumers of the pair
    * graph (e.g. [[ComponentsIndex]]) maintain THEIR state from an
    * O(delta) read instead of diffing pair snapshots. */
  def pairsChanges(fromVersion: Int, toVersion: Int): DataFrame =
    store.changesBetween(pairsName, fromVersion, toVersion)
      .filter(col("emit_key") === col("emit_value.i").cast("string"))
      .select(col("emit_value.i").as("i"), col("emit_value.j").as("j"),
        col("emit_value.score").as(scoreCol),
        col("change_type"), col("change_version"))

  /** Every stored pair incident to a doc in `ids` (single column, any
    * name) — a bucket-pruned endpoint read, the dual-keyed layout's
    * payoff for consumers that need a dirty region's edges without
    * scanning the pair relation. */
  def incidentPairs(ids: DataFrame): DataFrame =
    store.getAll(pairsName,
        ids.select(col(ids.columns.head).cast("string")))
      .select(col("emit_value.i").as("i"), col("emit_value.j").as("j"),
        col("emit_value.score").as(scoreCol))
      .distinct()

  /** The maintained per-doc live-shingle counts `(doc_id, n)`. */
  def sizes: DataFrame = store.df(sizesName)
    .select(col("emit_key").cast("long").as("doc_id"),
      col("emit_value").cast("long").as("n"))

  /** Full build: materialize the posting index, then derive pairs and
    * sizes from the STORED postings (one aggregation — the corpus is
    * shingled exactly once, at index-write time). Rebuilding over an
    * existing graph goes through [[BucketedViewStore.materialize]]'s
    * rebuild path: the pair sidecar is a full retraction of the prior
    * snapshot plus inserts of the new one, so a CDC replay range
    * spanning the rebuild never double-counts (the store's rebuild
    * convention, which the previous flat layout's insert-only build
    * sidecar violated). */
  def build(corpus: DataFrame): Unit = {
    Hashes.register(spark)
    val docs = corpus.select(col("doc_id").cast("long"), col("text"))
    store.materialize(docsIdx, docs)
    store.materialize(shingleIdx, docs)
    val postings = store.df(shingleIdx.name)
      .select(col("emit_key").as("sh"), col("emit_value").as("doc"))
    val lists = postings.groupBy("sh").agg(collect_list(col("doc")).as("docs"))
      .filter(size(col("docs")) <= maxDf)
    val sz = lists.select(explode(col("docs")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = lists
      .select(explode(col("docs")).as("i"), col("docs"))
      .select(col("i"), explode(col("docs")).as("j"))
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    store.materialize(sizesIdx, sz)
    store.materialize(pairsIdx, jaccardJoin(inter, sizes))
  }

  /**
   * Apply one document change batch (upserts + deletes). Exact per the
   * class doc; no corpus relation is consulted — dirty texts come from
   * the maintained doc view. Returns the PAIR view's refresh stats (how
   * many of its buckets the batch actually rewrote — the partition-scoped
   * I/O claim, spec-asserted).
   */
  def refresh(upserts: DataFrame,
      deleteIds: Option[DataFrame] = None): RefreshStats = {
    Hashes.register(spark)
    val ups = upserts.select(col("doc_id").cast("long"), col("text"))
    val dels = deleteIds.map(_.select(col("doc_id").cast("long")))
    val delKeys = dels.map(_.select(col("doc_id").cast("string").as("src_key")))
    // 1. the ENGINE maintains the doc-text and posting indexes; the
    //    posting CDC sidecar is the shingle-level delta everything below
    //    derives from
    store.refresh(docsIdx, ups, delKeys)
    store.refresh(shingleIdx, ups, delKeys)
    val e = store.epoch(shingleIdx.name)
    val delta = store.changesBetween(shingleIdx.name, e - 1, e)
    // 2. cap crossings among touched shingles: old df = new df - ins + del
    val touched = delta.groupBy(col("emit_key")).agg(
      sum(when(col("change_type") === "insert", 1L).otherwise(0L)).as("ins"),
      sum(when(col("change_type") === "delete", 1L).otherwise(0L)).as("del"))
    val newDf = store.getAll(shingleIdx.name, touched.select("emit_key"))
      .groupBy(col("emit_key")).agg(count(lit(1)).as("new_df"))
    val crossing = touched
      .join(newDf, Seq("emit_key"), "left_outer")
      .withColumn("new_df", coalesce(col("new_df"), lit(0L)))
      .withColumn("old_df", col("new_df") - col("ins") + col("del"))
      .filter((col("old_df") <= maxDf) =!= (col("new_df") <= maxDf))
      .select("emit_key")
    // 3. dirty docs = changed ids ∪ current members of crossing lists
    val changedIds = ups.select("doc_id")
      .unionByName(dels.getOrElse(ups.select("doc_id").limit(0))).distinct()
    val crossingDocs = store.getAll(shingleIdx.name, crossing)
      .select(col("emit_value").as("doc_id")).distinct()
    val dirty = changedIds.unionByName(crossingDocs).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var inter: DataFrame = null
    try {
      // 4. dirty docs' shingle sets — text fetched bucket-pruned from the
      //    maintained doc view (deleted ids are simply absent) — and the
      //    CURRENT df of every shingle they touch, from the posting index
      val ds = store.getAll(docsIdx.name, dirty.select(col("doc_id").as("emit_key")))
        .select(col("emit_key").cast("long").as("doc_id"),
          col("emit_value").as("text"))
        .select(col("doc_id"), explode(expr(keysExpr)).as("sh"))
      val lists = store.getAll(shingleIdx.name, ds.select(col("sh").as("emit_key")).distinct())
        .select(col("emit_key").as("sh"), col("emit_value").as("other"))
      val liveKeys = lists.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("sh")
      val listsLive = lists.join(liveKeys, Seq("sh"), "left_semi")
      // 5. dirty sizes: live shingles per dirty doc — then maintain the
      //    sizes VIEW: delete-then-insert for every dirty doc (deleted
      //    docs tombstone out), touching only the dirty docs' buckets.
      //    Clean rows are untouched on disk — provably unchanged, since
      //    any doc whose shingle crossed the cap is dirty by construction
      val dirtySizes = ds.join(liveKeys, Seq("sh"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
      store.refresh(sizesIdx, dirtySizes,
        Some(dirty.select(col("doc_id").cast("string").as("src_key"))))
      // 6. dirty-pair intersections. distinct on (i, j, sh) BEFORE the
      //    count: a dirty-dirty pair reaches here from both sides' rows,
      //    and counting the canonicalized duplicates would double inter
      inter = ds.join(listsLive, Seq("sh"))
        .filter(col("other") =!= col("doc_id"))
        .select(least(col("doc_id"), col("other")).as("i"),
          greatest(col("doc_id"), col("other")).as("j"), col("sh"))
        .distinct()
        .groupBy("i", "j").agg(count(lit(1)).as("inter"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // 7. sizes for the jaccard join: exactly the candidate endpoints,
      //    read bucket-pruned from the just-refreshed sizes view
      val candIds = inter.select(col("i").as("emit_key"))
        .unionByName(inter.select(col("j").as("emit_key"))).distinct()
      val candSizes = store.getAll(sizesName, candIds)
        .select(col("emit_key").cast("long").as("doc_id"),
          col("emit_value").cast("long").as("n"))
      // 8. pair view refresh, dual-keyed: every stored pair incident to a
      //    dirty doc retracts (its `i:j` source key deletes — the meta
      //    back-pointers remove both mirror rows), every recomputed dirty
      //    pair inserts. The store's own sidecar IS the edge-level CDC
      //    (gross feed — an unchanged dirty pair appears as delete+insert
      //    of the same row), and the rewrite touches only the dirty
      //    endpoints' buckets: clean-clean pairs are never read or
      //    rewritten. Any recomputed pair has a dirty endpoint, so its
      //    prior version (if any) is always in the retraction set.
      val retractKeys = store.getAll(pairsName,
          dirty.select(col("doc_id").cast("string")))
        .select("src_key").distinct()
      store.refresh(pairsIdx, jaccardJoin(inter, candSizes), Some(retractKeys))
    } finally {
      if (inter != null) inter.unpersist(blocking = false)
      dirty.unpersist(blocking = false)
      ()
    }
  }

  private def jaccardJoin(inter: DataFrame, sz: DataFrame): DataFrame = {
    val joined = inter
      .join(sz.select(col("doc_id").as("i"), col("n").as("n_i")), Seq("i"))
      .join(sz.select(col("doc_id").as("j"), col("n").as("n_j")), Seq("j"))
    val denom =
      if (containment) least(col("n_i"), col("n_j"))
      else col("n_i") + col("n_j") - col("inter")
    joined
      .withColumn(scoreCol, round(col("inter").cast("double") / denom, 6))
      .filter(col(scoreCol) >= threshold)
      .select(col("i"), col("j"), col(scoreCol))
  }
}
