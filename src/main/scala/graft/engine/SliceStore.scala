package graft.engine

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The shared TIME-SLICE storage plumbing under the windowed maintained
 * families ([[WindowedAggView]], [[WindowedSketchView]]): one versioned
 * sub-relation per slice (`s<epochSec>` as an ordinary [[ViewStore]] view
 * under `rootDir`), a persisted eviction watermark, the single-job
 * staged-write publish path, and the slice-ALIGNED window arithmetic.
 *
 * The state SCHEMA per slice is the owner's business; this class owns
 * only the layout invariants: slices are keyed by their aligned start
 * second, eviction drops whole slice directories (never rewrites
 * survivors), the watermark is written BEFORE the drops (crash fails
 * closed), and every staged publish clusters by `(slice_start, emit_key)`
 * for file/row-group pruning on the serve predicates.
 */
private[engine] final class SliceStore(
    val spark: SparkSession,
    val rootDir: String,
    val sliceSeconds: Long) extends Serializable {

  require(sliceSeconds > 0, s"sliceSeconds must be positive, got $sliceSeconds")

  /** Per-slice versioned storage — each slice gets the claim/swap/GC
    * contract and grace-version time travel of a normal view. */
  val slices = new ViewStore(spark, rootDir)

  def sliceName(start: Long): String = s"s$start"
  private def watermarkFile: Path = Paths.get(rootDir, "_WATERMARK")

  /** Eviction horizon (epoch seconds): slices starting below it are gone
    * and changes below it are refused. `Long.MinValue` = never evicted. */
  def watermark: Long =
    if (Files.exists(watermarkFile)) Files.readString(watermarkFile).trim.toLong
    else Long.MinValue

  /** Live slice starts (epoch seconds), ascending. */
  def liveSlices: Seq[Long] = {
    val dir = Paths.get(rootDir)
    if (!Files.exists(dir)) Seq.empty
    else {
      val out = Seq.newBuilder[Long]
      val stream = Files.list(dir)
      try stream.iterator().forEachRemaining { p =>
        val n = p.getFileName.toString
        val digits = if (n.startsWith("s-")) n.drop(2) else n.drop(1)
        if (n.startsWith("s") && digits.nonEmpty && digits.forall(_.isDigit) &&
            Files.exists(p.resolve("_LATEST")))
          out += n.drop(1).toLong
      } finally stream.close()
      out.result().sorted
    }
  }

  /** One slice's current state (owner-defined schema, no slice column). */
  def sliceState(start: Long): DataFrame =
    spark.read.parquet(slices.latestPath(sliceName(start)))

  /** Full live state with its `slice_start` column. */
  def state: DataFrame = {
    val live = liveSlices
    require(live.nonEmpty, s"windowed view at $rootDir has no live slices")
    live.map(s0 => sliceState(s0).withColumn("slice_start", lit(s0)))
      .reduce(_.unionByName(_))
  }

  /** The slices covered by the ALIGNED window `[start, end)`, with the
    * shared refusals: sub-slice boundaries and sub-watermark reaches are
    * silent-wrongness bugs, not serveable requests. Returns the covered
    * slice starts plus one live slice to source an empty-result schema. */
  def slicesIn(startSec: Long, endSec: Long): (Seq[Long], Long) = {
    require(startSec % sliceSeconds == 0 && endSec % sliceSeconds == 0,
      s"window [$startSec,$endSec) is not aligned to $sliceSeconds-second slices; " +
        "pre-aggregated slice state cannot answer sub-slice boundaries exactly")
    require(startSec < endSec, s"empty window [$startSec,$endSec)")
    require(startSec >= watermark,
      s"window start $startSec reaches below the eviction watermark ${watermark}; " +
        "those slices are gone and the result would silently under-count")
    val live = liveSlices
    require(live.nonEmpty, s"windowed view at $rootDir has no live slices")
    (live.filter(s0 => s0 >= startSec && s0 < endSec), live.head)
  }

  /** Union of the covered slices' states (empty-but-typed when none). */
  def windowStates(startSec: Long, endSec: Long): DataFrame = {
    val (in, schemaSrc) = slicesIn(startSec, endSec)
    if (in.isEmpty) sliceState(schemaSrc).filter(lit(false))
    else in.map(sliceState).reduce(_.unionByName(_))
  }

  /** Trailing `n`-slice window bounds ending at the newest live slice. */
  def trailingBounds(n: Int): (Long, Long) = {
    require(n > 0, s"trailing window must cover at least one slice, got $n")
    val live = liveSlices
    require(live.nonEmpty, s"windowed view at $rootDir has no live slices")
    val end = live.max + sliceSeconds
    (math.max(end - n.toLong * sliceSeconds, watermark), end)
  }

  /** Advance the watermark to `boundarySec` (aligned, monotone) and drop
    * every slice strictly below it; returns the evicted starts. Watermark
    * first, drops second — a crash between them fails CLOSED. */
  def evictBefore(boundarySec: Long): Seq[Long] = {
    require(boundarySec % sliceSeconds == 0,
      s"eviction boundary $boundarySec is not aligned to $sliceSeconds-second slices")
    require(boundarySec >= watermark,
      s"watermark must advance monotonically: have ${watermark}, got $boundarySec")
    val expired = liveSlices.filter(_ < boundarySec)
    Files.createDirectories(Paths.get(rootDir))
    Files.writeString(watermarkFile, boundarySec.toString)
    expired.foreach(s0 => slices.dropView(sliceName(s0)))
    expired
  }

  /** Refuse changes below the watermark — their old-slice retractions
    * would target dropped state and double-count on replay. */
  def requireAboveWatermark(touched: Seq[Long]): Unit = {
    val wm = watermark
    val late = touched.filter(_ < wm)
    require(late.isEmpty,
      s"change batch touches evicted slices ${late.mkString(",")} below the " +
        s"watermark $wm — their retractions would target dropped state and " +
        "double-count on replay; route late data to a fresh build instead")
  }

  /** Stage every touched slice's new content in ONE Spark job (dynamic
    * `partitionBy` on `slice_start`), then publish each subdir by rename
    * under the per-slice version contract ([[ViewStore.adoptStaged]]). A
    * touched slice with no staged subdir was EMPTIED by the batch — its
    * directory is dropped. `updated` must carry `slice_start, emit_key`
    * plus the owner's state columns. */
  def stageAndPublish(updated: DataFrame, touched: Seq[Long]): Unit = {
    Files.createDirectories(Paths.get(rootDir))
    val staging = Files.createTempDirectory(Paths.get(rootDir), "_staging-")
    try {
      val dataDir = staging.resolve("d")
      updated
        .repartitionByRange(col("slice_start"), col("emit_key"))
        .sortWithinPartitions("slice_start", "emit_key")
        .write.mode("overwrite").option("compression", "zstd")
        .partitionBy("slice_start").parquet(dataDir.toString)
      touched.foreach { s0 =>
        val sub = dataDir.resolve(s"slice_start=$s0")
        if (Files.exists(sub)) slices.adoptStaged(sliceName(s0), sub)
        else slices.dropView(sliceName(s0))
      }
    } finally slices.deleteTree(staging)
  }

  /** Stored-width alignment check for reopen paths: slice widths are
    * layout, not config. */
  def requireAlignedSlices(): Unit = {
    val off = liveSlices.filter(_ % sliceSeconds != 0)
    require(off.isEmpty,
      s"stored slices ${off.take(3).mkString(",")}… are not aligned to " +
        s"$sliceSeconds-second slices — this view was built with a different width")
  }
}
