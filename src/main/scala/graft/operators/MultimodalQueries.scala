package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Deterministic stand-in for a media decoder output. */
final case class MediaFeatures(
    doc_id: Long, n_bytes: Long, checksum: String,
    channels: Int, width: Int, height: Int)

/**
 * Multimodal-column plumbing: media payloads are opaque `binary` columns
 * with typed metadata; decode/feature-extraction runs per partition over
 * the raw bytes. Two codecs share the shape (binary column, typed
 * `Dataset` output, `mapPartitions` batching, per-partition codec init):
 * [[MultimodalQueries.decodePng]] is a REAL JDK-only image decoder
 * (javax.imageio), exercised by the spec over generated PNG fixtures;
 * [[MultimodalQueries.decodeStub]] is the deterministic md5-derived
 * variant the driver-facing queries use, because the synthetic
 * `documents` payloads are text, not images, and the DuckDB oracle must
 * be able to recompute the features from SQL.
 *
 * Scale note: `mapPartitions` (not `map`) so a real decoder initializes
 * once per partition, and the binary payload column is projected alone —
 * the scan never materializes unrelated columns next to multi-MB blobs.
 */
object MultimodalQueries {

  /** REAL JDK-only codec: decode an image payload (PNG/GIF/BMP — whatever
    * javax.imageio recognizes) into its actual dimensions and channel
    * count. `None` for undecodable payloads — a production pipeline
    * routes those to quarantine rather than failing the batch. ImageIO's
    * reader is stateful, so like any real codec it is constructed per
    * PARTITION by the caller, never per row. */
  def decodePng(docId: Long, payload: Array[Byte], md: MessageDigest): Option[MediaFeatures] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    Option(img).map { i =>
      MediaFeatures(
        doc_id = docId,
        n_bytes = payload.length.toLong,
        checksum = md.digest(payload).map("%02x".format(_)).mkString,
        channels = i.getColorModel.getNumComponents,
        width = i.getWidth,
        height = i.getHeight)
    }
  }

  /** The real-codec pipeline over a `(doc_id, payload)` binary relation:
    * identical distributed shape to `multimodal_features` (payload column
    * projected alone, per-partition codec init, typed output), with
    * undecodable rows dropped. Spec-gated on generated PNG fixtures of
    * known dimensions and channel counts. */
  def decodeImages(s: SparkSession, payloads: DataFrame): DataFrame = {
    import s.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5") // per-partition codec init
        it.flatMap { case (id, bytes) => decodePng(id, bytes, md) }
      }
      .toDF()
  }

  /** Deterministic md5-derived stand-in with the same signature class as
    * [[decodePng]]: used by the DRIVER-facing queries because their
    * payloads are synthetic text and the DuckDB oracle recomputes the
    * features in SQL. The real codec above is the non-stub path. */
  def decodeStub(docId: Long, payload: Array[Byte], md: MessageDigest): MediaFeatures = {
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    MediaFeatures(
      doc_id = docId,
      n_bytes = payload.length.toLong,
      checksum = hex,
      channels = (hex.charAt(0).toInt % 3) + 1,
      width = 64 + (hex.charAt(1).toInt % 8) * 16,
      height = 64 + (hex.charAt(2).toInt % 8) * 16)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5") // per-partition codec init
          it.map { case (id, bytes) => decodeStub(id, bytes, md) }
        }
        .toDF()
        .orderBy("doc_id")
    }),

    // frame sampling: treat the payload as a media container, cut 64-char
    // frames at a 256-char stride (every 4th frame), per-frame "decode"
    // (stub md5) in mapPartitions, then per-doc aggregation — the shape a
    // video pipeline uses (frame explode → batched decode → reduce), with
    // only the codec call stubbed
    "multimodal_frames" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text").as("payload"), length(col("text")).as("len"))
        .filter(col("len") >= 64)
        .select(col("doc_id"), col("payload"),
          explode(sequence(lit(0L), floor((col("len") - 64) / 256).cast("long"))).as("f"))
        .select(col("doc_id"), col("f"),
          expr("substring(payload, CAST(f * 256 + 1 AS INT), 64)").as("frame"))
        .as[(Long, Long, String)]
        .mapPartitions { it =>
          val md = MessageDigest.getInstance("MD5") // per-partition codec init
          it.map { case (id, f, frame) =>
            (id, f, md.digest(frame.getBytes("UTF-8")).map("%02x".format(_)).mkString)
          }
        }
        .toDF("doc_id", "f", "fh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"), min("fh").as("min_fh"), max("fh").as("max_fh"))
        .orderBy("doc_id")
    }),
  )

  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """SELECT doc_id,
        |       strlen(text) AS n_bytes,
        |       md5(text) AS checksum,
        |       (ascii(substr(md5(text), 1, 1)) % 3) + 1 AS channels,
        |       64 + (ascii(substr(md5(text), 2, 1)) % 8) * 16 AS width,
        |       64 + (ascii(substr(md5(text), 3, 1)) % 8) * 16 AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, md5(substr(text, CAST(i * 256 + 1 AS INT), 64)) AS fh
        |  FROM documents,
        |       UNNEST(range(CAST(floor((length(text) - 64) / 256) + 1 AS BIGINT))) AS u(i)
        |  WHERE length(text) >= 64)
        |SELECT doc_id, count(*) AS n_frames, min(fh) AS min_fh, max(fh) AS max_fh
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
