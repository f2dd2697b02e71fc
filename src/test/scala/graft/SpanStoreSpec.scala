package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{MapIndex, ViewStore, Views}
import graft.engine.MapIndex.emit

/** The hash-keyed span-store contract: stored window state is keyed by
  * the 64-bit window hash (16-char hex), never the window text — a
  * text-keyed store holds ~SpanW× the corpus bytes (every token appears
  * in SpanW stored keys), which is the difference between a maintained
  * index and a stored copy of the corpus times eight at 100 TB. */
class SpanStoreSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val SpanW = 8

  private def dirBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    val stream = java.nio.file.Files.walk(root)
    try stream.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally stream.close()
  }

  test("stored span views carry hash keys, not window text") {
    // building any span consumer materializes the stored views
    SparkEntry.queries("dedup_substring_removal")(spark, sf).collect()
    val store = Views.store(spark, sf)
    val keys = spark.read.parquet(store.latestPath("doc_spanwins"))
      .select(col("emit_key")).agg(
        max(length(col("emit_key"))).as("maxlen"),
        count(lit(1)).as("n")).head()
    assert(keys.getLong(1) > 0, "span view must hold emissions")
    // 8 hashed bytes; an 8-token window text key is several times
    // longer (>= 2*SpanW - 1 even for 1-char tokens)
    assert(keys.getInt(0) <= 8,
      s"span keys must be the 64-bit hash, saw max length ${keys.getInt(0)}")
  }

  test("hash keys shrink the stored span state vs text keys") {
    val d = graft.engine.Tables.documents(spark, sf).select("doc_id", "text")
    val toks = split(lower(col("text")), " ")
    def emitsWith(keyType: String, key: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      when(size(toks) >= SpanW,
        transform(sequence(lit(1), size(toks) - lit(SpanW - 1)),
          p => emit(key(array_join(slice(toks, p, lit(SpanW)), " ")),
            struct(col("doc_id"), p.as("pos")))))
        .otherwise(array().cast(
          s"array<struct<emit_key:$keyType,emit_value:struct<doc_id:bigint,pos:int>>>"))
    val textIdx = MapIndex.columns("span_text_keys")(
      col("doc_id").cast("string"), emitsWith("string", identity))
    val hashIdx = MapIndex.columns("span_hash_keys")(
      col("doc_id").cast("string"),
      emitsWith("binary", w => unhex(lpad(hex(xxhash64(w)), 16, "0"))))
    val st = ViewStore.temp(spark)
    textIdx.materialize(d, st)
    hashIdx.materialize(d, st)
    // the scale claim is about LOGICAL key bytes — what maintenance
    // shuffles, joins hash, and memory holds: ~SpanW·avg_token_len per
    // window text vs a flat 8. (On-disk parquet understates the gap:
    // keys are CLUSTERED, so sorted text keys share long prefixes and
    // dictionary/RLE-code extremely well.)
    val logical = { (n: String) =>
      spark.read.parquet(st.latestPath(n))
        .agg(sum(length(col("emit_key")))).head().getLong(0) }
    val textKeyB = logical("span_text_keys")
    val hashKeyB = logical("span_hash_keys")
    assert(hashKeyB.toDouble <= textKeyB / 4.0,
      s"hash keys must carry >=4x fewer logical bytes: $hashKeyB vs $textKeyB")
    // and the on-disk footprint must at least not grow
    val textBytes = dirBytes(st.latestPath("span_text_keys"))
    val hashBytes = dirBytes(st.latestPath("span_hash_keys"))
    assert(hashBytes.toDouble <= textBytes * 1.0,
      s"hash-keyed span state must not be larger on disk: $hashBytes vs $textBytes bytes")
  }
}
