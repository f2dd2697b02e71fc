package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Document-fingerprint hash expressions for near-duplicate detection.
 *
 * Native Catalyst expressions (not Scala UDFs): evaluated directly on
 * UTF8String without Row boxing; registered in the session function
 * registry so they are usable from both the Column API (`expr("…")`) and
 * SQL. CodegenFallback is acceptable here — each evaluates once per
 * document (not per token/pair), so the interpreted call is not the hot
 * path at scale; the downstream band-join dominates.
 */
object Hashes {

  /** 64-bit FNV-1a over a token's bytes — deterministic across JVMs
    * (unlike String.hashCode's 32 bits; no seed dependence). */
  private[functions] def tokenHash(s: UTF8String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val b = s.getBytes
    while (i < until) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 — derives the per-permutation mix constants for minhash
    * and the pseudo-random hyperplanes for ANN LSH. */
  private[graft] def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Single-space tokenization over the raw bytes, INCLUDING empty tokens
    * between consecutive separators — exactly `split(text, ' ')` / DuckDB
    * `string_split` semantics. Keeping empties is what makes a 3-token
    * byte-span hash identical to hashing `t[i] || ' ' || t[i+1] || ' ' ||
    * t[i+2]` for ANY spacing (the span includes the separators), so the
    * shingle measures here agree with the SQL oracles even on
    * multi-space text. */
  private def foreachToken(s: UTF8String)(f: (Int, Int) => Unit): Unit = {
    val b = s.getBytes
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        f(start, i) // empty token (start == i) included, like split(' ')
        start = i + 1
      }
      i += 1
    }
  }

  /**
   * shingle_hashes(text): the DISTINCT 64-bit FNV hashes of the document's
   * 3-token shingles, one pass over the bytes. This replaces the
   * string-shingle route (`transform(sequence, i => concat_ws(element_at…))`)
   * in hot paths: higher-order functions are not codegen'd and re-evaluate
   * the captured token-split per lambda step — ~3×shingles regex splits per
   * document, interpreted. Here tokenization happens once and no shingle
   * string is ever materialized; downstream Jaccard math is identical
   * because only set membership matters (a 64-bit collision across a
   * corpus's shingles is ~1e-8). Hash = FNV over the token span INCLUDING
   * separators — the same shingle identity MinHashSig banding uses, so the
   * exact verify measures exactly what the signatures approximate.
   */
  case class ShingleHashes(child: Expression, n: Int = 3)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
      val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
      foreachToken(s) { (from, until) => starts += from; ends += until }
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i + n - 1 < starts.length) {
        val h = tokenHash(s, starts(i), ends(i + n - 1))
        if (seen.add(h)) out += h
        i += 1
      }
      ArrayData.toArrayData(out.toArray)
    }
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
    override def prettyName: String = "shingle_hashes"
  }

  /**
   * simhash64(text): 64-bit SimHash over whitespace tokens — each token
   * hash votes ±1 per bit position; the sign of each counter becomes the
   * output bit. Near-duplicate texts differ in few bits (small hamming
   * distance), so banding on bit ranges finds candidates without a
   * pairwise pass.
   */
  case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val acc = new Array[Int](64)
      foreachToken(s) { (from, until) =>
        val h = tokenHash(s, from, until)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      var out = 0L
      var i = 0
      while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
    override def prettyName: String = "simhash64"
  }

  /**
   * minhash_sig(text): 64-element MinHash signature over the document's
   * 3-token shingles — the same granularity the exact n-gram Jaccard
   * operator uses, so band collisions approximate *that* similarity.
   * (Unigram token sets are useless here: documents drawing from a small
   * vocabulary share nearly all tokens, so every pair would collide.)
   * Permutation j is `splitmix64(h ^ c_j)`; fixed-width bands of the
   * signature are the LSH bucket keys.
   */
  case class MinHashSig(child: Expression, k: Int = 64)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val mixConsts: Array[Long] =
      Array.tabulate(k)(j => splitmix64(0x5851f42d4c957f2dL + j))
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      // token boundaries, then hash each 3-token window's byte span (the
      // span includes the separators, so it equals the joined shingle
      // string for any spacing — see foreachToken)
      val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
      val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
      foreachToken(s) { (from, until) => starts += from; ends += until }
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i + 2 < starts.length) {
        val h = tokenHash(s, starts(i), ends(i + 2))
        var j = 0
        while (j < k) {
          val hj = splitmix64(h ^ mixConsts(j))
          if (hj < sig(j)) sig(j) = hj
          j += 1
        }
        i += 1
      }
      ArrayData.toArrayData(sig)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
    override def prettyName: String = "minhash_sig"
  }

  /**
   * minhash_bands(text): the 16 LSH band keys (FNV over each 4-element
   * signature slice) computed in ONE evaluation. Deriving bands from a
   * `minhash_sig` column in a later projection is a trap: Catalyst
   * collapses projects and higher-order functions re-evaluate captured
   * subtrees per element, so the full signature gets recomputed once per
   * band (16× the hashing). One expression + one `posexplode` avoids it.
   */
  case class MinHashBands(child: Expression, bands: Int = 16, rowsPerBand: Int = 4)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val sigExpr = MinHashSig(child, bands * rowsPerBand)
    override def nullSafeEval(input: Any): Any = {
      val sig = sigExpr.nullSafeEval(input).asInstanceOf[ArrayData].toLongArray()
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 0xcbf29ce484222325L
        var r = 0
        while (r < rowsPerBand) {
          h ^= sig(b * rowsPerBand + r); h *= 0x100000001b3L
          r += 1
        }
        out(b) = h
        b += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashBands =
      copy(child = newChild)
    override def prettyName: String = "minhash_bands"
  }

  /**
   * winnow_hashes(text): winnowing document fingerprints (Schleimer et al.,
   * the MOSS scheme): rolling polynomial hash over every k-byte character
   * gram, then the minimum hash of each w-gram window — guarantees any
   * shared substring of length ≥ w+k-1 contributes a shared fingerprint,
   * while keeping ~2/(w+1) of the grams. Output is the distinct selected
   * hashes; docs shorter than k bytes fingerprint to an empty set.
   *
   * k=16/w=32 targets copy-paste overlap (shared runs of ≥ 47 bytes):
   * short grams on templated corpora are near-universal (a df explosion
   * in the posting lists), while 47-byte runs only recur in genuine
   * copied passages.
   */
  case class WinnowHashes(child: Expression, k: Int = 16, w: Int = 32)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[UTF8String].getBytes
      if (b.length < k) return ArrayData.toArrayData(Array.empty[Long])
      val n = b.length - k + 1
      val hs = new Array[Long](n)
      val base = 1000003L
      var pow = 1L
      var i = 1
      while (i < k) { pow *= base; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = h * base + (b(i) & 0xff); i += 1 }
      hs(0) = splitmix64(h)
      i = 1
      while (i < n) {
        h = (h - (b(i - 1) & 0xff) * pow) * base + (b(i + k - 1) & 0xff)
        hs(i) = splitmix64(h)
        i += 1
      }
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      val windows = math.max(1, n - w + 1)
      var start = 0
      while (start < windows) {
        var m = hs(start)
        var j = start + 1
        while (j < math.min(start + w, n)) { if (hs(j) <= m) m = hs(j); j += 1 }
        if (seen.add(m)) out += m
        start += 1
      }
      ArrayData.toArrayData(out.toArray)
    }
    override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
      copy(child = newChild)
    override def prettyName: String = "winnow_hashes"
  }

  /** simhash_full(text): `[simhash64, band0..band7]` (8-bit bands) in one
    * evaluation — same per-band re-evaluation trap as minhash_bands. */
  case class SimHashFull(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val h = SimHash64(child).nullSafeEval(input).asInstanceOf[java.lang.Long].longValue()
      val out = new Array[Long](9)
      out(0) = h
      var b = 0
      while (b < 8) { out(b + 1) = (h >>> (b * 8)) & 0xffL; b += 1 }
      ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): SimHashFull =
      copy(child = newChild)
    override def prettyName: String = "simhash_full"
  }

  /** Name → expression builders, the single source for both per-session
    * [[register]] and builder-time [[graft.GraftExtensions]] injection. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "shingle_hashes" -> (es => ShingleHashes(es.head)),
    "winnow_hashes" -> (es => WinnowHashes(es.head)),
    "simhash64" -> (es => SimHash64(es.head)),
    "minhash_sig" -> (es => MinHashSig(es.head)),
    "minhash_bands" -> (es => MinHashBands(es.head)),
    "simhash_full" -> (es => SimHashFull(es.head)))

  /** Register all in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (n, b) => reg.createOrReplaceTempFunction(n, b, "scala_udf") }
  }
}
