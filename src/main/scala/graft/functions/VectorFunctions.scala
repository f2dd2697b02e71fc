package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native vector math for the similarity operators.
 *
 * The declarative alternative — `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
 * — is a higher-order function: not codegen'd, one lambda dispatch per
 * element, intermediate product array materialized per row. Fine for a
 * one-off; wrong for the ANN hot path where every (probe, candidate) pair
 * pays it. These expressions run a tight primitive loop over the two
 * ArrayData buffers instead (no per-element dispatch, no intermediates).
 */
object VectorFunctions {

  /** vec_dot(a, b): Σ a_i·b_i over array<double>, accumulated left to
    * right (same order as the sequential HOF fold and the DuckDB oracle's
    * list_sum, so float results are bit-identical). Fully codegen'd:
    * this runs once per (probe, candidate) pair in the ANN hot path, so
    * unlike the once-per-document hash expressions it earns a real
    * `doGenCode` — the loop inlines into whole-stage codegen with no
    * boxing and no interpreted-eval bridge. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    // declared input types make misuse an ANALYSIS error (and let a
    // float-array argument coerce) instead of ArrayData.getDouble
    // silently misreading another element width at runtime
    override def inputTypes =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      // fail loud on a dimension mismatch: silently truncating would give
      // a plausible-but-wrong dot (and cosine), shifting every downstream
      // ANN/dedup score with no visible symptom
      if (n != y.numElements())
        throw new IllegalArgumentException(
          s"vec_dot: dimension mismatch ($n vs ${y.numElements()})")
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "vec_dot: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
           |}
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  /**
   * hyperplane_bands(v): the `bands` random-hyperplane LSH band values of a
   * vector, one pass. Plane (j) component (i) is ±1 from
   * `splitmix64(j*7919 + i) & 1`; band value packs `bitsPerBand` sign
   * bits. One evaluation computes all planes while the vector is hot in
   * cache — the per-band expression route re-reads the 64-dim array once
   * per plane (32×) through interpreted HOFs.
   */
  case class HyperplaneBands(child: Expression, bands: Int = 8, bitsPerBand: Int = 4)
      extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var bv = 0L
        var k = 0
        while (k < bitsPerBand) {
          val j = b * bitsPerBand + k
          var dot = 0.0
          var i = 0
          while (i < dim) {
            val sign = if ((Hashes.splitmix64(j.toLong * 7919L + i) & 1L) == 0L) 1.0 else -1.0
            dot += sign * v.getDouble(i)
            i += 1
          }
          if (dot > 0) bv |= (1L << k)
          k += 1
        }
        out(b) = bv
        b += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
      copy(child = newChild)
    override def prettyName: String = "hyperplane_bands"
  }

  /** vec_quantize(v, scale): symmetric int8 scalar quantization (SQ8) —
    * `round(v_i · 127 / scale)` clamped to [-127, 127], as
    * `array<tinyint>`: a 4× smaller spelling of the vector whose integer
    * dot preserves cosine ORDER well enough for candidate generation
    * (exact float rerank restores correctness). Runs once per stored row
    * at index-write time and once per probe — not the pair hot path — so
    * interpreted eval suffices (CodegenFallback). */
  case class VecQuantize(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
    override def inputTypes =
      Seq(ArrayType(DoubleType), DoubleType)
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def nullSafeEval(a: Any, sc: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val scale = sc.asInstanceOf[Double]
      if (scale <= 0)
        throw new IllegalArgumentException(s"vec_quantize: scale must be positive, got $scale")
      val n = v.numElements()
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val q = math.rint(v.getDouble(i) * 127.0 / scale)
        out(i) = math.max(-127.0, math.min(127.0, q)).toByte
        i += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecQuantize =
      copy(left = l, right = r)
    override def prettyName: String = "vec_quantize"
  }

  /** vec_dot_q(a, b): integer dot product over two `array<tinyint>`
    * (SQ8) vectors. Long accumulator: 64 dims × 127² ≈ 10⁶ per vector
    * pair fits easily, and wider dims stay safe. Codegen'd like
    * [[VecDot]] — this IS the quantized candidate-generation hot path,
    * running once per (probe, corpus vector). */
  case class VecDotQ(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    // array<tinyint> only: implicit casts never NARROW, so e.g. an
    // array<int> argument is an analysis error rather than getByte
    // reading the wrong stride and returning garbage
    override def inputTypes =
      Seq(ArrayType(ByteType), ArrayType(ByteType))
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements())
        throw new IllegalArgumentException(
          s"vec_dot_q: dimension mismatch ($n vs ${y.numElements()})")
      var acc = 0L
      var i = 0
      while (i < n) { acc += x.getByte(i).toLong * y.getByte(i).toLong; i += 1 }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "vec_dot_q: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
           |}
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotQ =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot_q"
  }

  /** pq_adc(codes, lut, ks): asymmetric distance computation for product
    * quantization — `Σ_m lut[m·ks + codes[m]]`, the probe-side lookup-table
    * read that approximates `dot(probe, x)` from x's M-byte PQ code alone.
    * `codes` is `array<tinyint>` (one sub-quantizer code per subspace, in
    * `[0, ks)`), `lut` is the probe's flattened `M × ks` table of
    * `dot(probe_sub_m, codebook[m][k])` values. Codegen'd like [[VecDot]]:
    * this is the PQ candidate-generation hot path, one evaluation per
    * (probe, candidate) pair, and the whole point of PQ is that it reads
    * M bytes + M table entries instead of D floats. */
  case class PqAdc(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with ImplicitCastInputTypes {
    // declared types: a non-tinyint code array or non-int ks is an
    // analysis error, not a silent ArrayData misread
    override def inputTypes =
      Seq(ArrayType(ByteType), ArrayType(DoubleType), IntegerType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(c: Any, l: Any, k: Any): Any = {
      val codes = c.asInstanceOf[ArrayData]
      val lut = l.asInstanceOf[ArrayData]
      val ks = k.asInstanceOf[Int]
      val m = codes.numElements()
      if (lut.numElements() != m * ks)
        throw new IllegalArgumentException(
          s"pq_adc: lut size ${lut.numElements()} != m·ks = ${m * ks}")
      var acc = 0.0
      var i = 0
      while (i < m) {
        // unsigned decode: a tinyint code 128..255 stores as a negative
        // byte; & 0xFF recovers it, so the byte-code ceiling is ks = 256
        val code = codes.getByte(i) & 0xFF
        if (code >= ks)
          throw new IllegalArgumentException(s"pq_adc: code $code out of [0, $ks)")
        acc += lut.getDouble(i * ks + code)
        i += 1
      }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, l, k) => {
        val m = ctx.freshName("m")
        val i = ctx.freshName("i")
        val code = ctx.freshName("code")
        val acc = ctx.freshName("acc")
        s"""
           |final int $m = $c.numElements();
           |if ($l.numElements() != $m * $k) {
           |  throw new IllegalArgumentException(
           |    "pq_adc: lut size " + $l.numElements() + " != m*ks = " + ($m * $k));
           |}
           |double $acc = 0.0;
           |for (int $i = 0; $i < $m; $i++) {
           |  final int $code = $c.getByte($i) & 0xFF;
           |  if ($code >= $k) {
           |    throw new IllegalArgumentException("pq_adc: code " + $code + " out of [0, " + $k + ")");
           |  }
           |  $acc += $l.getDouble($i * $k + $code);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): PqAdc =
      copy(first = f, second = s, third = t)
    override def prettyName: String = "pq_adc"
  }

  /** pq_lut(v): the probe-side ADC lookup table for product quantization —
    * `lut[mi·ks + k] = dot(v_sub_mi, books[mi][k])`, all M·ks sub-dot
    * products in one pass over the probe vector. The codebook matrix rides
    * as a codegen REFERENCE OBJECT like [[NearestCells]]'s centroids: the
    * per-entry literal spelling (`array(vec_dot(slice(v,…), lit(book)) …)`)
    * compiles O(M·ks) expression nodes into the plan, which is what
    * bounded the engine's sub-quantizer resolution at ks=16 — as a
    * reference, codegen is O(1) in ks and the codebooks can scale with
    * the byte-code ceiling (ks ≤ 256 — codes decode UNSIGNED via & 0xFF
    * in [[PqAdc]]/[[PqReconNorm2]], so 128..255 round-trip through the
    * signed tinyint storage) instead of the plan size.
    * Accumulation order per entry is i ascending — identical to the
    * literal `vec_dot` spelling this replaces. */
  case class PqLut(child: Expression, flatBooks: Array[Double],
      m: Int, subDim: Int, ks: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != m * subDim)
        throw new IllegalArgumentException(
          s"pq_lut: dimension mismatch (${v.numElements()} vs ${m * subDim})")
      val out = new Array[Double](m * ks)
      var mi = 0
      while (mi < m) {
        var k = 0
        while (k < ks) {
          var acc = 0.0
          val boff = (mi * ks + k) * subDim
          val voff = mi * subDim
          var i = 0
          while (i < subDim) { acc += v.getDouble(voff + i) * flatBooks(boff + i); i += 1 }
          out(mi * ks + k) = acc
          k += 1
        }
        mi += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val books = ctx.addReferenceObj("pqBooks", flatBooks, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val out = ctx.freshName("out")
        val mi = ctx.freshName("mi")
        val k = ctx.freshName("k")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val boff = ctx.freshName("boff")
        val voff = ctx.freshName("voff")
        s"""
           |if ($v.numElements() != ${m * subDim}) {
           |  throw new IllegalArgumentException(
           |    "pq_lut: dimension mismatch (" + $v.numElements() + " vs ${m * subDim})");
           |}
           |double[] $out = new double[${m * ks}];
           |for (int $mi = 0; $mi < $m; $mi++) {
           |  final int $voff = $mi * $subDim;
           |  for (int $k = 0; $k < $ks; $k++) {
           |    final int $boff = ($mi * $ks + $k) * $subDim;
           |    double $acc = 0.0;
           |    for (int $i = 0; $i < $subDim; $i++) {
           |      $acc += $v.getDouble($voff + $i) * $books[$boff + $i];
           |    }
           |    $out[$mi * $ks + $k] = $acc;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): PqLut =
      copy(child = newChild)
    override def prettyName: String = "pq_lut"
    // keep plan strings model-size-independent (see NearestCells)
    override def toString: String = s"pq_lut($child, m=$m, ks=$ks)"
  }

  /** Column wrapper for [[PqLut]]: flattens `books[m][k][i]` m-major. */
  def pqLut(v: org.apache.spark.sql.Column,
      books: Array[Array[Array[Double]]]): org.apache.spark.sql.Column = {
    require(books.nonEmpty && books(0).nonEmpty, "pqLut: empty codebook model")
    val m = books.length
    val ks = books(0).length
    val subDim = books(0)(0).length
    val flat = new Array[Double](m * ks * subDim)
    var mi = 0
    while (mi < m) {
      require(books(mi).length == ks, "pqLut: ragged codebook model")
      var k = 0
      while (k < ks) {
        require(books(mi)(k).length == subDim, "pqLut: ragged sub-centroid")
        System.arraycopy(books(mi)(k), 0, flat, (mi * ks + k) * subDim, subDim)
        k += 1
      }
      mi += 1
    }
    org.apache.spark.sql.graftshim.Shims.column(
      PqLut(org.apache.spark.sql.graftshim.Shims.expression(v), flat, m, subDim, ks))
  }

  /** cell_residual(v, cid): `v − cents[cid]` — the residual a vector
    * leaves against its coarse-quantizer centroid, the quantity the
    * IVFADC design (residual-encoded IVF-PQ, the standard layout from the
    * public ANN literature) trains its codebooks on and encodes. The
    * centroid matrix rides as a driver-side reference array like
    * [[NearestCells]]'s. Index-write path only (once per stored row), so
    * interpreted eval suffices (CodegenFallback). */
  case class CellResidual(left: Expression, right: Expression,
      flatCents: Array[Double], dim: Int)
      extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
    override def inputTypes = Seq(ArrayType(DoubleType), IntegerType)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(a: Any, c: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val cid = c.asInstanceOf[Int]
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"cell_residual: dimension mismatch (${v.numElements()} vs $dim)")
      if (cid < 0 || (cid + 1) * dim > flatCents.length)
        throw new IllegalArgumentException(s"cell_residual: cell $cid out of range")
      val off = cid * dim
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) { out(i) = v.getDouble(i) - flatCents(off + i); i += 1 }
      ArrayData.toArrayData(out)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CellResidual =
      copy(left = l, right = r)
    override def prettyName: String = "cell_residual"
    override def toString: String = s"cell_residual($left, $right, dim=$dim)"
  }

  /** cell_dot(v, cid): `dot(v, cents[cid])` — the probe-side coarse term
    * of the residual-ADC score `dot(p, c + r̂) = dot(p, c) + adc(codes)`.
    * Runs once per (probe, probed cell) — model-sized — so interpreted
    * eval suffices. */
  case class CellDot(left: Expression, right: Expression,
      flatCents: Array[Double], dim: Int)
      extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
    override def inputTypes = Seq(ArrayType(DoubleType), IntegerType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, c: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val cid = c.asInstanceOf[Int]
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"cell_dot: dimension mismatch (${v.numElements()} vs $dim)")
      if (cid < 0 || (cid + 1) * dim > flatCents.length)
        throw new IllegalArgumentException(s"cell_dot: cell $cid out of range")
      val off = cid * dim
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += v.getDouble(i) * flatCents(off + i); i += 1 }
      acc
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CellDot =
      copy(left = l, right = r)
    override def prettyName: String = "cell_dot"
    override def toString: String = s"cell_dot($left, $right, dim=$dim)"
  }

  /** pq_recon_norm2(cid, codes): `|cents[cid] + recon(codes)|²` — the
    * squared norm of a residual-encoded vector's RECONSTRUCTION, stored
    * alongside the code so residual-ADC dots can rank by approximate
    * cosine. Index-write path only; interpreted eval suffices. */
  case class PqReconNorm2(left: Expression, right: Expression,
      flatCents: Array[Double], flatBooks: Array[Double],
      dim: Int, subDim: Int, ks: Int)
      extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
    override def inputTypes = Seq(IntegerType, ArrayType(ByteType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(c: Any, cd: Any): Any = {
      val cid = c.asInstanceOf[Int]
      val codes = cd.asInstanceOf[ArrayData]
      val m = codes.numElements()
      if (m * subDim != dim)
        throw new IllegalArgumentException(
          s"pq_recon_norm2: code count $m × subDim $subDim != dim $dim")
      if (cid < 0 || (cid + 1) * dim > flatCents.length)
        throw new IllegalArgumentException(s"pq_recon_norm2: cell $cid out of range")
      val coff = cid * dim
      var acc = 0.0
      var mi = 0
      while (mi < m) {
        val code = codes.getByte(mi) & 0xFF // unsigned decode (ks ≤ 256)
        if (code >= ks)
          throw new IllegalArgumentException(s"pq_recon_norm2: code $code out of [0, $ks)")
        val boff = (mi * ks + code) * subDim
        var i = 0
        while (i < subDim) {
          val x = flatCents(coff + mi * subDim + i) + flatBooks(boff + i)
          acc += x * x
          i += 1
        }
        mi += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqReconNorm2 =
      copy(left = l, right = r)
    override def prettyName: String = "pq_recon_norm2"
    override def toString: String = s"pq_recon_norm2($left, $right, ks=$ks)"
  }

  /** Shared centroid-matrix flattener for the cell-model expressions. */
  private def flattenCents(cents: Array[Array[Double]]): (Array[Double], Int) = {
    require(cents.nonEmpty, "empty centroid model")
    val dim = cents(0).length
    val flat = new Array[Double](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      require(cents(c).length == dim, "ragged centroid model")
      System.arraycopy(cents(c), 0, flat, c * dim, dim)
      c += 1
    }
    (flat, dim)
  }

  /** Shared codebook flattener (m-major, k-minor): `books[m][k][i]` →
    * `flat[(m·ks + k)·subDim + i]`. */
  private def flattenBooks(books: Array[Array[Array[Double]]]): (Array[Double], Int, Int, Int) = {
    require(books.nonEmpty && books(0).nonEmpty, "empty codebook model")
    val m = books.length
    val ks = books(0).length
    val subDim = books(0)(0).length
    val flat = new Array[Double](m * ks * subDim)
    var mi = 0
    while (mi < m) {
      require(books(mi).length == ks, "ragged codebook model")
      var k = 0
      while (k < ks) {
        require(books(mi)(k).length == subDim, "ragged sub-centroid")
        System.arraycopy(books(mi)(k), 0, flat, (mi * ks + k) * subDim, subDim)
        k += 1
      }
      mi += 1
    }
    (flat, m, ks, subDim)
  }

  def cellResidual(v: org.apache.spark.sql.Column, cid: org.apache.spark.sql.Column,
      cents: Array[Array[Double]]): org.apache.spark.sql.Column = {
    val (flat, dim) = flattenCents(cents)
    org.apache.spark.sql.graftshim.Shims.column(CellResidual(
      org.apache.spark.sql.graftshim.Shims.expression(v),
      org.apache.spark.sql.graftshim.Shims.expression(cid), flat, dim))
  }

  def cellDot(v: org.apache.spark.sql.Column, cid: org.apache.spark.sql.Column,
      cents: Array[Array[Double]]): org.apache.spark.sql.Column = {
    val (flat, dim) = flattenCents(cents)
    org.apache.spark.sql.graftshim.Shims.column(CellDot(
      org.apache.spark.sql.graftshim.Shims.expression(v),
      org.apache.spark.sql.graftshim.Shims.expression(cid), flat, dim))
  }

  def pqReconNorm2(cid: org.apache.spark.sql.Column, codes: org.apache.spark.sql.Column,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): org.apache.spark.sql.Column = {
    val (flatC, dim) = flattenCents(cents)
    val (flatB, m, ks, subDim) = flattenBooks(books)
    require(m * subDim == dim,
      s"pqReconNorm2: codebook geometry m=$m × subDim=$subDim != centroid dim $dim")
    org.apache.spark.sql.graftshim.Shims.column(PqReconNorm2(
      org.apache.spark.sql.graftshim.Shims.expression(cid),
      org.apache.spark.sql.graftshim.Shims.expression(codes),
      flatC, flatB, dim, subDim, ks))
  }

  /**
   * nearest_cells(v): indices of the `nSelect` nearest coarse-quantizer
   * centroids of `v`, ranked by `dist² − |v|² = −2·v·c + |c|²` (the
   * rank-equivalent score that drops the per-row constant), ties toward
   * the lower cell id — ascending-score order, so element 1 is the
   * assignment argmin and the first `nProbe` are a probe's cells.
   *
   * The centroid matrix rides as ONE codegen reference object
   * (`ctx.addReferenceObj`), NOT as parsed literal expressions: the
   * per-centroid-literal spelling compiles O(nCells) expression nodes
   * into the plan, which bounds how many cells a quantizer can have
   * before codegen blows up (and forced the engine's old `MaxCells = 64`
   * clamp — a ~4× prune cap at any corpus size). With the matrix as a
   * reference, codegen is O(1) in nCells — a tight two-level loop — and
   * the model ships with the task binary exactly once per stage (Spark
   * broadcasts task binaries), so `nCells ∝ √n` can grow unclamped: at
   * 10¹⁰ vectors that is ~10⁵ cells ≈ 50 MB of model — executor-memory
   * noise, but ~10⁸ Janino AST nodes if spelled as literals.
   */
  case class NearestCells(child: Expression, flat: Array[Double],
      norms2: Array[Double], dim: Int, nSelect: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    private def nCells: Int = norms2.length
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"nearest_cells: dimension mismatch (${v.numElements()} vs $dim)")
      val k = math.min(nSelect, nCells)
      val bestS = new Array[Double](k)
      val bestI = new Array[Int](k)
      var filled = 0
      var c = 0
      while (c < nCells) {
        var dot = 0.0
        val off = c * dim
        var i = 0
        while (i < dim) { dot += flat(off + i) * v.getDouble(i); i += 1 }
        val score = -2.0 * dot + norms2(c)
        // strict <: an equal score keeps the earlier (lower) cell id,
        // matching array_min / array_sort struct ordering on (score, idx)
        if (filled < k || score < bestS(k - 1)) {
          var pos = if (filled < k) { filled += 1; filled - 1 } else k - 1
          while (pos > 0 && bestS(pos - 1) > score) {
            bestS(pos) = bestS(pos - 1); bestI(pos) = bestI(pos - 1); pos -= 1
          }
          bestS(pos) = score; bestI(pos) = c
        }
        c += 1
      }
      ArrayData.toArrayData(java.util.Arrays.copyOf(bestI, filled))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mat = ctx.addReferenceObj("centMatrix", flat, "double[]")
      val n2 = ctx.addReferenceObj("centNorms2", norms2, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val k = math.min(nSelect, nCells)
        val bestS = ctx.freshName("bestS")
        val bestI = ctx.freshName("bestI")
        val filled = ctx.freshName("filled")
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val off = ctx.freshName("off")
        val dot = ctx.freshName("dot")
        val score = ctx.freshName("score")
        val pos = ctx.freshName("pos")
        s"""
           |if ($v.numElements() != $dim) {
           |  throw new IllegalArgumentException(
           |    "nearest_cells: dimension mismatch (" + $v.numElements() + " vs $dim)");
           |}
           |double[] $bestS = new double[$k];
           |int[] $bestI = new int[$k];
           |int $filled = 0;
           |for (int $c = 0; $c < $nCells; $c++) {
           |  double $dot = 0.0;
           |  final int $off = $c * $dim;
           |  for (int $i = 0; $i < $dim; $i++) {
           |    $dot += $mat[$off + $i] * $v.getDouble($i);
           |  }
           |  final double $score = -2.0 * $dot + $n2[$c];
           |  if ($filled < $k || $score < $bestS[$k - 1]) {
           |    int $pos = ($filled < $k) ? $filled++ : $k - 1;
           |    while ($pos > 0 && $bestS[$pos - 1] > $score) {
           |      $bestS[$pos] = $bestS[$pos - 1]; $bestI[$pos] = $bestI[$pos - 1]; $pos--;
           |    }
           |    $bestS[$pos] = $score; $bestI[$pos] = $c;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  java.util.Arrays.copyOf($bestI, $filled));
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): NearestCells =
      copy(child = newChild)
    override def prettyName: String = "nearest_cells"
    // the default toString would render the model arrays into every plan
    // string; keep plans model-size-independent
    override def toString: String = s"nearest_cells($child, cells=$nCells, k=$nSelect)"
  }

  /** Column wrapper for [[NearestCells]]: flattens the centroid rows and
    * precomputes `|c|²` per centroid (left-to-right summation — the same
    * order the driver-side model fit uses, so scores are bit-identical to
    * the literal-expression spelling this replaces). */
  def nearestCells(v: org.apache.spark.sql.Column, cents: Array[Array[Double]],
      k: Int): org.apache.spark.sql.Column = {
    require(cents.nonEmpty, "nearestCells: empty centroid model")
    val dim = cents(0).length
    val flat = new Array[Double](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      require(cents(c).length == dim, "nearestCells: ragged centroid model")
      System.arraycopy(cents(c), 0, flat, c * dim, dim)
      c += 1
    }
    val norms2 = cents.map { a =>
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      s
    }
    org.apache.spark.sql.graftshim.Shims.column(
      NearestCells(org.apache.spark.sql.graftshim.Shims.expression(v), flat, norms2, dim, k))
  }

  /** Name → expression builders, the single source for both per-session
    * [[register]] and builder-time [[graft.GraftExtensions]] injection. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "hyperplane_bands" -> (es => HyperplaneBands(es.head)),
    "vec_quantize" -> (es => VecQuantize(es(0), es(1))),
    "vec_dot_q" -> (es => VecDotQ(es(0), es(1))),
    "pq_adc" -> (es => PqAdc(es(0), es(1), es(2))))

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (n, b) => reg.createOrReplaceTempFunction(n, b, "scala_udf") }
  }
}
