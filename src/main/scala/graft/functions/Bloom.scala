package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Bloom-filter build + probe — the broadcastable semi/anti-join
 * replacement. `bloom_build(col BIGINT, expected_items[, fpp])`
 * aggregates a column into one serialized filter (binary); `bloom_contains
 * (bloom, col)` probes it per row with zero false NEGATIVES. The 100 TB
 * pattern: build the filter over the SMALL side (an eval set, a denylist,
 * a batch of updated keys), ship the few-hundred-KB binary into a scan
 * predicate over the HUGE side, and pay the exact join only for the
 * `fpp` sliver of rows the filter cannot rule out — the corpus-wide
 * shuffle a plain semi/anti-join would need never happens. This is the
 * same shape as Spark's own AQE-injected runtime bloom filters, exposed
 * as a first-class, user-steerable operator.
 *
 * Sizing: m = -n·ln(fpp)/ln²2 bits (rounded up to whole 64-bit words),
 * k = m/n·ln2 probes, the standard optimum. Probes use double hashing
 * (h1 + i·h2 over splitmix64 finalizers) — k independent positions from
 * two hash evaluations (Kirsch–Mitzenmacher).
 */
object Bloom {

  /** In-memory filter: `k` probe positions over an `m = words.length*64`
    * bit array. Serializable so codegen can reference it as a constant. */
  final class BloomSketch(val k: Int, val words: Array[Long]) extends Serializable {
    private def mBits: Long = words.length.toLong * 64L

    // splitmix64 finalizer — the engine's standard 64->64 mixer
    @inline private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    def put(x: Long): Unit = {
      val h1 = mix(x)
      val h2 = mix(x ^ 0xd6e8feb86659fd93L) | 1L // odd: cycles all positions
      var i = 0
      while (i < k) {
        val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, mBits)
        words((pos >>> 6).toInt) |= (1L << (pos & 63L))
        i += 1
      }
    }

    def mightContain(x: Long): Boolean = {
      val h1 = mix(x)
      val h2 = mix(x ^ 0xd6e8feb86659fd93L) | 1L
      var i = 0
      while (i < k) {
        val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, mBits)
        if ((words((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
        i += 1
      }
      true
    }

    def mergeInPlace(other: BloomSketch): BloomSketch = {
      require(other.k == k && other.words.length == words.length,
        "bloom merge: differently-sized sketches (same literal params required)")
      var w = 0
      while (w < words.length) { words(w) |= other.words(w); w += 1 }
      this
    }

    def serialize(): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + words.length * 8)
      bb.putInt(k).putInt(words.length)
      words.foreach(bb.putLong)
      bb.array()
    }
  }

  object BloomSketch {
    /** Optimal geometry for `n` expected items at false-positive rate `fpp`. */
    def sized(n: Long, fpp: Double): BloomSketch = {
      require(n > 0, s"bloom_build: expected_items must be positive, got $n")
      require(fpp > 0 && fpp < 1, s"bloom_build: fpp must be in (0,1), got $fpp")
      val ln2 = math.log(2)
      val mBits = math.max(64L, math.ceil(-n * math.log(fpp) / (ln2 * ln2)).toLong)
      val nWords = ((mBits + 63) / 64).toInt
      val k = math.max(1, math.round(ln2 * nWords * 64.0 / n).toInt)
      new BloomSketch(k, new Array[Long](nWords))
    }

    def deserialize(bytes: Array[Byte]): BloomSketch = {
      val bb = ByteBuffer.wrap(bytes)
      val k = bb.getInt
      val n = bb.getInt
      val words = new Array[Long](n)
      var i = 0
      while (i < n) { words(i) = bb.getLong; i += 1 }
      new BloomSketch(k, words)
    }
  }

  /** `bloom_build(col, n[, fpp])` aggregate: BIGINT column → serialized
    * filter. Partial-aggregation friendly: per-partition filters OR-merge
    * (a bloom is a union-homomorphic bitset), so the shuffle carries one
    * fixed-size buffer per map task, never the key set. */
  case class BloomBuild(
      child: Expression,
      expectedItems: Long,
      fpp: Double,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[BloomSketch] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): BloomSketch =
      BloomSketch.sized(expectedItems, fpp)

    override def update(buf: BloomSketch, input: InternalRow): BloomSketch = {
      val v = child.eval(input)
      if (v != null) buf.put(v.asInstanceOf[Long])
      buf
    }

    override def merge(b1: BloomSketch, b2: BloomSketch): BloomSketch =
      b1.mergeInPlace(b2)

    override def eval(buf: BloomSketch): Any = buf.serialize()

    override def serialize(buf: BloomSketch): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): BloomSketch =
      BloomSketch.deserialize(bytes)

    override def withNewMutableAggBufferOffset(o: Int): BloomBuild =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomBuild =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomBuild =
      copy(child = c.head)
    override def prettyName: String = "bloom_build"
  }

  /** `bloom_contains(bloomLiteral, col)`: per-row probe. The filter
    * argument must be FOLDABLE (a literal or the captured result of a
    * bloom_build run) — it is deserialized once at plan time and
    * referenced as a constant from generated code, so the hot path is k
    * word probes with no per-row deserialization. */
  case class BloomMightContain(bloomBytes: Array[Byte], child: Expression)
      extends UnaryExpression {

    @transient private lazy val sketch = BloomSketch.deserialize(bloomBytes)

    override def dataType: DataType = BooleanType

    override protected def nullSafeEval(v: Any): Any =
      sketch.mightContain(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomSketch", sketch, classOf[BloomSketch].getName)
      defineCodeGen(ctx, ev, v => s"$ref.mightContain($v)")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
      copy(child = newChild)
    override def prettyName: String = "bloom_contains"
  }

  private def literalLong(e: Expression, fn: String, arg: String): Long = {
    require(e.foldable, s"$fn: $arg must be a literal")
    e.eval(InternalRow.empty) match {
      case n: Number => n.longValue()
      case d: Decimal => d.toLong // SQL numeric literals like `100000` may parse decimal
      case other => throw new IllegalArgumentException(s"$fn: $arg must be numeric, got $other")
    }
  }

  private def literalDouble(e: Expression, fn: String, arg: String): Double = {
    require(e.foldable, s"$fn: $arg must be a literal")
    e.eval(InternalRow.empty) match {
      case n: Number => n.doubleValue()
      case d: Decimal => d.toDouble // SQL fraction literals like `0.01` parse decimal
      case other => throw new IllegalArgumentException(s"$fn: $arg must be numeric, got $other")
    }
  }

  private def requireLong(e: Expression, fn: String): Unit =
    require(e.dataType == LongType,
      s"$fn expects a BIGINT column (got ${e.dataType.simpleString}); hash/cast first")

  /** Name → expression builders, the single source for both per-session
    * [[register]] and builder-time [[graft.GraftExtensions]] injection. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "bloom_build" -> {
      case Seq(c, nE) =>
        requireLong(c, "bloom_build")
        BloomBuild(c, literalLong(nE, "bloom_build", "expected_items"), 0.01)
          .toAggregateExpression()
      case Seq(c, nE, fppE) =>
        requireLong(c, "bloom_build")
        BloomBuild(c, literalLong(nE, "bloom_build", "expected_items"),
          literalDouble(fppE, "bloom_build", "fpp")).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"bloom_build expects (col, expected_items[, fpp]), got ${es.length} arguments")
    },
    "bloom_contains" -> {
      case Seq(b, v) =>
        require(b.foldable && b.dataType == BinaryType,
          "bloom_contains: first argument must be a BINARY literal " +
            "(the serialized filter from a completed bloom_build)")
        requireLong(v, "bloom_contains")
        val bytes = b.eval(InternalRow.empty)
        require(bytes != null, "bloom_contains: the filter literal is null")
        BloomMightContain(bytes.asInstanceOf[Array[Byte]], v)
      case es => throw new IllegalArgumentException(
        s"bloom_contains expects (bloom, col), got ${es.length} arguments")
    })

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (n, b) => reg.createOrReplaceTempFunction(n, b, "scala_udf") }
  }
}
