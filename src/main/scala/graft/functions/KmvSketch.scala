package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/**
 * KMV (k-minimum-values) distinct-count sketch with a SERIALIZED,
 * MERGEABLE state — the stored-state counterpart of the one-shot
 * `bottomk_distinct` aggregate ([[Sketches.BottomKDistinct]] decodes its
 * estimate at eval and cannot be persisted or folded later).
 *
 * Why it exists: DISTINCT is the canonical non-additive aggregate —
 * per-day exact distinct counts cannot be summed into "distinct users
 * last 7 days" (the same user appears in many days). Keeping the k
 * smallest 64-bit value hashes per (slice, group) makes the union exact
 * at the sketch level: `merge = union of hash sets, trimmed to k`, order-
 * and partitioning-independent. The engine's windowed family
 * ([[graft.engine.WindowedDistinctView]]) holds one KMV state per time
 * slice and answers any slice-aligned window by merging — no event
 * rescan, the property exact counters cannot offer at any cost.
 *
 * Estimate: with fewer than k distinct hashes the sketch IS the exact
 * distinct count; at or past k, `(k-1) / frac(k-th minimum)` — the
 * classic KMV estimator (Bar-Yossef et al. 2002; Beyer et al. 2007),
 * relative standard error ≈ `1/sqrt(k-2)` (~3 % at k = 1024). Duplicate
 * inserts are free (same hash), which is what makes the per-slice state
 * idempotent under re-folds of the same rows.
 *
 * Serialized form: `[int32 k][int32 n][n × int64 ascending hashes]`;
 * ≤ 8k+8 bytes per group regardless of corpus size.
 *
 * Functions (register via [[KmvSketch.register]]):
 *  - `kmv_sketch(col[, k])` — aggregate any column into a KMV state
 *    (BINARY); values hash by type-tagged XxHash64, NULLs ignored;
 *  - `kmv_merge(sketchCol)` — aggregate-merge stored states (k adopted
 *    from the first non-empty state; mixed k refuses loudly);
 *  - `kmv_estimate(sketch)` — decoded distinct-count estimate (exact
 *    below k);
 *  - `kmv_full(sketch)` — true once the sketch left the exact regime
 *    (callers gate exactness assertions on it).
 */
object KmvSketch {

  val DefaultK: Int = 1024

  final class State(val k: Int) extends Serializable {
    require(k > 0, s"kmv_sketch: k must be positive, got $k")
    val hashes = new java.util.TreeSet[java.lang.Long]()

    def insert(h: Long): Unit = {
      hashes.add(h)
      if (hashes.size > k) { hashes.pollLast(); () }
    }

    def mergeIn(other: State): Unit = {
      require(other.k == k,
        s"kmv_merge: cannot merge sketches of k=$k and k=${other.k}")
      val it = other.hashes.iterator()
      while (it.hasNext) insert(it.next().longValue())
    }

    /** Exact below k; the (k-1)/frac KMV estimator at/past k. */
    def estimate: Long =
      if (hashes.size < k) hashes.size.toLong
      else {
        val kth = hashes.last().longValue()
        val frac = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
        math.round((k - 1) / frac)
      }

    def full: Boolean = hashes.size >= k

    def serialize(): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + hashes.size * 8)
      bb.putInt(k).putInt(hashes.size)
      val it = hashes.iterator()
      while (it.hasNext) bb.putLong(it.next().longValue())
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new State(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { s.hashes.add(bb.getLong); i += 1 }
    s
  }

  /** `kmv_sketch(col, k)`: fold a column into a KMV state. */
  case class SketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[State] {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def createAggregationBuffer(): State = new State(k)
    override def update(buf: State, input: InternalRow): State = {
      val v = child.eval(input)
      if (v != null) buf.insert(XxHash64Function.hash(v, child.dataType, 42L))
      buf
    }
    override def merge(b1: State, b2: State): State = { b1.mergeIn(b2); b1 }
    override def eval(buf: State): Any = buf.serialize()
    override def serialize(buf: State): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): State =
      KmvSketch.deserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): SketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): SketchAgg = copy(child = c.head)
    override def prettyName: String = "kmv_sketch"
  }

  /** `kmv_merge(sketchCol)`: merge already-built states — the
    * maintained-state fold ("stored state ⊕ batch state"). */
  case class MergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[State] with ImplicitCastInputTypes {
    override def children: Seq[Expression] = Seq(child)
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    /** Lazily adopt the first real state's k. */
    override def createAggregationBuffer(): State = new State(DefaultK)
    private def fold(buf: State, other: State): State =
      if (buf.hashes.isEmpty && buf.k != other.k) other
      else { buf.mergeIn(other); buf }
    override def update(buf: State, input: InternalRow): State = {
      val v = child.eval(input)
      if (v == null) buf
      else fold(buf, KmvSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    }
    override def merge(b1: State, b2: State): State =
      if (b2.hashes.isEmpty) b1 else fold(b1, b2)
    override def eval(buf: State): Any = buf.serialize()
    override def serialize(buf: State): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): State =
      KmvSketch.deserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): MergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): MergeAgg = copy(child = c.head)
    override def prettyName: String = "kmv_merge"
  }

  /** `kmv_estimate(sketch)` — decoded distinct estimate; state-row
    * serving only, so CodegenFallback is fine. */
  case class Estimate(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = LongType
    override def nullSafeEval(sketch: Any): Any =
      KmvSketch.deserialize(sketch.asInstanceOf[Array[Byte]]).estimate
    override protected def withNewChildInternal(c: Expression): Estimate =
      copy(child = c)
    override def prettyName: String = "kmv_estimate"
  }

  /** `kmv_full(sketch)` — left the exact regime? */
  case class Full(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = BooleanType
    override def nullSafeEval(sketch: Any): Any =
      KmvSketch.deserialize(sketch.asInstanceOf[Array[Byte]]).full
    override protected def withNewChildInternal(c: Expression): Full =
      copy(child = c)
    override def prettyName: String = "kmv_full"
  }

  private def literalK(kExpr: Expression): Int = {
    require(kExpr.foldable, "kmv_sketch: k must be a literal (it sizes the state)")
    kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "kmv_sketch" -> {
      case Seq(c) => SketchAgg(c, DefaultK).toAggregateExpression()
      case Seq(c, kExpr) => SketchAgg(c, literalK(kExpr)).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"kmv_sketch expects (col) or (col, k), got ${es.length} arguments")
    },
    "kmv_merge" -> {
      case Seq(c) => MergeAgg(c).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"kmv_merge expects (sketch), got ${es.length} arguments")
    },
    "kmv_estimate" -> (es => Estimate(es.head)),
    "kmv_full" -> (es => Full(es.head)))

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (n, b) => reg.createOrReplaceTempFunction(n, b, "scala_udf") }
  }
}
