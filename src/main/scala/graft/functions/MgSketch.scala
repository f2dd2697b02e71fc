package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Misra-Gries frequent-items sketch with a SERIALIZED, MERGEABLE state —
 * the stored-state counterpart of the one-shot `heavy_hitters` aggregate
 * ([[Sketches.HeavyHitters]] decodes its candidates at eval and cannot
 * be persisted or folded later).
 *
 * k counters over DOUBLE items; insert decrements all counters when a
 * new item arrives at capacity (Misra-Gries 1982), merge combines
 * counts then subtracts the (k+1)-th largest and drops non-positives
 * (Agarwal et al., "Mergeable Summaries") — so the guarantee COMPOSES
 * across merges: every item with true frequency > n/(k+1) survives in
 * the merged state regardless of partitioning, slice layout, or merge
 * order. The state also carries the EXACT folded row count `n`
 * (additive under merge), so consumers can threshold without a second
 * pass. Sub-threshold extras may differ with merge order; the
 * candidates-then-exact-verify pattern (join candidates back to exact
 * counts) is what makes final answers deterministic — the same contract
 * the one-shot `heavy_hitters` gates use.
 *
 * Serialized form: `[int32 k][int64 n][int32 m][m × (float64 item,
 * int64 count)]`; ≤ 16k+16 bytes per group regardless of corpus size.
 *
 * Functions (register via [[MgSketch.register]]):
 *  - `mg_sketch(col[, k])` — aggregate a DOUBLE column into an MG state
 *    (BINARY), NULLs ignored;
 *  - `mg_merge(sketchCol)` — aggregate-merge stored states (k adopted
 *    from the first non-empty state; mixed k refuses loudly);
 *  - `mg_items(sketch)` — surviving candidate items, ascending;
 *  - `mg_n(sketch)` — the exact folded row count (never approximated).
 */
object MgSketch {

  val DefaultK: Int = 64

  final class State(val k: Int) extends Serializable {
    require(k > 0, s"mg_sketch: k must be positive, got $k")
    val counts = new java.util.HashMap[java.lang.Double, java.lang.Long]()
    var n: Long = 0L

    def insert(v: Double): Unit = {
      n += 1
      val cur = counts.get(v)
      if (cur != null) { counts.put(v, cur + 1L); () }
      else if (counts.size < k) { counts.put(v, 1L); () }
      else {
        // classic MG step: a new item at capacity decrements every
        // counter; zeros vacate their slots
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }

    def mergeIn(other: State): Unit = {
      require(other.k == k,
        s"mg_merge: cannot merge sketches of k=$k and k=${other.k}")
      n += other.n
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
      }
      if (counts.size > k) {
        // Agarwal et al.: subtract the (k+1)-th largest count, drop <= 0
        val vals = new Array[Long](counts.size)
        var i = 0
        val vi = counts.values().iterator()
        while (vi.hasNext) { vals(i) = vi.next().longValue(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - k - 1)
        val ei = counts.entrySet().iterator()
        while (ei.hasNext) {
          val e = ei.next()
          if (e.getValue <= cut) ei.remove()
          else e.setValue(e.getValue - cut)
        }
      }
    }

    /** Surviving items, ascending (deterministic report order). */
    def items: Array[Double] = {
      val out = new Array[Double](counts.size)
      var i = 0
      val it = counts.keySet().iterator()
      while (it.hasNext) { out(i) = it.next().doubleValue(); i += 1 }
      java.util.Arrays.sort(out)
      out
    }

    def serialize(): Array[Byte] = {
      val bb = ByteBuffer.allocate(16 + counts.size * 16)
      bb.putInt(k).putLong(n).putInt(counts.size)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putDouble(e.getKey.doubleValue()).putLong(e.getValue.longValue())
      }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new State(bb.getInt)
    s.n = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) { s.counts.put(bb.getDouble, bb.getLong); i += 1 }
    s
  }

  /** `mg_sketch(col, k)`: fold a DOUBLE column into an MG state. */
  case class SketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[State] with ImplicitCastInputTypes {
    override def children: Seq[Expression] = Seq(child)
    override def inputTypes: Seq[DataType] = Seq(DoubleType)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def createAggregationBuffer(): State = new State(k)
    override def update(buf: State, input: InternalRow): State = {
      val v = child.eval(input)
      if (v != null) buf.insert(v.asInstanceOf[Double])
      buf
    }
    override def merge(b1: State, b2: State): State = { b1.mergeIn(b2); b1 }
    override def eval(buf: State): Any = buf.serialize()
    override def serialize(buf: State): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): State =
      MgSketch.deserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): SketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): SketchAgg = copy(child = c.head)
    override def prettyName: String = "mg_sketch"
  }

  /** `mg_merge(sketchCol)`: merge already-built states. */
  case class MergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[State] with ImplicitCastInputTypes {
    override def children: Seq[Expression] = Seq(child)
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def createAggregationBuffer(): State = new State(DefaultK)
    private def fold(buf: State, other: State): State =
      if (buf.n == 0 && buf.counts.isEmpty && buf.k != other.k) other
      else { buf.mergeIn(other); buf }
    override def update(buf: State, input: InternalRow): State = {
      val v = child.eval(input)
      if (v == null) buf
      else fold(buf, MgSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    }
    override def merge(b1: State, b2: State): State =
      if (b2.n == 0 && b2.counts.isEmpty) b1 else fold(b1, b2)
    override def eval(buf: State): Any = buf.serialize()
    override def serialize(buf: State): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): State =
      MgSketch.deserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): MergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): MergeAgg = copy(child = c.head)
    override def prettyName: String = "mg_merge"
  }

  /** `mg_items(sketch)` — surviving candidates, ascending. */
  case class Items(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(sketch: Any): Any =
      new GenericArrayData(
        MgSketch.deserialize(sketch.asInstanceOf[Array[Byte]]).items)
    override protected def withNewChildInternal(c: Expression): Items =
      copy(child = c)
    override def prettyName: String = "mg_items"
  }

  /** `mg_n(sketch)` — the exact folded row count. */
  case class Count(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = LongType
    override def nullSafeEval(sketch: Any): Any =
      MgSketch.deserialize(sketch.asInstanceOf[Array[Byte]]).n
    override protected def withNewChildInternal(c: Expression): Count =
      copy(child = c)
    override def prettyName: String = "mg_n"
  }

  private def literalK(kExpr: Expression): Int = {
    require(kExpr.foldable, "mg_sketch: k must be a literal (it sizes the state)")
    kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "mg_sketch" -> {
      case Seq(c) => SketchAgg(c, DefaultK).toAggregateExpression()
      case Seq(c, kExpr) => SketchAgg(c, literalK(kExpr)).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"mg_sketch expects (col) or (col, k), got ${es.length} arguments")
    },
    "mg_merge" -> {
      case Seq(c) => MergeAgg(c).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"mg_merge expects (sketch), got ${es.length} arguments")
    },
    "mg_items" -> (es => Items(es.head)),
    "mg_n" -> (es => Count(es.head)))

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (n, b) => reg.createOrReplaceTempFunction(n, b, "scala_udf") }
  }
}
