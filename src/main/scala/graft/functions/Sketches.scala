package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types._

/**
 * Custom aggregate sketches via [[TypedImperativeAggregate]] — the
 * engine's UDAF mechanism (a mutable per-group buffer with
 * update/merge/serialize, the same machinery Spark's own
 * approx_count_distinct uses).
 *
 * `bottomk_distinct(col, k)`: KMV (k-minimum-values) distinct-count
 * sketch. Keeps the k smallest 64-bit hashes of the values; with fewer
 * than k distinct hashes the count is exact, otherwise the k-th minimum's
 * position in the hash space estimates the distinct count as
 * (k-1)/fraction-of-space-covered. Buffer is k longs — mergeable across
 * partitions (partial aggregation works), so the shuffle carries k longs
 * per group instead of the distinct value set that an exact
 * count_distinct moves.
 */
object Sketches {

  case class BottomKDistinct(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

    require(k > 0, s"bottomk_distinct: k must be positive, got $k")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = LongType

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
      buf.add(h)
      if (buf.size > k) buf.pollLast()
    }

    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) insert(buf, XxHash64Function.hash(v, child.dataType, 42L))
      buf
    }

    override def merge(
        b1: java.util.TreeSet[java.lang.Long],
        b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = b2.iterator()
      while (it.hasNext) insert(b1, it.next())
      b1
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
      if (buf.size < k) buf.size.toLong
      else {
        // fraction of the 64-bit hash space at or below the k-th minimum
        val kth = buf.last().longValue()
        val frac = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
        math.round((k - 1) / frac)
      }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.size * 8)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next().longValue())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): BottomKDistinct =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BottomKDistinct =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BottomKDistinct =
      copy(child = cs.head)
    override def prettyName: String = "bottomk_distinct"
  }

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bottomk_distinct", {
      case Seq(c) => BottomKDistinct(c, 256).toAggregateExpression()
      case Seq(c, kExpr) =>
        // k parameterizes the aggregation buffer, so it must be resolvable
        // at plan time — a column-valued k has no meaningful semantics here
        require(kExpr.foldable,
          "bottomk_distinct: k must be a literal (it sizes the sketch buffer)")
        val k = kExpr.eval(InternalRow.empty) match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"bottomk_distinct: k must be numeric, got $other")
        }
        BottomKDistinct(c, k).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"bottomk_distinct expects (col) or (col, k), got ${es.length} arguments")
    }, "scala_udf")
  }
}
