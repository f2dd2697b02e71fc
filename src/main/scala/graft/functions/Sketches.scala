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

  /**
   * `heavy_hitters(col, k)`: Misra-Gries frequent-items sketch over a
   * LongType column — k counters per aggregation buffer, mergeable
   * (Agarwal et al., "Mergeable Summaries": combine counts, then subtract
   * the (k+1)-th largest and drop non-positives). Returns the candidate
   * values as a sorted array.
   *
   * Guarantee: EVERY value with true frequency > N/(k+1) survives in the
   * sketch regardless of partitioning or merge order — so a query that
   * joins the candidates back to exact counts and keeps those > N/k
   * computes the exact frequent-item set with O(k) aggregation state,
   * where a full groupBy would shuffle the whole key space. Sub-threshold
   * extras MAY differ with partitioning; the exact-count verify filter is
   * what makes the final answer deterministic.
   */
  case class HeavyHitters(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]] {

    require(k > 0, s"heavy_hitters: k must be positive, got $k")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): java.util.HashMap[java.lang.Long, java.lang.Long] =
      new java.util.HashMap[java.lang.Long, java.lang.Long]()

    override def update(
        buf: java.util.HashMap[java.lang.Long, java.lang.Long],
        input: InternalRow): java.util.HashMap[java.lang.Long, java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) {
        val key = java.lang.Long.valueOf(v.asInstanceOf[Long])
        val cur = buf.get(key)
        if (cur != null) buf.put(key, cur + 1L)
        else if (buf.size < k) buf.put(key, 1L)
        else decrementAll(buf) // MG step: a miss with a full table decrements every counter
      }
      buf
    }

    private def decrementAll(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Unit = {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }

    override def merge(
        b1: java.util.HashMap[java.lang.Long, java.lang.Long],
        b2: java.util.HashMap[java.lang.Long, java.lang.Long]): java.util.HashMap[java.lang.Long, java.lang.Long] = {
      val it = b2.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = b1.get(e.getKey)
        b1.put(e.getKey, if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
      }
      if (b1.size > k) {
        // subtract the (k+1)-th largest count from everything, drop <= 0:
        // keeps exactly <= k counters and preserves the MG error bound
        val counts = new Array[Long](b1.size)
        var i = 0
        val vs = b1.values().iterator()
        while (vs.hasNext) { counts(i) = vs.next().longValue(); i += 1 }
        java.util.Arrays.sort(counts)
        val cut = counts(b1.size - k - 1) // (k+1)-th largest
        val es = b1.entrySet().iterator()
        while (es.hasNext) {
          val e = es.next()
          if (e.getValue <= cut) es.remove() else e.setValue(e.getValue - cut)
        }
      }
      b1
    }

    override def eval(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Any = {
      val out = new Array[Long](buf.size)
      var i = 0
      val it = buf.keySet().iterator()
      while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
      java.util.Arrays.sort(out) // stable output order
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }

    override def serialize(buf: java.util.HashMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putLong(e.getKey.longValue()); bb.putLong(e.getValue.longValue())
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.HashMap[java.lang.Long, java.lang.Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      var i = 0
      while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HeavyHitters =
      copy(child = cs.head)
    override def prettyName: String = "heavy_hitters"
  }

  /**
   * `topk_by(score, id, k)`: group-wise top-k as a bounded-heap aggregate —
   * keeps the k (score DESC, id ASC) best `(score, id)` pairs per group,
   * returned as a rank-ordered `array<struct<score, id>>`.
   *
   * This is the scale-right shape for "top k rows per group": partial
   * aggregation bounds what the shuffle carries to k pairs per group per
   * map task, where the window-function spelling
   * (`row_number over (partition by g order by s) <= k`) shuffles EVERY
   * row of every group and sorts each partition before discarding
   * all but k. Same answer as the window spelling, verified by the same
   * oracle, under two contracts: `id` uniquely identifies rows within a
   * group (two rows with identical (score, id) collapse to one — pass a
   * row id, which is what the tie-break needs anyway), and null or NaN
   * scores / null ids are EXCLUDED (the window form ranks null scores
   * last and NaN greatest instead).
   */
  case class TopKByScore(
      scoreExpr: Expression,
      idExpr: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

    require(k > 0, s"topk_by: k must be positive, got $k")

    override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("score", DoubleType, nullable = false),
        StructField("id", LongType, nullable = false))), containsNull = false)

    // TreeSet ordered worst-first: lowest score first, and among equal
    // scores the LARGER id first (ties prefer the smaller id, so the
    // larger id is the one to evict) — pollFirst() drops the worst
    private val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long.reverse)

    override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
      new java.util.TreeSet[(Double, Long)](ord)

    private def insert(buf: java.util.TreeSet[(Double, Long)], e: (Double, Long)): Unit = {
      buf.add(e)
      if (buf.size > k) buf.pollFirst()
    }

    override def update(
        buf: java.util.TreeSet[(Double, Long)],
        input: InternalRow): java.util.TreeSet[(Double, Long)] = {
      val s = scoreExpr.eval(input)
      val i = idExpr.eval(input)
      // NaN scores are excluded like nulls: TotalOrdering would rank NaN
      // above every real score and hand it a top-k slot, and external
      // oracles disagree with each other on NaN placement
      if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double]))
        insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
      buf
    }

    override def merge(
        b1: java.util.TreeSet[(Double, Long)],
        b2: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
      val it = b2.iterator()
      while (it.hasNext) insert(b1, it.next())
      b1
    }

    override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
      // descending iteration = best-first = rank order
      val rows = new Array[Any](buf.size)
      var i = 0
      val it = buf.descendingIterator()
      while (it.hasNext) {
        val (s, id) = it.next()
        rows(i) = InternalRow(s, id)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
    }

    override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKByScore =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByScore =
      copy(scoreExpr = cs(0), idExpr = cs(1))
    override def prettyName: String = "topk_by"
  }

  private def literalK(kExpr: Expression, fn: String): Int = {
    require(kExpr.foldable, s"$fn: k must be a literal (it sizes the sketch buffer)")
    kExpr.eval(InternalRow.empty) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(s"$fn: k must be numeric, got $other")
    }
  }

  /** Name → expression builders, the single source for both per-session
    * [[register]] and builder-time [[graft.GraftExtensions]] injection. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "heavy_hitters" -> {
      case Seq(c, kExpr) =>
        require(c.dataType == LongType,
          s"heavy_hitters expects a BIGINT column (got ${c.dataType.simpleString}); cast first")
        HeavyHitters(c, literalK(kExpr, "heavy_hitters")).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"heavy_hitters expects (col, k), got ${es.length} arguments")
    },
    "topk_by" -> {
      case Seq(s, i, kExpr) =>
        require(s.dataType == DoubleType && i.dataType == LongType,
          s"topk_by expects (DOUBLE score, BIGINT id, k); got " +
            s"(${s.dataType.simpleString}, ${i.dataType.simpleString}) — cast first")
        TopKByScore(s, i, literalK(kExpr, "topk_by")).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"topk_by expects (score, id, k), got ${es.length} arguments")
    },
    "bottomk_distinct" -> {
      case Seq(c) => BottomKDistinct(c, 256).toAggregateExpression()
      case Seq(c, kExpr) =>
        BottomKDistinct(c, literalK(kExpr, "bottomk_distinct")).toAggregateExpression()
      case es => throw new IllegalArgumentException(
        s"bottomk_distinct expects (col) or (col, k), got ${es.length} arguments")
    })

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (n, b) => reg.createOrReplaceTempFunction(n, b, "scala_udf") }
  }
}
