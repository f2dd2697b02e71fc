package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType,
  ShortType, TimestampNTZType, TimestampType}

/**
 * Native backward as-of join — the whole-operator Catalyst extension path
 * (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`): for every left
 * (probe) row, attach the LAST right (build) row with the same key and
 * `rightTime <= leftTime`, or nulls when none exists. This is the "most
 * recent state at event time" join every event pipeline writes (price at
 * trade time, last click before purchase).
 *
 * Why a custom operator when the engine already has the union+window
 * spelling (`join_asof`): that spelling shuffles probe and build rows
 * into ONE sorted relation and carries every probe row through window
 * state; this one is a streaming per-partition merge — each side is
 * shuffled once on its own key, sorted `(key, time)`, and joined with
 * O(1) state (one buffered build row) and zero window machinery. Same
 * result, one fewer union, and the merge never materializes a partition.
 *
 * Scale shape: `requiredChildDistribution` co-partitions the sides on the
 * join key (Catalyst inserts the exchanges and reuses existing ones —
 * bucketed or pre-partitioned inputs shuffle nothing), sort is per
 * partition, and the merge is a single forward pass over both sorted
 * streams. Skewed keys fall under AQE's shuffle handling like any
 * sort-merge join.
 *
 * Reference anchor: the reference's query layer composes ordered scans
 * with per-row pipelines (`/root/reference/index.js:13-94`); an as-of
 * attach is the two-stream generalization its users hand-roll with
 * `asyncMap` lookups — here it is one declarative operator.
 */
object AsOfJoin {

  /** Backward (inclusive) as-of join.
    *
    * @param left      probe side — every row appears exactly once in the output
    * @param right     build side — contributes its most recent row per probe,
    *                  its columns null-extended when no row qualifies
    * @param leftOn    equi-key column names on the probe side
    * @param rightOn   equi-key column names on the build side (positional with `leftOn`)
    * @param leftTime  probe event-time column
    * @param rightTime build event-time column
    * @param rightTie  build columns breaking ties among equal `(key, time)` build
    *                  rows: the row LARGEST under ascending `rightTie` order wins
    *                  (matches `ORDER BY time DESC, tie DESC LIMIT 1`)
    *
    * Null semantics: a null in any probe key or in the probe time never
    * matches (null-extended output, like SQL equality); build rows with a
    * null key or null time are ignored.
    */
  def backward(
      left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTime: String, rightTime: String,
      rightTie: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftOn, rightOn, leftTime, rightTime, rightTie,
      forward = false, tolerance)

  /** Forward (inclusive) as-of join: for every probe row, the FIRST build
    * row with the same key and `rightTime >= leftTime` — "next state at or
    * after event time" (next purchase after a click, next maintenance
    * window after an alert). Ties among equal `(key, time)` build rows
    * resolve to the row SMALLEST under ascending `rightTie` order
    * (matches `ORDER BY time ASC, tie ASC LIMIT 1` — the mirror image of
    * [[backward]]'s largest-wins rule, both being "closest first").
    */
  def forward(
      left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTime: String, rightTime: String,
      rightTie: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftOn, rightOn, leftTime, rightTime, rightTie,
      forward = true, tolerance)

  /** NEAREST as-of join (pandas merge_asof's third direction): for every
    * probe row, the build row minimizing |rightTime - leftTime|, distance
    * ties resolved toward the BACKWARD candidate, each side keeping its
    * own tie rule (backward: largest under `rightTie`; forward:
    * smallest). The merge keeps the same O(1) state - the buffered
    * backward match plus the stream head IS the forward candidate.
    * Distance needs a physical-long time view, so the time columns must
    * be integral, timestamp, or date (the [[backward]]/[[forward]]
    * tolerance requirement, here unconditional). `tolerance` bounds the
    * distance per side before the choice. */
  def nearest(
      left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTime: String, rightTime: String,
      rightTie: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftOn, rightOn, leftTime, rightTime, rightTie,
      forward = false, tolerance, nearest = true)

  /** Shared builder. `tolerance` (if set) bounds the match distance
    * inclusively — backward: `leftTime - rightTime <= tolerance`; forward:
    * `rightTime - leftTime <= tolerance` — expressed in the time column's
    * native physical units (microseconds for timestamps, days for dates,
    * the value itself for integral columns). Requires an integral,
    * timestamp, or date time column on both sides. */
  private def join(
      left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTime: String, rightTime: String,
      rightTie: Seq[String],
      forward: Boolean, tolerance: Option[Long],
      nearest: Boolean = false): DataFrame = {
    require(leftOn.nonEmpty && leftOn.length == rightOn.length,
      s"asof join: key lists must be non-empty and same-length, got $leftOn / $rightOn")
    require(tolerance.forall(_ >= 0L),
      s"asof join: tolerance must be non-negative, got $tolerance")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    // a self-join's two subtrees share attribute ids, which would make
    // output binding ambiguous (DataFrame.join dedups in the analyzer;
    // a custom node must do it itself) — re-alias the build side fresh
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rAnalyzed.outputSet).isEmpty) rAnalyzed
      else Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    val resolver = spark.sessionState.conf.resolver
    def resolve(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: column '$name' not found on $side side " +
            s"(${plan.output.map(_.name).mkString(", ")})"))
    val lTimeAttr = resolve(lPlan, leftTime, "probe")
    val rTimeAttr = resolve(rPlan, rightTime, "build")
    // fail at build time, not mid-job: tolerance arithmetic needs a
    // physical-long view of the time columns
    if (tolerance.isDefined || nearest) {
      AsOfJoinExec.timeAsLong(lTimeAttr.dataType)
      AsOfJoinExec.timeAsLong(rTimeAttr.dataType)
    }
    Shims.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      leftOn.map(resolve(lPlan, _, "probe")),
      rightOn.map(resolve(rPlan, _, "build")),
      lTimeAttr, rTimeAttr,
      rightTie.map(resolve(rPlan, _, "build")),
      forward, tolerance, nearest))
  }

  /** Idempotently register the planner strategy on an existing session
    * (builder-time users get it from [[graft.GraftExtensions]] instead). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }
}

/** Logical as-of join (backward or forward, optional tolerance): pure
  * structure — all semantics live in the physical operator. Output =
  * probe columns ++ build columns (nullable: the no-match case
  * null-extends the build side). */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Seq[Expression],
    forward: Boolean = false,
    tolerance: Option[Long] = None,
    nearest: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def maxRows: Option[Long] = left.maxRows
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `spark.experimental.extraStrategies` or [[graft.GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, fwd, tol, near) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, fwd, tol, near,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOfJoinExec {
  /** Physical-long view of a time column for tolerance arithmetic:
    * timestamps are stored as micros, dates as days, integrals as
    * themselves. Throws for types with no meaningful long distance. */
  def timeAsLong(dt: DataType): InternalRow => Long = dt match {
    case TimestampType | TimestampNTZType | LongType => r => r.getLong(0)
    case IntegerType | DateType => r => r.getInt(0).toLong
    case ShortType => r => r.getShort(0).toLong
    case other => throw new IllegalArgumentException(
      s"asof join: tolerance requires an integral, timestamp, or date time column, got $other")
  }
}

/**
 * Physical as-of join: requires both children clustered on their keys
 * and sorted `(key..., time, [tie...])` ascending — Catalyst inserts
 * (or reuses) the exchanges and sorts — then merges each co-partition in
 * one forward pass. State per partition is ONE buffered build row, so
 * memory is O(1) regardless of group size. Backward takes the last
 * build row at-or-before the probe time (ascending tie ⇒ largest tie
 * wins); forward takes the first at-or-after (smallest tie wins).
 * `tolerance` (time-column native units) bounds the distance
 * inclusively and only ever FILTERS the chosen row — the closest
 * qualifying row is by construction the one buffered.
 *
 * Not codegen'd (a bespoke two-iterator merge); both inputs arrive
 * through whole-stage-codegen'd sort stages, and the per-row work here
 * is two key projections and at most one row copy.
 */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Seq[Expression],
    forward: Boolean,
    tolerance: Option[Long],
    nearest: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTie)).map(SortOrder(_, Ascending)))

  // probe-side partitioning survives: each output row is a probe row
  // extended with build columns, produced in probe order per partition
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    val fwd = forward
    val tol = tolerance
    val near = nearest
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      // physical-long time views: tolerance filtering and the nearest
      // distance comparison both need them
      val needLong = tol.isDefined || near
      val lTimeLong =
        if (needLong) AsOfJoinExec.timeAsLong(lTimeExpr.dataType) else null
      val rTimeLong =
        if (needLong) AsOfJoinExec.timeAsLong(rTimeExpr.dataType) else null
      // bind against NULLABLE right attrs: the no-match case null-extends
      // the build side, and binding against the children's non-nullable
      // schema would elide the null checks and read garbage zeros
      val resultProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the un-consumed head of the build stream (copied: iterator rows
        // and projection buffers are reused by Spark)
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: UnsafeRow = _
        private var rDone = false
        // backward state: best build row so far for the key it was matched
        // under, plus its time row for the tolerance check
        private var matched: InternalRow = _
        private var matchedKey: UnsafeRow = _
        private var matchedTime: UnsafeRow = _

        private def pullRight(): Unit = {
          var pulled = false
          while (!pulled && !rDone) {
            if (rIter.hasNext) {
              val r = rIter.next()
              val k = rKeyProj(r)
              val t = rTimeProj(r)
              // build rows with null keys or null time can never match
              if (!k.anyNull && !t.isNullAt(0)) {
                rRow = r.copy(); rKey = k.copy(); rTime = t.copy()
                pulled = true
              }
            } else { rDone = true; rRow = null; rKey = null; rTime = null }
          }
        }

        // prime the build head before the first probe row
        pullRight()

        override def hasNext: Boolean = lIter.hasNext

        // the chosen row is by construction the closest qualifier, so
        // tolerance only filters it; distance is non-negative either way
        private def withinTol(dist: => Long): Boolean =
          tol.isEmpty || dist <= tol.get

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          val probeOk = !lKey.anyNull && !lTime.isNullAt(0)
          var out: InternalRow = null
          if (near) {
            // NEAREST: run the backward advancement (equal-time rows fold
            // into `matched`, so distance-0 cases resolve backward by
            // construction); the surviving head is then exactly the FIRST
            // same-key row strictly after the probe - the forward
            // candidate with its least-tie rule - and an O(1) distance
            // comparison picks the closer in-tolerance side, ties backward.
            if (matched != null && keyOrd.compare(matchedKey, lKey) != 0) matched = null
            if (probeOk) {
              var advancing = true
              while (advancing && rRow != null) {
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) pullRight()
                else if (c == 0 && timeOrd.compare(rTime, lTime) <= 0) {
                  matched = rRow; matchedKey = rKey; matchedTime = rTime
                  pullRight()
                } else advancing = false
              }
              val lT = lTimeLong(lTime)
              val backDist = if (matched != null) lT - rTimeLong(matchedTime) else 0L
              val backOk = matched != null && withinTol(backDist)
              val headSameKey = rRow != null && keyOrd.compare(rKey, lKey) == 0
              val fwdDist = if (headSameKey) rTimeLong(rTime) - lT else 0L
              val fwdOk = headSameKey && withinTol(fwdDist)
              if (backOk && (!fwdOk || backDist <= fwdDist)) out = matched
              else if (fwdOk) out = rRow
            }
          } else if (fwd) {
            // FORWARD: discard dead keys and same-key rows strictly before
            // this probe time (later probes are >= this one, so they can't
            // want them either); the surviving head matches iff same key
            if (probeOk) {
              var advancing = true
              while (advancing && rRow != null) {
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0 || (c == 0 && timeOrd.compare(rTime, lTime) < 0)) pullRight()
                else advancing = false
              }
              if (rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
                  withinTol(rTimeLong(rTime) - lTimeLong(lTime)))
                out = rRow // head stays: it may serve later probes too
            }
          } else {
            // BACKWARD: a stale match from a previous key is no match at all
            if (matched != null && keyOrd.compare(matchedKey, lKey) != 0) matched = null
            if (probeOk) {
              // advance the build stream through everything at-or-before
              // this probe position; the last same-key qualifier sticks
              var advancing = true
              while (advancing && rRow != null) {
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) pullRight() // dead key: probe keys only grow
                else if (c == 0 && timeOrd.compare(rTime, lTime) <= 0) {
                  matched = rRow; matchedKey = rKey; matchedTime = rTime
                  pullRight()
                } else advancing = false
              }
              if (matched != null &&
                  withinTol(lTimeLong(lTime) - rTimeLong(matchedTime)))
                out = matched
            }
          }
          numOutputRows += 1
          resultProj(joined(l, if (out != null) out else nullRight))
        }
      }
    }
  }
}
