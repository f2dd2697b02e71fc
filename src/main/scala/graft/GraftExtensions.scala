package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * One-stop Spark integration: wire the whole engine into any session at
 * build time with
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *   // or: SparkSession.builder().withExtensions(new GraftExtensions) ...
 * }}}
 *
 * Injects (a) every native function — hashing/sketch/vector expressions
 * usable from plain SQL without any register() call — and (b) the
 * [[graft.plans.AsOfJoinStrategy]] planner strategy, so DataFrames built
 * by [[graft.plans.AsOfJoin.backward]] plan on sessions that never
 * touched `spark.experimental`. Library-internal code paths call the
 * per-session `register(...)` helpers instead; this class exists for
 * deployments where the session builder is the only hook (notebooks,
 * job servers, spark-submit).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    val all = functions.Hashes.builders ++
      functions.Sketches.builders ++
      functions.QuantileSketch.builders ++
      functions.KmvSketch.builders ++
      functions.MgSketch.builders ++
      functions.VectorFunctions.builders ++
      functions.Bloom.builders ++
      functions.BytewiseKey.builders
    all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
  }
}
