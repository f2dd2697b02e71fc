package graft.engine

import org.apache.spark.sql.DataFrame

/**
 * Deterministic release of the block-manager storage behind an eagerly
 * localCheckpoint'ed DataFrame. ContextCleaner reclaims these blocks only
 * when the driver garbage-collects the RDD — under a large heap that can
 * be never, and every refresh pins one delta-sized checkpoint, so a
 * long-running process (bench, streaming maintenance) would accumulate
 * dead blocks that squat on storage memory and contaminate later queries.
 * Callers free each checkpoint as soon as its last write completes
 * (the same discipline [[graft.operators.Components]] applies per round).
 */
private[graft] object Checkpoints {
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
