package graft

import org.apache.spark.sql.SparkSession

/** Dev-only measurement runner behind the PQ-family doc bounds
  * ([[graft.operators.SimilarityQueries.pqMeasuredRecall]]): prints the
  * measured recall of each PQ serving path against its exact ground
  * truth for one corpus dir. Test scope — never ships with the library.
  *
  *   sbt> Test/runMain graft.RecallProbe /root/testdata/sf0.01
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = operators.SimilarityQueries.pqMeasuredRecall(spark, dir)
    println(s"RECALL $dir -> " + r.toSeq.sortBy(_._1)
      .map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
    spark.stop()
  }
}
