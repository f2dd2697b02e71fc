package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{MapIndex, Tables, ViewStore}
import graft.engine.MapIndex.emit

/** Source/sink coverage beyond the parquet default (SURVEY.md §2.2 row 1):
  * the engine's relations read and write json and csv losslessly. */
class SourcesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("materialized view round-trips through json") {
    val store = ViewStore.temp(spark)
    val idx = MapIndex.columns("io_json")(col("key"), array(emit(col("key"), col("v"))))
    val view = idx.materialize(Seq("a" -> 1, "b" -> 2).toDF("key", "v"), store)
    val path = tmp("graft-json-")
    view.df.write.mode("overwrite").json(path)
    val back = spark.read.json(path)
    assert(back.count() === 2)
    assert(back.select("emit_key").as[String].collect().sorted === Array("a", "b"))
  }

  test("query results round-trip through csv with header schema") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val agg = li.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
    val path = tmp("graft-csv-")
    agg.write.mode("overwrite").option("header", "true").csv(path)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    assert(back.as[(String, Long)].collect().toMap ===
      agg.as[(String, Long)].collect().toMap)
  }

  test("query results round-trip through orc") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val agg = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
    val path = tmp("graft-orc-")
    agg.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.as[(String, Long, Double)].collect().sortBy(_._1).toSeq ===
      agg.as[(String, Long, Double)].collect().sortBy(_._1).toSeq)
  }

  test("source entries ingest from json documents (schema-free value model)") {
    val path = tmp("graft-src-")
    Files.writeString(java.nio.file.Paths.get(path, "data.json"),
      """{"key":"asdf","value":{"test":123}}
        |{"key":"qwer","value":{"test":7}}""".stripMargin)
    val src = spark.read.json(path).select(col("key"), col("value.test").as("test"))
    val store = ViewStore.temp(spark)
    val idx = MapIndex.columns("io_src")(col("key"),
      array(emit(lit("test"), col("test"))))
    val view = idx.materialize(src, store)
    assert(view.get("test").as[Long].collect().sorted === Array(7L, 123L))
  }
}
