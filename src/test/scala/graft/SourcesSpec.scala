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

  test("binary payloads ingest from raw files via the binaryFile source") {
    // the multimodal ingest path at 100 TB: opaque image/audio blobs land
    // as files; `binaryFile` reads (path, length, content) so the
    // engine's binary-column machinery (MultimodalQueries) starts from
    // the same shape a parquet-packed corpus provides
    val path = tmp("graft-bin-")
    val payload = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3)
    Files.write(java.nio.file.Paths.get(path, "blob1.bin"), payload)
    Files.write(java.nio.file.Paths.get(path, "blob2.bin"), Array[Byte](9, 8))
    val src = spark.read.format("binaryFile").load(path)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"), col("content"))
    val rows = src.as[(String, Long, Array[Byte])].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq("blob1.bin", "blob2.bin"))
    assert(rows(0)._2 === 7L && rows(0)._3.toSeq === payload.toSeq)
    // and the blob round-trips into a stored map view as an opaque value
    val store = ViewStore.temp(spark)
    val idx = MapIndex.columns("io_bin")(col("name"),
      array(emit(col("name"), col("content"))))
    val view = idx.materialize(src, store)
    assert(view.get("blob1.bin").as[Array[Byte]].head().toSeq === payload.toSeq)
  }
}
