package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bloom

/** Bloom build/probe: the no-false-negative guarantee, bounded false
  * positives, partitioning invariance, and argument contracts. */
class BloomSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def buildBloom(ids: Seq[Long], parts: Int, n: Long = 4096, fpp: Double = 0.01): Array[Byte] = {
    Bloom.register(spark)
    ids.toDF("x").repartition(parts)
      .agg(expr(s"bloom_build(x, $n, $fpp)")).head.getAs[Array[Byte]](0)
  }

  test("bloom: zero false negatives, bounded false positives") {
    Bloom.register(spark)
    val members = (0L until 2000L).map(_ * 7919L + 13L)
    val bytes = buildBloom(members, parts = 4)
    val probesIn = members.toDF("x")
      .select(call_function("bloom_contains", lit(bytes), col("x")).as("hit"))
      .agg(sum(when(col("hit"), 1L).otherwise(0L))).head.getLong(0)
    assert(probesIn === 2000L, "a bloom filter must never report false negatives")
    val nonMembers = (0L until 10000L).map(_ * 104729L + 7L).filterNot(members.toSet)
    val fps = nonMembers.toDF("x")
      .select(call_function("bloom_contains", lit(bytes), col("x")).as("hit"))
      .agg(sum(when(col("hit"), 1L).otherwise(0L))).head.getLong(0)
    // fpp=0.01 at half capacity; 5x margin over the nominal rate
    assert(fps.toDouble / nonMembers.size < 0.05,
      s"false-positive rate ${fps.toDouble / nonMembers.size} out of bounds")
  }

  test("bloom: serialized filter is partitioning-invariant (OR-merge is exact)") {
    val ids = (0L until 3000L).map(_ * 31L)
    val one = buildBloom(ids, parts = 1)
    val four = buildBloom(ids, parts = 4)
    val nine = buildBloom(ids, parts = 9)
    assert(java.util.Arrays.equals(one, four) && java.util.Arrays.equals(four, nine),
      "the merged bitset must not depend on how rows were partitioned")
  }

  test("bloom: argument contracts fail loud") {
    Bloom.register(spark)
    val e1 = intercept[Exception] {
      Seq(("a", 1L)).toDF("s", "x").agg(expr("bloom_build(s, 100)")).collect()
    }
    assert(e1.getMessage.contains("BIGINT"))
    val e2 = intercept[Exception] {
      // non-foldable first argument: per-row filters are not a bloom probe
      Seq((Array[Byte](1), 1L)).toDF("b", "x")
        .select(call_function("bloom_contains", col("b"), col("x"))).collect()
    }
    assert(e2.getMessage.contains("literal"))
    val e3 = intercept[Exception] {
      Seq(1L).toDF("x").agg(expr("bloom_build(x, 0)")).collect()
    }
    assert(e3.getMessage.contains("positive"))
  }

  test("bloom sketch geometry: sizing follows the optimum and stays word-aligned") {
    val s = Bloom.BloomSketch.sized(1000, 0.01)
    // m ≈ 9585 bits → 150 words; k ≈ 7
    assert(s.words.length === 150)
    assert(s.k === 7)
    val tiny = Bloom.BloomSketch.sized(1, 0.5)
    assert(tiny.words.length >= 1 && tiny.k >= 1)
  }
}
