package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions

/** SQ8 scalar quantization: the vec_quantize/vec_dot_q expressions and
  * the quantize→integer-scan→exact-rerank search built on them. */
class QuantizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  VectorFunctions.register(spark)

  test("vec_quantize rounds to nearest and clamps to [-127, 127]") {
    val q = Seq(Tuple1(Seq(1.0, -1.0, 0.5, -0.5, 0.0, 2.0))).toDF("v")
      .select(call_function("vec_quantize",
        col("v").cast("array<double>"), lit(1.0)).cast("array<int>").as("q"))
      .as[Seq[Int]].head()
    // 0.5·127 = 63.5 → rint (half-even) → 64; 2.0 overshoots → clamp
    assert(q === Seq(127, -127, 64, -64, 0, 127))
  }

  test("vec_dot_q matches the integer dot computed in Scala") {
    val a = Seq(1, -2, 3, 100)
    val b = Seq(4, 5, -6, 100)
    val expected = a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
    val got = Seq((a, b)).toDF("a", "b")
      .select(call_function("vec_dot_q",
        col("a").cast("array<tinyint>"), col("b").cast("array<tinyint>")).as("d"))
      .as[Long].head()
    assert(got === expected)
  }

  test("vec_dot_q fails loud on a dimension mismatch") {
    val ex = intercept[Exception] {
      Seq((Seq(1, 2), Seq(1))).toDF("a", "b")
        .select(call_function("vec_dot_q",
          col("a").cast("array<tinyint>"), col("b").cast("array<tinyint>")))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("dimension mismatch")))
  }

  test("pq_adc sums the code-indexed LUT entries") {
    // m = 2 subspaces, ks = 3: codes (1, 2) pick lut[0*3+1] and lut[1*3+2]
    val lut = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0)
    val got = Seq((Seq(1, 2), lut)).toDF("codes", "lut")
      .select(call_function("pq_adc",
        col("codes").cast("array<tinyint>"), col("lut"), lit(3)).as("s"))
      .as[Double].head()
    assert(got === 20.0 + 60.0)
  }

  test("pq_adc fails loud on a lut/code size mismatch and an out-of-range code") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val exSize = intercept[Exception] {
      Seq((Seq(0, 1), Seq(1.0, 2.0, 3.0))).toDF("codes", "lut")
        .select(call_function("pq_adc",
          col("codes").cast("array<tinyint>"), col("lut"), lit(2))).collect()
    }
    assert(msgs(exSize).exists(_.contains("lut size")))
    val exRange = intercept[Exception] {
      Seq((Seq(0, 5), Seq(1.0, 2.0, 3.0, 4.0))).toDF("codes", "lut")
        .select(call_function("pq_adc",
          col("codes").cast("array<tinyint>"), col("lut"), lit(2))).collect()
    }
    assert(msgs(exRange).exists(_.contains("out of")))
  }

  test("PQ plumbing identity: encode + LUT + pq_adc equals the reconstructed sub-dot") {
    // pins the three index conventions against each other exactly:
    // encode's code := nearest book index, LUT flattening := m-major
    // k-minor, ADC read := lut[m·Ks + code[m]]. For ANY x, y:
    //   pq_adc(codes(x), lut(y)) == Σ_m dot(books[m][code_m(x)], sub_m(y))
    // — computed driver-side in the same summation order, so equality is
    // bit-exact, not approximate.
    import graft.operators.SimilarityQueries
    import graft.engine.Tables
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") < 40)
    val books = SimilarityQueries.pqCodebooks(e)
    val m = SimilarityQueries.PqM
    val sub = SimilarityQueries.PqSubDim
    // ks is corpus-scaled (pqKsFor); consumers derive it from the shape
    val ks = books(0).length
    val probe = e.filter(col("vec_id") === 3).select(col("v").as("pv"))
    val pv = probe.collect()(0).getSeq[Double](0).toArray
    val rows = e
      .select(col("vec_id"), SimilarityQueries.pqEncodeExpr(books, col("v")).as("codes"))
      .crossJoin(broadcast(probe))
      .withColumn("adc", call_function("pq_adc",
        col("codes"), SimilarityQueries.pqLutExpr(books, col("pv")), lit(ks)))
      .select("vec_id", "codes", "adc").collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      val codes = r.getSeq[Byte](1)
      assert(codes.length === m)
      assert(codes.forall(c => c >= 0 && c < ks))
      val expected = (0 until m).map { mi =>
        (0 until sub).map(i => pv(mi * sub + i) * books(mi)(codes(mi))(i)).sum
      }.sum
      assert(math.abs(r.getDouble(2) - expected) <= 1e-12 * math.max(1.0, math.abs(expected)),
        s"vec ${r.getLong(0)}: adc ${r.getDouble(2)} != reconstructed $expected")
    }
  }

  test("IVFADC plumbing identity: cell_residual + cell_dot + pq_recon_norm2 match driver math") {
    // pins the residual-encoding conventions against each other: residual
    // := v − cents[cid], reconstruction := cents[cid] + books[m][code_m],
    // qn² := |reconstruction|² summed i-within-m, cell_dot := dot(v,
    // cents[cid]) — each expression recomputed driver-side in the same
    // order, so equality is essentially bit-exact
    import graft.operators.SimilarityQueries
    import graft.engine.Tables
    import graft.functions.VectorFunctions
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") < 40)
    // the identity holds for ANY centroid model; use the first 6 vectors
    val cents: Array[Array[Double]] = e.orderBy("vec_id").limit(6)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    val cid = element_at(VectorFunctions.nearestCells(col("v"), cents, 1), 1)
    val resid = VectorFunctions.cellResidual(col("v"), cid, cents)
    val books = SimilarityQueries.pqCodebooks(e.select(col("vec_id"), resid.as("v")))
    val m = SimilarityQueries.PqM
    val sub = SimilarityQueries.PqSubDim
    val codes = SimilarityQueries.pqEncodeExpr(books, resid)
    val rows = e.select(col("vec_id"), col("v"), cid.as("cid"),
        resid.as("resid"), codes.as("codes"),
        VectorFunctions.pqReconNorm2(cid, codes, cents, books).as("qn2"),
        VectorFunctions.cellDot(col("v"), cid, cents).as("cd")).collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val c = r.getInt(2)
      val res = r.getSeq[Double](3).toArray
      val cs = r.getSeq[Byte](4)
      val dim = v.length
      // residual = v − cents[cid], elementwise
      (0 until dim).foreach(i => assert(res(i) === v(i) - cents(c)(i)))
      // |cents[cid] + recon(codes)|², i-within-m summation order
      var qn2 = 0.0
      (0 until m).foreach { mi =>
        (0 until sub).foreach { i =>
          val x = cents(c)(mi * sub + i) + books(mi)(cs(mi))(i)
          qn2 += x * x
        }
      }
      assert(math.abs(r.getDouble(5) - qn2) <= 1e-9 * math.max(1.0, qn2),
        s"vec ${r.getLong(0)}: qn2 ${r.getDouble(5)} != $qn2")
      val cd = (0 until dim).map(i => v(i) * cents(c)(i)).sum
      assert(math.abs(r.getDouble(6) - cd) <= 1e-9 * math.max(1.0, math.abs(cd)),
        s"vec ${r.getLong(0)}: cell_dot ${r.getDouble(6)} != $cd")
    }
  }

  test("vec_quantize refuses a non-positive scale") {
    val ex = intercept[Exception] {
      Seq(Tuple1(Seq(1.0))).toDF("v")
        .select(call_function("vec_quantize",
          col("v").cast("array<double>"), lit(0.0)))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("scale must be positive")))
  }

  test("incrementally-maintained SQ8 view: post-batch search recall at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{broadcast, call_function, round => rnd}
    // ground truth: exact top-k over the MODIFIED corpus (the %37
    // reversal / %41 tombstone batch the view's refresh path consumed)
    val e = graft.engine.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") % 41 =!= 0)
      .withColumn("v", when(col("vec_id") % 37 === 0, reverse(col("v"))).otherwise(col("v")))
      .withColumn("norm", sqrt(call_function("vec_dot", col("v"), col("v"))))
      .filter(col("norm") > 0)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("norm").as("pn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    val brute = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("cos", rnd(call_function("vec_dot", col("pv"), col("v")) / (col("pn") * col("norm")), 6))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val served = graft.operators.SimilarityQueries.sqTopKFromView(spark, dir)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    val recall = (brute & served).size.toDouble / brute.size
    assert(recall >= 0.95, s"maintained-SQ8 recall $recall below 0.95")
  }

  test("SQ8 refit gate: an out-of-range upsert re-materializes at the new scale, CDC contiguous") {
    import graft.engine.BucketedViewStore
    import graft.operators.SimilarityQueries
    val store = BucketedViewStore.temp(spark, 4)
    def vecs(rows: (Long, Seq[Double])*) = rows.toSeq.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val base = vecs(1L -> Seq(1.0, 0.5), 2L -> Seq(-0.5, 0.25))
    val scale0 = SimilarityQueries.sqBuild(store, base)
    assert(scale0 === 1.0)
    assert(store.epoch("emb_sq8_inc") === 0)
    // a component beyond the stored scale would CLAMP under refresh —
    // the exact gate must take the refit arm: full re-materialization at
    // the post-batch corpus's own scale, as the store's next epoch
    val ups = vecs(3L -> Seq(3.0, 1.0))
    val served = SimilarityQueries.sqApplyBatch(store, scale0, ups, None,
      base.unionByName(ups))
    assert(served === 3.0, s"refit must serve the post-batch scale, got $served")
    assert(store.epoch("emb_sq8_inc") === 1, "refit must be the next epoch")
    // CDC contiguity across the rebuild: the feed over (0, 1] is the full
    // retraction of the old snapshot + insertion of the new one — a
    // lagging consumer replays across the refit without a hole
    val feed = store.changesBetween("emb_sq8_inc", 0, 1)
    assert(feed.filter(col("change_type") === "delete").count() === 2)
    assert(feed.filter(col("change_type") === "insert").count() === 3)
    // stored codes decode at the REFIT scale: q(1.0 @ scale 3) = rint(127/3) = 42
    val q1 = store.get("emb_sq8_inc", 1L)
      .select(col("emit_value.q").cast("array<int>")).as[Seq[Int]].head()
    assert(q1 === Seq(42, 21))
    // and a within-range batch on the refit view takes the O(delta) arm
    val served2 = SimilarityQueries.sqApplyBatch(store, served,
      vecs(2L -> Seq(2.9, 0.0)), None, null)
    assert(served2 === served)
    assert(store.epoch("emb_sq8_inc") === 2)
  }

  test("PQ codebook refit gate: out-of-distribution batch re-fits; in-distribution refreshes O(delta)") {
    import graft.engine.BucketedViewStore
    import graft.operators.SimilarityQueries
    graft.functions.VectorFunctions.register(spark)
    val store = BucketedViewStore.temp(spark, 4)
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") < 100)
    val (books0, err0) = SimilarityQueries.pqIncBuild(store, base)
    assert(err0 > 0)
    assert(store.epoch("emb_pq_inc") === 0)
    // in-distribution batch (norm-preserving reversal — reconstructs like
    // any random vector under these codebooks): the O(delta) refresh arm
    val ups1 = base.filter(col("vec_id") < 5).withColumn("v", reverse(col("v")))
    val (books1, err1) = SimilarityQueries.pqApplyBatch(store, books0, err0, ups1, None,
      sys.error("refresh arm must not touch the full corpus"))
    assert(books1 eq books0, "in-distribution batch must keep the codebooks")
    assert(err1 === err0)
    assert(store.epoch("emb_pq_inc") === 1)
    // out-of-distribution batch (100x components): mean reconstruction
    // error explodes past PqRefitErrFactor x base — the re-fit arm, as
    // the store's next epoch with a contiguous CDC feed
    val ups2 = base.filter(col("vec_id") < 5)
      .withColumn("v", expr("transform(v, x -> x * 100.0)"))
    val after = base.filter(col("vec_id") >= 5).unionByName(ups2)
    val (books2, _) = SimilarityQueries.pqApplyBatch(store, books1, err1, ups2, None, after)
    assert(!(books2 eq books1), "gate must re-fit the codebooks")
    assert(store.epoch("emb_pq_inc") === 2, "re-fit must be the next epoch")
    // CDC contiguity across the rebuild: full retraction + reinsertion
    val feed = store.changesBetween("emb_pq_inc", 1, 2)
    assert(feed.filter(col("change_type") === "delete").count() === 100)
    assert(feed.filter(col("change_type") === "insert").count() === 100)
  }

  test("IVF-PQ composed refit gate: out-of-distribution batch re-fits BOTH tiers; in-distribution refreshes O(delta)") {
    import graft.engine.BucketedViewStore
    import graft.operators.SimilarityQueries
    graft.functions.VectorFunctions.register(spark)
    val store = BucketedViewStore.temp(spark, 4)
    val unit = "emb_ivfpq_gate"
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") < 100)
    val (cents0, books0, err0) = SimilarityQueries.ivfpqIncBuild(store, unit, base)
    assert(err0 > 0)
    assert(store.epoch(unit) === 0)
    // in-distribution batch (norm-preserving reversal): the O(delta)
    // refresh arm — both model families stay put, next epoch written
    val ups1 = base.filter(col("vec_id") < 5).withColumn("v", reverse(col("v")))
    val (cents1, books1, err1) = SimilarityQueries.ivfpqApplyBatch(store, unit,
      cents0, books0, err0, ups1, None,
      sys.error("refresh arm must not touch the full corpus"), 100L)
    assert((cents1 eq cents0) && (books1 eq books0),
      "in-distribution batch must keep both model families")
    assert(err1 === err0)
    assert(store.epoch(unit) === 1)
    // out-of-distribution batch (100x components): the reconstruction-
    // error gate fires — BOTH tiers re-fit, re-materialized as the next
    // epoch with a contiguous CDC feed
    val ups2 = base.filter(col("vec_id") < 5)
      .withColumn("v", expr("transform(v, x -> x * 100.0)"))
    val after = base.filter(col("vec_id") >= 5).unionByName(ups2)
    val (cents2, books2, _) = SimilarityQueries.ivfpqApplyBatch(store, unit,
      cents1, books1, err1, ups2, None, after, 100L)
    assert(!(books2 eq books1), "gate must re-fit the codebooks")
    assert(!(cents2 eq cents1), "gate must re-fit the coarse quantizer")
    assert(store.epoch(unit) === 2, "re-fit must be the next epoch")
    val feed = store.changesBetween(unit, 1, 2)
    assert(feed.filter(col("change_type") === "delete").count() === 100)
    assert(feed.filter(col("change_type") === "insert").count() === 100)
    // and the drift gate alone also forces the re-fit arm: a batch over
    // RefitDriftBound x corpusSize re-fits even though it reconstructs
    // fine under the stored codebooks
    val ups3 = base.filter(col("vec_id") >= 5).limit(60)
      .withColumn("v", reverse(col("v")))
    val (cents3, _, _) = SimilarityQueries.ivfpqApplyBatch(store, unit,
      cents2, books2, err0, ups3, None, after, 100L)
    assert(!(cents3 eq cents2), "drift gate must re-fit")
    assert(store.epoch(unit) === 3)
  }

  test("SQ8 top-k recall vs brute force at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val brute = SparkEntry.queries("sim_brute_topk")(spark, dir)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sq = graft.operators.SimilarityQueries.sqTopKPairs(spark, dir)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    val recall = (brute & sq).size.toDouble / brute.size
    // int8 rounding barely perturbs cosine order at 64 dims, and the
    // K·SqRefine refine margin absorbs what it does perturb
    assert(recall >= 0.95, s"SQ8 recall $recall below 0.95")
  }
}
