package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Product quantization: codes are deterministic and partitioning-
  * independent, ADC scoring is exactly the reconstruction dot product,
  * storage is m bytes/vector, small-corpus codebooks pad safely, and
  * end-to-end recall against exact search is measured and bounded.
  */
class PqSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, Sf0001).cache()
  private lazy val model = Pq.fit(emb, m = 8, iters = 2)

  private def probeVec(id: Long): Array[Float] =
    emb.filter(col("vec_id") === id).select("embedding")
      .head().getSeq[Float](0).toArray

  test("codes: m bytes per vector, deterministic, partitioning-independent") {
    def codesOf(parts: Int) =
      Pq.encodeCorpus(emb.repartition(parts), model)
        .select(col("vec_id"), hex(col("pq_codes")).as("h"))
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val a = codesOf(2)
    assert(a.sameElements(codesOf(7)))
    val nbytes = Pq.encodeCorpus(emb, model)
      .select(length(col("pq_codes"))).distinct().collect().map(_.getInt(0))
    assert(nbytes.toSeq === Seq(model.m), s"codes must be m bytes: $nbytes")
  }

  test("ADC score equals dot(probe, reconstruction) for every row") {
    val probe = probeVec(0L)
    val lut = Pq.adcLut(model, probe)
    val rows = Pq.encodeCorpus(emb, model)
      .select(col("vec_id"), col("pq_codes")).collect()
    rows.take(200).foreach { r =>
      val codes = r.getAs[Array[Byte]](1)
      // reconstruction dot computed independently in scala
      var want = 0.0
      for (i <- 0 until model.m) {
        val c = codes(i) + 128
        val off = (i * model.k + c) * model.dsub
        for (j <- 0 until model.dsub)
          want += probe(i * model.dsub + j).toDouble *
            model.codebook(off + j).toDouble
      }
      val got = (0 until model.m).map(i => lut(i * model.k + (codes(i) + 128))).sum
      assert(math.abs(got - want) < 1e-9, s"vec ${r.getLong(0)}: $got vs $want")
    }
  }

  test("tiny corpus (fewer rows than 256 codes): padded codebook, codes in range") {
    val tiny = emb.limit(40).cache()
    val small = Pq.fit(tiny, m = 8, iters = 1)
    assert(small.k === 256, "codebook must pad to the full code range")
    val codes = Pq.encodeCorpus(tiny, small)
      .select("pq_codes").collect().map(_.getAs[Array[Byte]](0))
    // only the <=40 trained entries may ever be chosen: padded entry-0
    // duplicates lose the strict-< argmin tie
    assert(codes.forall(_.forall(b => (b + 128) < 40)),
      "padded codebook entries must never win the argmin")
  }

  test("ADC top-k recall vs exact search is high at 32x compression") {
    val codes = Pq.encodeCorpus(emb.filter(col("vec_id") =!= 0L), model)
      .localCheckpoint()
    val probe = probeVec(0L)
    val got = Pq.adcTopK(codes, probe, k = 10, model)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.cosineTopK(emb, probeId = 0L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    // PQ at 8 bytes/vector is lossy — the bound is the measured floor on
    // the fixture, not a near-1.0 SQ8-style bound (QuantBench records the
    // ladder: float -> SQ8 4x -> PQ 32x with their recalls)
    assert(recall >= 0.4, s"recall@10 of PQ ADC search was $recall")
  }

  test("ADC search plans as a zero-shuffle TakeOrdered pass") {
    val codes = Pq.encodeCorpus(emb, model)
    val p = Pq.adcTopK(codes, probeVec(0L), k = 10, model)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-k must TakeOrdered:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"ADC scoring must not shuffle the corpus:\n$p")
  }
}
