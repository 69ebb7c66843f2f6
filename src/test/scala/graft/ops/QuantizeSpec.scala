package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization: grid-bounded reconstruction error, exact
  * handling of constant dimensions, 4× storage reduction, and the recall
  * cost of searching reconstructed vectors (asymmetric distance) — the
  * contract that lets a 100 TB embedding corpus serve from a quarter of
  * the bytes.
  */
class QuantizeSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, Sf0001).cache()

  test("decode(encode(x)) is within half a grid step per dimension") {
    val params = Quantize.fitSq8(emb)
    val rt = emb.select(col("vec_id"), col("embedding"),
        Quantize.sq8Decode(emb,
          Quantize.sq8Encode(emb, col("embedding"), params),
          params).as("rec"))
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("rec"),
            (x, r) => abs(x - r)), lit(0.0d),
          (acc, e) => greatest(acc, e.cast("double"))).as("max_err"))
    val worst = rt.agg(max("max_err")).head().getDouble(0)
    // half a grid step plus float arithmetic slack
    val bound = params.scale.max / 2.0 + 1e-4
    assert(worst <= bound, s"max reconstruction error $worst > $bound")
  }

  test("constant dimensions (zero scale) decode exactly; codes are 1 byte/dim") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(1.5f, -2.0f, 7.0f)),
      (1L, Seq(1.5f, 3.0f, 7.0f)),
      (2L, Seq(1.5f, 0.5f, 7.0f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val params = Quantize.fitSq8(df)
    assert(params.scale(0) == 0f && params.scale(2) == 0f)
    val rec = df.select(col("vec_id"),
        length(Quantize.sq8Encode(df, col("embedding"), params)).as("nbytes"),
        Quantize.sq8Decode(df,
          Quantize.sq8Encode(df, col("embedding"), params), params).as("rec"))
      .orderBy("vec_id").collect()
    rec.foreach { r =>
      assert(r.getInt(1) === 3, "codes must be exactly dim bytes")
      val v = r.getSeq[Float](2)
      assert(v(0) === 1.5f && v(2) === 7.0f,
        s"constant dims must reconstruct exactly, got $v")
    }
  }

  test("encoding is deterministic and partitioning-independent") {
    val params = Quantize.fitSq8(emb)
    def codes(parts: Int) =
      Quantize.encodeCorpus(emb.repartition(parts), params)
        .select(col("vec_id"), hex(col("codes")).as("h"))
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(codes(2).sameElements(codes(7)))
  }

  test("quantized top-k recall vs exact search stays high") {
    val params = Quantize.fitSq8(emb)
    val codes = Quantize.encodeCorpus(emb.filter(col("vec_id") =!= 0L), params)
    val probe = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("probe_emb"))
    val quant = Quantize.topKQuantized(codes, probe, k = 10, params)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.cosineTopK(emb, probeId = 0L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.count(quant.contains).toDouble / exact.size
    assert(recall >= 0.7, s"recall@10 of SQ8 search was $recall")
  }

  test("quantized search is a zero-shuffle scoring pass (plan)") {
    val params = Quantize.fitSq8(emb)
    val codes = Quantize.encodeCorpus(emb, params)
    val probe = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("probe_emb"))
    val p = Quantize.topKQuantized(codes, probe, k = 10, params)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrdered:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"scoring must not shuffle the corpus:\n$p")
  }
}
