package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Blocked embedding near-dup: the exact within-block ranking vs the
  * bounded hyperplane-LSH sub-blocked path (the 100 TB mitigation the
  * soak run motivated — in-block pairs grow quadratically with block
  * size, sub-blocking bounds them at a measured recall cost).
  */
class SimilaritySpec extends SparkTestBase {

  // synthetic corpus with PLANTED near-dups: per block, `nBase` random
  // unit vectors, each followed by a tiny perturbation of itself
  private def planted(nBlocks: Int, nBase: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    def jitter(v: Array[Float]): Array[Float] = {
      val w = v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
      val n = math.sqrt(w.map(x => x * x).sum)
      w.map(x => (x / n).toFloat)
    }
    val rows = for {
      blk <- 0 until nBlocks
      i <- 0 until nBase
      base = unit()
      (v, j) <- Seq((base, 0), (jitter(base), 1))
    } yield ((blk * nBase + i) * 2L + j, v.toSeq, s"block$blk")
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("bounded sub-blocked ranking recovers planted near-dup pairs") {
    val emb = planted(nBlocks = 4, nBase = 25, dim = 32).cache()
    val k = 10
    val exact = Similarity.topPairsPerBlock(emb, "label", k)
      .select("block", "id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val bounded = Similarity.topPairsPerBlockBounded(emb, "label", k, bits = 8)
      .select("block", "id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // planted pairs (2i, 2i+1) are the top-ranked ones; the sub-blocked
    // path must recover the vast majority of the exact top-k
    val recall = exact.count(bounded.contains).toDouble / exact.size
    assert(recall >= 0.8, s"recall vs exact ranking was $recall")
    // and every planted pair it does return is genuinely near
    val plantedPairs = (0 until 4 * 25).map(i => (2L * i, 2L * i + 1)).toSet
    val foundPlanted = bounded.count(p => plantedPairs.contains((p._2, p._3)))
    assert(foundPlanted >= 30, s"found only $foundPlanted planted pairs in top-k")
  }

  test("two-stage bucket ranking == one global per-block window (exactness)") {
    import org.apache.spark.sql.expressions.Window
    val emb = planted(nBlocks = 3, nBase = 30, dim = 16).cache()
    val k = 7
    val got = Similarity.topPairsPerBlockBounded(emb, "label", k, bits = 6)
      .orderBy("block", "id_a", "id_b").collect().map(_.toSeq)
    // reference: same candidate set ranked with ONE global block window
    graft.functions.DotProductF.register(spark)
    val sig = Similarity.hyperplaneSig(emb, "embedding", 16, 6)
    val signed = emb.select(col("label").as("block"), col("vec_id"),
      col("embedding"), sig.as("sig"))
    val probes = signed.withColumn("bucket",
      explode(array((col("sig") +: (0 until 6).map(b =>
        col("sig").bitwiseXOR(lit(1L << b)))): _*)))
    val build = signed.select(col("block"), col("sig").as("bucket"),
      col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val pairs = probes.join(build, Seq("block", "bucket"))
      .filter(col("vec_id") < col("id_b"))
      .select(col("block"), col("vec_id").as("id_a"), col("id_b"),
        round(call_function("graft_dot_f", col("embedding"), col("emb_b")), 4)
          .as("cos_sim"))
      .distinct()
    val w = Window.partitionBy(col("block"))
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
    val want = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .orderBy("block", "id_a", "id_b").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("candidate generation stays an equi-join on (block, bucket) — no block cross product") {
    val emb = planted(nBlocks = 2, nBase = 20, dim = 16)
    val plan = Similarity.topPairsPerBlockBounded(emb, "label", 5, bits = 6)
      .queryExecution.executedPlan.toString
    // the join keys must include the bucket, not just the block
    assert(plan.contains("bucket"), s"bucket key missing from plan:\n$plan")
  }
}
