package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the scale path for similarity search (north star). Brute-force
  * cosine ([[Similarity.cosineTopK]]) scans the whole corpus per probe; IVF
  * scans only the `nprobe` most promising of `nlist` coarse cells:
  *
  *  1. TRAIN: `nlist` coarse centroids by seeded k-means (Lloyd iterations
  *     — the same algorithm as the mesh pipeline's G1, here over vectors).
  *     Centroid table is dimension-sized (`nlist` rows) and broadcast.
  *  2. ASSIGN: each vector joins its nearest centroid → `(cell, vec)`
  *     inverted file, persisted as cell-partitioned data in real use.
  *  3. SEARCH: a probe ranks cells by centroid similarity, takes `nprobe`,
  *     and re-ranks EXACTLY (codegen dot product) only within those cells —
  *     an equi-join on cell id, never a corpus scan.
  *
  * Search cost drops by ~nlist/nprobe at a recall governed by nprobe —
  * the standard IVF trade (see FAISS-style IVF-Flat in the literature).
  */
object IvfIndex {

  final case class Model(centroids: DataFrame, assignments: DataFrame)

  private def dotF(spark: SparkSession) = {
    graft.functions.DotProductF.register(spark)
  }

  /** Train `nlist` centroids with `iters` Lloyd rounds (seeded init by
    * hashing vec ids — deterministic), then assign every vector to its
    * nearest centroid. Centroids stay float arrays so the codegen dot
    * product applies end to end.
    */
  def build(emb: DataFrame, nlist: Int, iters: Int = 3, seed: Long = 42L): Model = {
    val spark = emb.sparkSession
    dotF(spark)
    // deterministic init: rank vectors by a seeded hash, take nlist
    var centroids = emb
      .withColumn("__r", xxhash64(col("vec_id"), lit(seed)))
      .orderBy("__r").limit(nlist)
      .withColumn("cell", row_number().over(Window.orderBy("__r")).cast("long") - 1)
      .select(col("cell"), col("embedding").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assign(emb, centroids)
      // new centroid = element-wise mean of member vectors (posexplode +
      // regroup keeps it a DataFrame op at any corpus size)
      centroids = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg(col("x")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .select(col("cell"),
          expr("transform(dims, d -> cast(d.m as float))").as("centroid"))
        .localCheckpoint()
    }
    Model(centroids, assign(emb, centroids).localCheckpoint())
  }

  /** Nearest-centroid assignment: broadcast the (nlist-row) centroid table,
    * score with the fused dot product, keep the argmax per vector.
    */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    dotF(emb.sparkSession)
    val w = Window.partitionBy("vec_id").orderBy(col("score").desc, col("cell"))
    emb.crossJoin(broadcast(centroids))
      .withColumn("score", expr("graft_dot_f(embedding, centroid)"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "score", "centroid")
  }

  /** ANN top-k for one probe vector id: rank cells by centroid score, probe
    * the best `nprobe`, exact re-rank inside them. Same output contract as
    * [[Similarity.cosineTopK]] (vec_id, cos_sim rounded to 4dp, ordered).
    */
  def searchTopK(model: Model, probeId: Long, k: Int, nprobe: Int): DataFrame = {
    val spark = model.centroids.sparkSession
    dotF(spark)
    val probe = model.assignments.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe_emb"))
    val cells = model.centroids.crossJoin(broadcast(probe))
      .withColumn("cscore", expr("graft_dot_f(centroid, probe_emb)"))
      .orderBy(col("cscore").desc, col("cell"))
      .limit(nprobe)
      .select("cell")
    model.assignments
      .join(broadcast(cells), Seq("cell")) // only nprobe cells scanned
      .filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(expr("graft_dot_f(embedding, probe_emb)"), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
