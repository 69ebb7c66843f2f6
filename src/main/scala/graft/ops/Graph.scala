package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pregel-shaped iterative graph computation — the dataflow shape of the
  * reference engine's time loop (SURVEY G4: per-step force exchange along
  * bond edges = message passing along `MLSBond.dat`). The physics kernel is
  * out of scope; the SHAPE — iterate(join messages along edges → aggregate
  * at vertices → update state) — is exactly this operator.
  *
  * Connected components by min-label propagation: every vertex starts
  * labeled with its own id; each round it adopts the minimum label in its
  * closed neighborhood; fixed point = component ids. Per round: one
  * shuffle join on vertex id + one min-aggregate — all DataFrame ops,
  * lineage cut per round with localCheckpoint.
  */
object Graph {

  /** Undirected edge frame (src, dst) → (node_id, component) at the fixed
    * point (or after `maxIter` rounds — label propagation converges in
    * O(diameter) rounds).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          checkEvery: Int = 3): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("node_id")).distinct()
      .withColumn("component", col("node_id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // messages: each node offers its label to its neighbors
      val offers = sym
        .join(labels, sym("src") === labels("node_id"))
        .select(col("dst").as("node_id"), col("component").as("offer"))
      val next = labels.select(col("node_id"), col("component").as("offer"))
        .unionAll(offers)
        .groupBy("node_id")
        .agg(min("offer").as("component"))
        .localCheckpoint()
      // the convergence probe is itself a job — amortize it over
      // `checkEvery` propagation rounds
      if ((iter + 1) % checkEvery == 0 || iter + 1 == maxIter) {
        val changed = next.join(labels.withColumnRenamed("component", "old"), "node_id")
          .filter(col("component") =!= col("old")).count()
        converged = changed == 0
      }
      labels = next
      iter += 1
    }
    labels
  }

  /** Degree table of an undirected edge frame. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node_id"))
      .unionAll(edges.select(col("dst").as("node_id")))
      .groupBy("node_id").agg(count(lit(1)).as("degree"))
}
