package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-vs-sampled triangle-count soak on the part co-occurrence graph —
  * the SCALE.md evidence behind q_triangle_count's 1-in-5 subgraph
  * choice: the full graph is per-order-clique dense, so its wedge count
  * (the lower bound of exact triangle work) is intrinsically ~2 orders
  * above the subgraph's. Same operator, same plan, both exact.
  */
object TriangleSoak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def edges(sample: Boolean) = {
      val li0 = graft.Tables.lineitem(spark, dir)
      val li = (if (sample) li0.filter(pmod(col("l_partkey"), lit(5)) === 0) else li0)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), Seq("l_orderkey"))
        .filter(col("src") < col("dst")).select("src", "dst").distinct()
    }
    Seq(true, false).foreach { sample =>
      val t0 = System.nanoTime()
      val r = graft.ops.Graph.triangleCount(edges(sample)).head()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"${if (sample) "1-in-5 subgraph" else "full graph     "}: nodes=${r.getLong(0)}%6d edges=${r.getLong(1)}%8d triangles=${r.getLong(2)}%10d wall=$wall%6.1fs")
    }
    spark.stop()
  }
}
