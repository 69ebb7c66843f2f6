package graft.ops

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.formats.DeckCodec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {

  test("connected components: known small graphs") {
    import spark.implicits._
    // two components {0,1,2,3} and {10,11}, plus a self-contained {20,21}
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
      .toDF("src", "dst")
    val cc = Graph.connectedComponents(edges)
    val byComp = cc.groupBy("component").agg(collect_set("node_id").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(byComp(0L) === Set(0L, 1L, 2L, 3L))
    assert(byComp(10L) === Set(10L, 11L))
    assert(byComp(20L) === Set(20L, 21L))
  }

  test("components partition the vertex set; labels are component minima") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (0 until 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val cc = Graph.connectedComponents(edges)
    val n = cc.count()
    assert(cc.select(countDistinct("node_id")).head().getLong(0) === n)
    // each component's label equals the min node id in it
    val bad = cc.groupBy("component").agg(min("node_id").as("m"))
      .filter(col("component") =!= col("m")).count()
    assert(bad === 0)
  }

  test("real bond graph: MLSBond.dat components and degrees") {
    val path = "/root/reference/UniaxialCompressionTest/MLSBond.dat"
    assume(Files.exists(Paths.get(path)))
    val edges = DeckCodec.readBonds(spark, path)
    val deg = Graph.degrees(edges)
    assert(deg.agg(sum("degree")).head().getLong(0) === 2 * 13812)
    val cc = Graph.connectedComponents(edges, maxIter = 30)
    val nComponents = cc.select(countDistinct("component")).head().getLong(0)
    val nVertices = cc.count()
    assert(nVertices > 0 && nComponents >= 1 && nComponents < nVertices)
    // every bonded pair ends in the same component
    val lbl = cc.withColumnRenamed("node_id", "v")
    val crossEdges = edges
      .join(lbl, edges("src") === lbl("v")).withColumnRenamed("component", "c1").drop("v")
      .join(lbl, edges("dst") === lbl("v")).withColumnRenamed("component", "c2")
      .filter(col("c1") =!= col("c2")).count()
    assert(crossEdges === 0)
  }
}
