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

  test("path graph with diameter >> maxIter converges (contraction, not propagation)") {
    import spark.implicits._
    // a 300-node path has diameter 299: naive min-label propagation needs
    // 299 rounds; large-star/small-star contraction needs O(log n)
    val n = 300
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val r = Graph.connectedComponentsResult(edges, maxIter = 12, localFinishEdges = 0)
    assert(r.converged, s"must converge within 12 rounds, ran ${r.rounds}")
    assert(r.rounds <= 12)
    val comps = r.labels.select("component").distinct().collect().map(_.getLong(0))
    assert(comps.toSeq === Seq(0L))
    assert(r.labels.count() === n)
  }

  test("non-convergence raises instead of returning wrong labels") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst") // not yet a star forest
    val ex = intercept[IllegalStateException] {
      Graph.connectedComponents(edges, maxIter = 0, localFinishEdges = 0)
    }
    assert(ex.getMessage.contains("no fixed point"))
    // the Result variant reports instead of throwing
    val r = Graph.connectedComponentsResult(edges, maxIter = 0, localFinishEdges = 0)
    assert(!r.converged && r.rounds === 0)
  }

  test("star-forest input converges in zero rounds; self-loop-only nodes keep a label") {
    import spark.implicits._
    val edges = Seq((5L, 0L), (7L, 0L), (9L, 9L)).toDF("src", "dst")
    val r = Graph.connectedComponentsResult(edges, maxIter = 20, localFinishEdges = 0)
    assert(r.converged && r.rounds === 0)
    val m = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(m === Map(5L -> 0L, 7L -> 0L, 0L -> 0L, 9L -> 9L))
  }

  test("hybrid local finish matches pure distributed contraction") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (0 until 500).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val local = Graph.connectedComponentsResult(edges) // default: local finish
    assert(local.converged && local.rounds === 0)
    val dist = Graph.connectedComponentsResult(edges, localFinishEdges = 0)
    assert(dist.converged)
    val a = local.labels.orderBy("node_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = dist.labels.orderBy("node_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("string node ids: distributed contraction works; local finish declines") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    // non-integral ids always take the distributed path, threshold or not
    val r = Graph.connectedComponentsResult(edges) // default threshold
    assert(r.converged)
    val m = r.labels.collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(m === Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("real bond graph: MLSBond.dat components and degrees") {
    val path = "/root/reference/UniaxialCompressionTest/MLSBond.dat"
    assume(Files.exists(Paths.get(path)))
    val edges = DeckCodec.readBonds(spark, path)
    val deg = Graph.degrees(edges)
    assert(deg.agg(sum("degree")).head().getLong(0) === 2 * 13812)
    val cc = Graph.connectedComponents(edges, maxIter = 30, localFinishEdges = 0)
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
