package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Property tests for the mesh-generation + cutting pipelines (SURVEY §5.2.3:
  * Lloyd convergence, independent-set validity, dedup idempotence) — the
  * reference's own outputs are unseeded, so properties are the contract.
  */
class PipelineSpec extends SparkTestBase {

  private val cfg = VoronoiMesh.MeshConfig(
    width = 50, height = 50, nGrains = 40, relaxIterations = 5,
    sampleN = 8000, seed = 42L, extrusion = 10.0)

  private lazy val relaxed = VoronoiMesh.lloydRelax(spark, cfg)
  private lazy val vertices = VoronoiMesh.voronoiVertices(spark, relaxed._1, cfg)

  test("G1 Lloyd: displacement trend decreases and seeds stay in the box") {
    val (seeds, disps) = relaxed
    assert(disps.length === cfg.relaxIterations)
    assert(disps.last < disps.head / 2, s"relaxation converges: $disps")
    val r = seeds.agg(min("x"), max("x"), min("y"), max("y")).head()
    assert(r.getDouble(0) >= 0 && r.getDouble(1) <= cfg.width)
    assert(r.getDouble(2) >= 0 && r.getDouble(3) <= cfg.height)
    assert(seeds.count() === cfg.nGrains)
  }

  test("G1 Lloyd is deterministic under the seed") {
    val (s1, d1) = VoronoiMesh.lloydRelax(spark, cfg.copy(relaxIterations = 2))
    val (s2, d2) = VoronoiMesh.lloydRelax(spark, cfg.copy(relaxIterations = 2))
    assert(d1 === d2)
    assert(s1.orderBy("grain_id").collect().map(_.toSeq).toSeq ===
      s2.orderBy("grain_id").collect().map(_.toSeq).toSeq)
  }

  test("Voronoi cells: every grain has a polygon, areas tile the box") {
    val perGrain = vertices.groupBy("grain_id").count()
    assert(perGrain.count() === cfg.nGrains)
    assert(perGrain.filter(col("count") < 3).count() === 0) // real polygons
    // shoelace area per grain sums to the box area
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grain_id").orderBy("pos")
    val withNext = vertices
      .withColumn("nx", coalesce(lead(col("x"), 1).over(w), first(col("x")).over(w)))
      .withColumn("ny", coalesce(lead(col("y"), 1).over(w), first(col("y")).over(w)))
    val area = withNext
      .groupBy("grain_id")
      .agg((sum(col("x") * col("ny") - col("nx") * col("y")) / 2).as("area"))
      .agg(sum("area")).head().getDouble(0)
    assert(math.abs(area - cfg.width * cfg.height) < 1e-6 * cfg.width * cfg.height)
  }

  test("DD1 node dedup: shared boundaries collapse, ids are dense") {
    val (nodes, elements) = VoronoiMesh.dedupNodes(vertices)
    val nNodes = nodes.count()
    assert(nNodes < vertices.count()) // interior vertices are shared by >=2 cells
    val maxId = nodes.agg(max("node_id")).head().getLong(0)
    assert(maxId === nNodes - 1) // dense stable ids
    assert(elements.count() === vertices.count())
  }

  test("W1 facet build: one quad per polygon edge, quads close the loop") {
    val quads = VoronoiMesh.facetQuads(vertices, cfg)
    assert(quads.count() === vertices.count()) // cyclic: n edges for n vertices
    val r = quads.agg(min("z1"), max("z3")).head()
    assert(r.getDouble(0) === 0.0 && r.getDouble(1) === cfg.extrusion)
  }

  test("G2 greedy independent set: valid, deterministic, right size") {
    val (_, elements) = VoronoiMesh.dedupNodes(vertices)
    val adj = GrainSelect.adjacency(elements)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val candidates = (0L until cfg.nGrains.toLong)
    val k = math.ceil(cfg.nGrains / 6.0).toInt
    val sel = GrainSelect.greedyIndependentSet(adj, candidates, k)
    assert(sel.length === k, s"selected ${sel.length} of requested $k")
    val nbr = adj.toSet
    for (a <- sel; b <- sel if a < b)
      assert(!nbr.contains((a, b)), s"$a and $b are adjacent")
    assert(sel === GrainSelect.greedyIndependentSet(adj, candidates, k))
  }

  test("SO1 layer-2 pool excludes layer-1 and its neighbors") {
    import spark.implicits._
    val (_, elements) = VoronoiMesh.dedupNodes(vertices)
    val adjDf = GrainSelect.adjacency(elements)
    val adj = adjDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val layer1 = GrainSelect.greedyIndependentSet(adj, 0L until cfg.nGrains.toLong, 6)
    val eligible = (0L until cfg.nGrains.toLong).toDF("grain_id")
    val pool = GrainSelect.excludePool(spark, eligible, adjDf, layer1)
      .collect().map(_.getLong(0)).toSet
    val excluded = layer1.toSet ++ adj.collect {
      case (a, b) if layer1.contains(a) => b
      case (a, b) if layer1.contains(b) => a
    }
    assert(pool.intersect(excluded).isEmpty)
    assert(pool.size === cfg.nGrains - excluded.size)
  }

  test("F3/A5 taper shrink: top ring shrinks toward centroid, bottom fixed") {
    val quads = VoronoiMesh.facetQuads(vertices, cfg)
    val grains = GrainSelect.weightedAngle(
      vertices.select("grain_id").distinct(), baseAngleDeg = 8.0, seed = 7L)
    assert(grains.filter(col("taper_deg") < 0.01 || col("taper_deg") > 15.0).count() === 0)
    val shrunk = GrainSelect.taperShrink(quads, grains, cfg.extrusion)
    val joined = quads.select(col("grain_id"), col("pos"), col("x1").as("ox1"), col("x4").as("ox4"))
      .join(shrunk, Seq("grain_id", "pos"))
    // bottom vertices (z=0) unchanged; top vertices (z=H) moved
    assert(joined.filter(abs(col("x1") - col("ox1")) > 1e-9).count() === 0)
    assert(joined.filter(abs(col("x4") - col("ox4")) > 1e-9).count() > 0)
  }

  test("subdivideZ: n strips per quad, z-extent preserved, edges interpolate") {
    val quads = VoronoiMesh.facetQuads(vertices, cfg)
    val strips = SpecimenCut.subdivideZ(quads, 5)
    assert(strips.count() === quads.count() * 5)
    val r = strips.agg(min("z1"), max("z3")).head()
    assert(r.getDouble(0) === 0.0 && r.getDouble(1) === cfg.extrusion)
    // strip heights are uniform H/n
    assert(strips.filter(abs(col("z4") - col("z1") - cfg.extrusion / 5) > 1e-9).count() === 0)
  }

  test("SpecimenCut solids: box and sphere membership predicates") {
    val quads = VoronoiMesh.facetQuads(vertices, cfg)
    val box = SpecimenCut.Box(10, 40, 10, 40, 0, cfg.extrusion)
    val inBox = SpecimenCut.cutBySolid(quads, box)
    assert(inBox.count() > 0 && inBox.count() < quads.count())
    val r = inBox.agg(min(col("x1") + col("x2") + col("x3") + col("x4")) / 4).head()
    assert(r.getDouble(0) >= 10 - 25) // centroid-based: vertices may overhang
    val sph = SpecimenCut.Sphere(cfg.width / 2, cfg.height / 2, cfg.extrusion / 2, 15)
    val inSph = SpecimenCut.cutBySolid(quads, sph)
    assert(inSph.count() > 0 && inSph.count() < inBox.count() + quads.count())
  }

  test("SpecimenCut: cylinder cut + plane filters + dedup behave like the reference chain") {
    val quads = VoronoiMesh.facetQuads(vertices, cfg)
    val cyl = SpecimenCut.CylinderZ(cfg.width / 2, cfg.height / 2, 0, cfg.extrusion, cfg.width / 4)
    val cut = SpecimenCut.cutBySolid(quads, cyl)
    assert(cut.count() > 0 && cut.count() < quads.count())
    val filtered = SpecimenCut.removePlaneCrossers(
      SpecimenCut.removePlaneCrossers(cut, 2.0), cfg.extrusion - 2.0)
    assert(filtered.count() < cut.count())
    val deduped = SpecimenCut.dedupByCentroid(filtered, 1e-6)
    // no duplicate centroids in a valid mesh -> idempotent here
    assert(deduped.count() === filtered.count())
    val again = SpecimenCut.dedupByCentroid(
      deduped.union(deduped), 1e-6) // force exact duplicates
    assert(again.count() === deduped.count())
    val rotated = SpecimenCut.rotateZ(filtered, 90.0, cfg.width / 2, cfg.height / 2)
    assert(rotated.count() === filtered.count())
    val back = SpecimenCut.translate(rotated, 5, -5, 1)
    assert(back.count() === filtered.count())
  }
}
