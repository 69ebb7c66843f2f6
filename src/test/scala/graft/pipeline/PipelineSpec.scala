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

  test("generator parity metrics at the reference config (PARITY.md bands)") {
    // GenerateColumnar.py:401-406: 200x200 domain, 150 grains, thickness
    // 50.2, n_joint 6. The script itself cannot run in this container
    // (scipy/shapely/matplotlib absent, no egress), so parity is asserted
    // against the closed-form invariants any faithful bounded-Voronoi
    // generator satisfies — see PARITY.md for the committed bands.
    // relaxIterations trimmed 50 -> 12 (displacement plateau is spec'd
    // separately; the metrics below are topology-stable past ~10 rounds).
    val refCfg = VoronoiMesh.MeshConfig(
      width = 200.0, height = 200.0, nGrains = 150, relaxIterations = 12,
      sampleN = 30000, seed = 42L, extrusion = 50.2)
    val res = IcePipeline.generate(spark, refCfg, baseAngleDeg = 8.0, nJoint = 6)
    val verts = res.elements // (grain_id, pos, node_id) incidence rows

    // grain count: one polygon per seed
    val perGrain = verts.groupBy("grain_id").count()
    assert(perGrain.count() === 150)

    // per-grain vertex-count distribution: planar Voronoi cells average
    // ~6 sides (Euler), bounded-box clipping pulls the mean slightly down
    val stats = perGrain.agg(avg("count"), min("count"), max("count")).head()
    val meanSides = stats.getDouble(0)
    assert(meanSides > 5.0 && meanSides < 7.0, s"mean sides $meanSides")
    assert(stats.getLong(1) >= 3, "every cell is a real polygon")
    assert(stats.getLong(2) <= 14, "no degenerate mega-cell")

    // node count: clipped planar Voronoi has ~2n interior vertices plus
    // boundary/corner intersections
    val nNodes = res.nodes.count()
    assert(nNodes >= 250 && nNodes <= 500, s"node count $nNodes")

    // selection layers: k = ceil(|interior|/6) (GenerateColumnar.py:252);
    // at 150 grains in a 200x200 box roughly 90-120 grains are interior,
    // so k lands in [15, 20]; layer 2 draws from the pool minus layer 1
    // and its neighborhood and may stop short when the pool drains
    assert(res.selected.size >= 15 && res.selected.size <= 20,
      s"layer1 ${res.selected.size}")
    assert(res.layer2.size >= 1 && res.layer2.size <= res.selected.size,
      s"layer2 ${res.layer2.size}")

    // facet sink: exactly one lateral quad per polygon edge of each
    // selected grain (GenerateColumnar.py:308-332 writes n facets for an
    // n-vertex element)
    val selectedDf = {
      import spark.implicits._
      (res.selected ++ res.layer2).toDF("grain_id")
    }
    val expectedFacets = perGrain.join(selectedDf, Seq("grain_id"))
      .agg(sum("count")).head().getLong(0)
    assert(res.facets.count() === expectedFacets)

    // facet-area sum: exact quad area (two triangles, quads are planar),
    // banded against the untapered prism area (perimeter x extrusion) —
    // the 8-degree mean taper shrinks top edges, slant stretches sides
    def cross2(ax: String, ay: String, az: String,
               bx: String, by: String, bz: String) = {
      def d(p: String, q: String) = col(p) - col(q)
      sqrt(
        pow(d(ay, "y1") * d(bz, "z1") - d(az, "z1") * d(by, "y1"), 2) +
        pow(d(az, "z1") * d(bx, "x1") - d(ax, "x1") * d(bz, "z1"), 2) +
        pow(d(ax, "x1") * d(by, "y1") - d(ay, "y1") * d(bx, "x1"), 2)) / 2
      }
    val quadArea = cross2("x2", "y2", "z2", "x3", "y3", "z3") +
      cross2("x3", "y3", "z3", "x4", "y4", "z4")
    val areaSum = res.facets.select(quadArea.as("a"))
      .agg(sum("a")).head().getDouble(0)
    val perimSum = res.facets.select(
      sqrt(pow(col("x2") - col("x1"), 2) + pow(col("y2") - col("y1"), 2)).as("e"))
      .agg(sum("e")).head().getDouble(0)
    val prism = perimSum * refCfg.extrusion
    assert(areaSum > 0.4 * prism, s"taper must not collapse facets: $areaSum vs $prism")
    assert(areaSum < 1.1 * prism, s"lateral area near the prism bound: $areaSum vs $prism")
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
