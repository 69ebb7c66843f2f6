package graft.pipeline

import graft.formats.DeckCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end recomposition of the reference's two pipelines
  * (SURVEY §3.1-§3.2), seeded and deterministic:
  *
  *  `generate(...)` = `GenerateColumnar.py`'s process_logic: seeds → Lloyd
  *  relaxation → Voronoi topology → node dedup → boundary detection →
  *  two-layer greedy selection → taper shrink → facet export
  *  ("InitialColumnarIce.txt" shape: 12 fixed-8dp floats per line).
  *
  *  `cut(...)` = `BooleanOperation.py`: import → dedup → rotate → cut by
  *  specimen solid → chained plane anti-filters → translate → vertex export.
  */
object IcePipeline {

  final case class Result(facets: DataFrame, selected: Seq[Long], layer2: Seq[Long],
      nodes: DataFrame, elements: DataFrame)

  /** The generation pipeline; returns the tapered facet table for the two
    * selected layers plus the mesh tables. `nJoint` sizes each selection
    * layer at ceil(n/nJoint) (`GenerateColumnar.py:251`).
    */
  def generate(spark: SparkSession, cfg: VoronoiMesh.MeshConfig,
               baseAngleDeg: Double = 8.0, nJoint: Int = 6): Result = {
    val (seeds, _) = VoronoiMesh.lloydRelax(spark, cfg)
    val vertices = VoronoiMesh.voronoiVertices(spark, seeds, cfg).cache()
    val (nodes, elements) = VoronoiMesh.dedupNodes(vertices)

    // eligible pool: interior grains only (boundary grains excluded,
    // GenerateColumnar.py:246)
    val eligible = VoronoiMesh.boundaryGrains(vertices, cfg)
      .filter(col("is_boundary") === 0).select("grain_id")
    val adjDf = GrainSelect.adjacency(elements).cache()
    val adj = adjDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val eligibleIds = eligible.collect().map(_.getLong(0)).toSeq
    // layer size is ceil(|eligible| / n_joint) — over the INTERIOR pool,
    // not all grains (GenerateColumnar.py:252 "num_select =
    // ceil(len(eligible_indices) / n_joint)")
    val k = math.ceil(eligibleIds.size.toDouble / nJoint).toInt

    val layer1 = GrainSelect.greedyIndependentSet(adj, eligibleIds, k)
    val pool2 = GrainSelect.excludePool(spark, eligible, adjDf, layer1)
      .collect().map(_.getLong(0)).toSeq
    val layer2 = GrainSelect.greedyIndependentSet(adj, pool2, k)

    import spark.implicits._
    val selectedDf = (layer1 ++ layer2).toDF("grain_id")
    val quads = VoronoiMesh.facetQuads(vertices, cfg)
      .join(selectedDf, Seq("grain_id")) // only selected grains export facets
    val grains = GrainSelect.weightedAngle(
      selectedDf, baseAngleDeg, cfg.seed + 10)
    val tapered = GrainSelect.taperShrink(quads, grains, cfg.extrusion)
    Result(tapered, layer1, layer2, nodes, elements)
  }

  val FacetCols: Seq[String] =
    (1 to 4).flatMap(v => Seq(s"x$v", s"y$v", s"z$v"))

  /** Export the facet table in the reference's facet-sink format (S6). */
  def exportFacets(facets: DataFrame, path: String): Unit =
    DeckCodec.writeFacetQuads(
      facets.orderBy("grain_id", "pos"), FacetCols, path)

  /** The cutting pipeline over a facet file produced by [[exportFacets]]
    * (or the reference generator): returns the final facet table.
    */
  def cut(spark: SparkSession, facetPath: String, solid: SpecimenCut.Solid,
          planeLo: Double, planeHi: Double, rotateDeg: Double = 0.0,
          cx: Double = 0.0, cy: Double = 0.0, zStrips: Int = 10): DataFrame = {
    // S1-style import of 12-float rows back into the facet frame
    val parts = split(trim(col("value")), "\\s+")
    val parsed = spark.read.text(facetPath)
      .filter(size(parts) === 12)
      .select(FacetCols.zipWithIndex.map { case (c, i) =>
        element_at(parts, i + 1).cast("double").as(c)
      }: _*)
      .withColumn("grain_id", monotonically_increasing_id()) // synthetic face id
      .withColumn("pos", lit(0))
    val deduped = SpecimenCut.dedupByCentroid(parsed, 1e-6)
    val strips = SpecimenCut.subdivideZ(deduped, zStrips)
    val rotated = if (rotateDeg == 0) strips
      else SpecimenCut.rotateZ(strips, rotateDeg, cx, cy)
    val inSolid = SpecimenCut.cutBySolid(rotated, solid)
    SpecimenCut.removePlaneCrossers(
      SpecimenCut.removePlaneCrossers(inSolid, planeLo), planeHi)
  }
}
