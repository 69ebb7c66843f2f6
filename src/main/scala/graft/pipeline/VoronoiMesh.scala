package graft.pipeline

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory, Polygon}
import org.locationtech.jts.triangulate.VoronoiDiagramBuilder

/** The reference's mesh-generation pipeline (`GenerateColumnar.py:61-332`)
  * recomposed Spark-first with SEEDED determinism (the reference's RNG is
  * unseeded — SURVEY §3.1 — so we match shape/property, not bits):
  *
  *  1. seed sampling            — `rand(seed)` columns (F5)
  *  2. Lloyd relaxation (G1)    — k-means-style: a distributed sample cloud
  *     is assigned to its nearest seed; seeds move to the mean of their
  *     cell. This is Lloyd's algorithm on a discretized measure; the
  *     row-scaling side (samples) stays a DataFrame, the seed table is
  *     dimension-sized (grains ≪ particles).
  *  3. Voronoi topology         — JTS `VoronoiDiagramBuilder` as the
  *     geometry kernel over the COLLECTED seed table (bounded by grain
  *     count; the reference likewise hands geometry to scipy/Rhino),
  *     clipped to the domain box; vertex/element tables come back as
  *     DataFrames.
  *  4. node dedup (DD1)         — 6-dp rounded keys → stable node ids
  *     (`GenerateColumnar.py:145-152`).
  *  5. extrusion + facet build  — cyclic next-vertex (W1 lead+wraparound)
  *     explodes each polygon edge into a 3D quad
  *     (`GenerateColumnar.py:308-332`).
  */
object VoronoiMesh {

  final case class MeshConfig(
      width: Double = 200.0, height: Double = 200.0,
      nGrains: Int = 150, relaxIterations: Int = 10,
      sampleN: Int = 40000, seed: Long = 42L,
      extrusion: Double = 25.0, boundaryTol: Double = 1e-3)

  /** Uniform seed points, deterministic under `cfg.seed` (F5). */
  def initialSeeds(spark: SparkSession, cfg: MeshConfig): DataFrame =
    spark.range(cfg.nGrains).select(
      col("id").as("grain_id"),
      (rand(cfg.seed) * cfg.width).as("x"),
      (rand(cfg.seed + 1) * cfg.height).as("y"))

  /** One Lloyd step: assign every sample to its nearest seed (broadcast
    * seed table), then move each seed to its cell's centroid. Seeds with an
    * empty cell stay put. Returns (new seeds, mean seed displacement).
    */
  def lloydStep(samples: DataFrame, seeds: DataFrame): (DataFrame, Double) = {
    val s = seeds.select(col("grain_id").as("g"), col("x").as("sx"), col("y").as("sy"))
    val d2 = (col("px") - col("sx")) * (col("px") - col("sx")) +
      (col("py") - col("sy")) * (col("py") - col("sy"))
    val w = Window.partitionBy("sample_id").orderBy(col("dist2"), col("g"))
    val assigned = samples.crossJoin(broadcast(s))
      .withColumn("dist2", d2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val centroids = assigned.groupBy(col("g").as("grain_id"))
      .agg(avg("px").as("cx"), avg("py").as("cy"))
    val moved = seeds.join(centroids, Seq("grain_id"), "left")
      .select(col("grain_id"),
        coalesce(col("cx"), col("x")).as("x"),
        coalesce(col("cy"), col("y")).as("y"),
        sqrt((coalesce(col("cx"), col("x")) - col("x")) * (coalesce(col("cx"), col("x")) - col("x")) +
          (coalesce(col("cy"), col("y")) - col("y")) * (coalesce(col("cy"), col("y")) - col("y"))).as("disp"))
    val meanDisp = moved.agg(avg("disp")).head().getDouble(0)
    (moved.select("grain_id", "x", "y").localCheckpoint(), meanDisp)
  }

  /** G1 — full relaxation loop; returns relaxed seeds and the per-iteration
    * mean displacement trace (monotone-ish decreasing; property-tested).
    */
  def lloydRelax(spark: SparkSession, cfg: MeshConfig): (DataFrame, Seq[Double]) = {
    val samples = spark.range(cfg.sampleN).select(
      col("id").as("sample_id"),
      (rand(cfg.seed + 2) * cfg.width).as("px"),
      (rand(cfg.seed + 3) * cfg.height).as("py"))
      .localCheckpoint()
    var seeds = initialSeeds(spark, cfg)
    val disps = Seq.newBuilder[Double]
    for (_ <- 0 until cfg.relaxIterations) {
      val (next, d) = lloydStep(samples, seeds)
      seeds = next
      disps += d
    }
    (seeds, disps.result())
  }

  private val vertexSchema = StructType(Seq(
    StructField("grain_id", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  /** Voronoi cells of the (collected, grain-count-bounded) seed table,
    * clipped to the domain box; JTS is the geometry kernel, like the
    * reference's scipy/Rhino (`BooleanOperation.py:104-109` crosses into
    * Rhino for exactly this). Output: one row per polygon vertex, CCW,
    * closing vertex dropped.
    */
  def voronoiVertices(spark: SparkSession, seeds: DataFrame, cfg: MeshConfig): DataFrame = {
    val pts = seeds.select("grain_id", "x", "y").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val gf = new GeometryFactory()
    val builder = new VoronoiDiagramBuilder()
    builder.setSites(pts.map(p => new Coordinate(p._2, p._3)).toSeq.asJava)
    val env = new org.locationtech.jts.geom.Envelope(0, cfg.width, 0, cfg.height)
    builder.setClipEnvelope(env)
    val diagram = builder.getDiagram(gf)
    val box = gf.toGeometry(env)
    // map each cell back to its seed (cell userData = site coordinate)
    val bySite = (0 until diagram.getNumGeometries).map { i =>
      val cell = diagram.getGeometryN(i).asInstanceOf[Polygon]
      val site = cell.getUserData.asInstanceOf[Coordinate]
      (site.x, site.y) -> cell
    }.toMap
    val rows = pts.flatMap { case (gid, sx, sy) =>
      bySite.get((sx, sy)).toSeq.flatMap { cell =>
        val clipped = cell.intersection(box)
        clipped match {
          case p: Polygon if !p.isEmpty =>
            val shell = p.getExteriorRing
            // enforce CCW orientation (reference orients polygons, :140)
            val coords0 = shell.getCoordinates.dropRight(1)
            val coords =
              if (org.locationtech.jts.algorithm.Orientation.isCCW(shell.getCoordinateSequence)) coords0
              else coords0.reverse
            coords.zipWithIndex.map { case (c, i) => Row(gid, i, c.x, c.y) }
          case _ => Seq.empty // degenerate cells drop (validity filter P5)
        }
      }
    }
    spark.createDataFrame(rows.toList.asJava, vertexSchema)
  }

  /** DD1 — 6-dp node dedup: stable node ids by (round x, round y) key;
    * returns (nodes, elements) where elements keep per-grain vertex order.
    */
  def dedupNodes(vertices: DataFrame): (DataFrame, DataFrame) = {
    val keyed = vertices
      .withColumn("kx", round(col("x"), 6))
      .withColumn("ky", round(col("y"), 6))
    val nodes = keyed.groupBy("kx", "ky")
      .agg(min(struct(col("grain_id"), col("pos"))).as("first_seen"),
        first(col("x")).as("x0"), first(col("y")).as("y0"))
      .select(col("kx"), col("ky"), col("x0").as("x"), col("y0").as("y"),
        col("first_seen"))
      .withColumn("node_id",
        row_number().over(Window.orderBy(col("first_seen"))).cast("long") - 1)
      .drop("first_seen")
    val elements = keyed.join(nodes.select("kx", "ky", "node_id"), Seq("kx", "ky"))
      .select(col("grain_id"), col("pos"), col("node_id"))
    (nodes.select("node_id", "x", "y"), elements)
  }

  /** Facet quads: each polygon edge (vertex j → cyclic next, W1) extruded
    * to a 3D quad wound bottom→bottom-next→top-next→top — 12 doubles per
    * row exactly as the facet sink expects (`GenerateColumnar.py:318-330`).
    */
  def facetQuads(vertices: DataFrame, cfg: MeshConfig): DataFrame = {
    val w = Window.partitionBy("grain_id").orderBy("pos")
    val withNext = vertices
      .withColumn("nx", coalesce(lead(col("x"), 1).over(w), first(col("x")).over(w)))
      .withColumn("ny", coalesce(lead(col("y"), 1).over(w), first(col("y")).over(w)))
    withNext.select(
      col("grain_id"), col("pos"),
      col("x").as("x1"), col("y").as("y1"), lit(0.0).as("z1"),
      col("nx").as("x2"), col("ny").as("y2"), lit(0.0).as("z2"),
      col("nx").as("x3"), col("ny").as("y3"), lit(cfg.extrusion).as("z3"),
      col("x").as("x4"), col("y").as("y4"), lit(cfg.extrusion).as("z4"))
  }

  /** P3 — boundary grains: any vertex within tol of the domain edge
    * (`GenerateColumnar.py:236-243`), as a single grouped aggregate.
    */
  def boundaryGrains(vertices: DataFrame, cfg: MeshConfig): DataFrame = {
    val nearEdge = col("x") <= cfg.boundaryTol || col("x") >= cfg.width - cfg.boundaryTol ||
      col("y") <= cfg.boundaryTol || col("y") >= cfg.height - cfg.boundaryTol
    vertices.groupBy("grain_id")
      .agg(max(when(nearEdge, 1).otherwise(0)).as("is_boundary"))
  }
}
