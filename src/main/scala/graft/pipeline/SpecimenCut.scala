package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's Boolean-cutting pipeline (`BooleanOperation.py`)
  * recomposed as a linear DataFrame filter/map chain — which is what it is:
  * import → dedup → rotate → cut against a specimen solid → two chained
  * anti-filters against clipping planes → translate → export.
  *
  * We cut by FACE-CENTROID membership tests against analytic solids
  * (box/sphere/cylinder — `BooleanOperation.py:24-39`) instead of calling
  * an external CAD kernel; the filter semantics (keep faces inside, drop
  * plane-crossers) match `BooleanOperation.py:118-149`.
  *
  * Facet frame columns: grain_id, pos, x1..z4 (see
  * [[VoronoiMesh.facetQuads]]).
  */
object SpecimenCut {

  sealed trait Solid { def contains(x: Column, y: Column, z: Column): Column }

  final case class Box(x1: Double, x2: Double, y1: Double, y2: Double,
                       z1: Double, z2: Double) extends Solid {
    def contains(x: Column, y: Column, z: Column): Column =
      x.between(x1, x2) && y.between(y1, y2) && z.between(z1, z2)
  }
  final case class Sphere(cx: Double, cy: Double, cz: Double, r: Double) extends Solid {
    def contains(x: Column, y: Column, z: Column): Column =
      (x - cx) * (x - cx) + (y - cy) * (y - cy) + (z - cz) * (z - cz) <= r * r
  }
  /** Axis-aligned (z) cylinder, like the Rhino cylinder of
    * `BooleanOperation.py:31-33`.
    */
  final case class CylinderZ(cx: Double, cy: Double, z1: Double, z2: Double,
                             r: Double) extends Solid {
    def contains(x: Column, y: Column, z: Column): Column =
      (x - cx) * (x - cx) + (y - cy) * (y - cy) <= r * r && z.between(z1, z2)
  }

  private def centroid(c: String): Column =
    (col(s"${c}1") + col(s"${c}2") + col(s"${c}3") + col(s"${c}4")) / 4

  /** The `_Split` analogue (`BooleanOperation.py:99-114` delegates this to
    * Rhino): subdivide each extruded quad into `n` z-strips so subsequent
    * solid cuts and plane filters act on locally small faces rather than
    * dropping whole full-height walls. Vertices interpolate linearly
    * between the bottom edge (v1→v2) and top edge (v4→v3) — exact for the
    * extruded (and tapered, z-linear) facets this pipeline produces.
    * One `explode` over a generated strip index: row count ×n, no shuffle.
    */
  def subdivideZ(facets: DataFrame, n: Int): DataFrame = {
    val j = col("strip")
    def lerp(b: String, t: String, f: Column): Column =
      col(b) + (col(t) - col(b)) * f
    val t0 = j.cast("double") / n
    val t1 = (j + 1).cast("double") / n
    facets
      .withColumn("strip", explode(sequence(lit(0), lit(n - 1))))
      .select(col("grain_id"), col("pos"), col("strip"),
        lerp("x1", "x4", t0).as("x1"), lerp("y1", "y4", t0).as("y1"), lerp("z1", "z4", t0).as("z1"),
        lerp("x2", "x3", t0).as("x2"), lerp("y2", "y3", t0).as("y2"), lerp("z2", "z3", t0).as("z2"),
        lerp("x2", "x3", t1).as("x3"), lerp("y2", "y3", t1).as("y3"), lerp("z2", "z3", t1).as("z3"),
        lerp("x1", "x4", t1).as("x4"), lerp("y1", "y4", t1).as("y4"), lerp("z1", "z4", t1).as("z4"))
  }

  /** Keep faces whose centroid lies inside the specimen solid (the "cut". */
  def cutBySolid(facets: DataFrame, solid: Solid): DataFrame =
    facets.filter(solid.contains(centroid("x"), centroid("y"), centroid("z")))

  /** P4 — drop faces crossing the horizontal plane z = planeZ (vertices on
    * both sides), the "remove results intersecting plant1/plant2" step
    * (`BooleanOperation.py:129-149`). Chain twice for the two planes.
    */
  def removePlaneCrossers(facets: DataFrame, planeZ: Double): DataFrame = {
    val zs = Seq("z1", "z2", "z3", "z4").map(col)
    val below = zs.map(_ < planeZ).reduce(_ || _)
    val above = zs.map(_ > planeZ).reduce(_ || _)
    facets.filter(!(below && above))
  }

  /** DD2 — approximate face dedup: duplicate iff centroid within eps
    * (`BooleanOperation.py:85-95`'s O(n²) scan), via 3-D cell binning:
    * each face probes its 27 neighbor cells on one side of an equi-join;
    * the kept face is the lowest (grain_id, pos). Scales like the engine's
    * CellSize grid instead of quadratically.
    */
  def dedupByCentroid(facets: DataFrame, eps: Double): DataFrame = {
    val keyed = facets
      .withColumn("fcx", centroid("x")).withColumn("fcy", centroid("y"))
      .withColumn("fcz", centroid("z"))
      .withColumn("bx", floor(col("fcx") / eps).cast("long"))
      .withColumn("by", floor(col("fcy") / eps).cast("long"))
      .withColumn("bz", floor(col("fcz") / eps).cast("long"))
      .withColumn("fid", struct(col("grain_id"), col("pos")))
    val probes = keyed.select(col("fid"), col("fcx"), col("fcy"), col("fcz"),
        explode(array((-1 to 1).flatMap(dx => (-1 to 1).flatMap(dy => (-1 to 1).map(dz =>
          struct((col("bx") + dx).as("bx"), (col("by") + dy).as("by"),
            (col("bz") + dz).as("bz"))))): _*)).as("cell"))
    val build = keyed.select(col("fid").as("fid_b"), col("fcx").as("bx2"),
      col("fcy").as("by2"), col("fcz").as("bz2"),
      struct(col("bx"), col("by"), col("bz")).as("cell"))
    val dupOf = probes.join(build,
        probes("cell") === build("cell") &&
        col("fid_b") < col("fid") &&
        abs(col("fcx") - col("bx2")) < eps &&
        abs(col("fcy") - col("by2")) < eps &&
        abs(col("fcz") - col("bz2")) < eps)
      .select(col("fid")).distinct()
    keyed.join(dupOf, Seq("fid"), "left_anti")
      .drop("fcx", "fcy", "fcz", "bx", "by", "bz", "fid")
  }

  /** F3 — rotate all vertices about the z axis by `deg` degrees around
    * (cx, cy) (`BooleanOperation.py:199-210`), then translate
    * (`:252-253`). Column arithmetic only.
    */
  def rotateZ(facets: DataFrame, deg: Double, cx: Double, cy: Double): DataFrame = {
    val c = cos(radians(lit(deg)));
    val s = sin(radians(lit(deg)))
    (1 to 4).foldLeft(facets) { (df, i) =>
      df.withColumn(s"rx$i", lit(cx) + (col(s"x$i") - cx) * c - (col(s"y$i") - cy) * s)
        .withColumn(s"ry$i", lit(cy) + (col(s"x$i") - cx) * s + (col(s"y$i") - cy) * c)
    }.drop((1 to 4).flatMap(i => Seq(s"x$i", s"y$i")): _*)
      .withColumnsRenamed((1 to 4).flatMap(i =>
        Seq(s"rx$i" -> s"x$i", s"ry$i" -> s"y$i")).toMap)
  }

  def translate(facets: DataFrame, dx: Double, dy: Double, dz: Double): DataFrame =
    (1 to 4).foldLeft(facets) { (df, i) =>
      df.withColumn(s"x$i", col(s"x$i") + dx)
        .withColumn(s"y$i", col(s"y$i") + dy)
        .withColumn(s"z$i", col(s"z$i") + dz)
    }
}
