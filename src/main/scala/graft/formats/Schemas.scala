package graft.formats

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reference's deck/output tables (SURVEY §1.1
  * D5-D16, §1.4: fixed positional schemas, described by data in
  * `SysFile.ini`). Kept in one place, mirroring the reference's
  * self-describing-deck property.
  */
object Schemas {

  /** D5 — particle table (`BALL3D_PSLICE.dat`): 27 space-delimited cols:
    * [0]=id, [1..3]=x,y,z, [4..15]=state/velocity slots, [16]=radius,
    * [17]=material id, [18..26]=flags (`BrazilSplitTest/BALL3D_PSLICE.dat:2`).
    */
  val particle: StructType = StructType(
    Seq(StructField("id", LongType, nullable = false),
      StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false),
      StructField("z", DoubleType, nullable = false)) ++
      (4 to 15).map(i => StructField(s"s$i", DoubleType, nullable = false)) ++
      Seq(StructField("radius", DoubleType, nullable = false),
        StructField("material_id", IntegerType, nullable = false)) ++
      // flag slots hold mixed int/float literals ("0" and "0.0") in the
      // reference decks — double is the faithful positional type
      (18 to 26).map(i => StructField(s"f$i", DoubleType, nullable = false)))

  /** D6 — bond edge list (`MLSBond.dat`): src, dst, group ∈ {1, 10}. */
  val bond: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false),
    StructField("group", IntegerType, nullable = false)))

  /** D7 — joint facet triangles (`MLSJDat.dat` section 1): 9 doubles =
    * 3 vertices × xyz, plus our assigned tri_id.
    */
  val jointFacet: StructType = StructType(
    StructField("tri_id", LongType, nullable = false) +:
      (for (v <- 1 to 3; c <- Seq("x", "y", "z"))
        yield StructField(s"$c$v", DoubleType, nullable = false)))

  /** D8 — block material row (`MLSMat00.dat`): id, E, nu + 6 micro params. */
  val material: StructType = StructType(
    Seq(StructField("material_id", IntegerType, nullable = false),
      StructField("e_modulus", DoubleType, nullable = false),
      StructField("nu", DoubleType, nullable = false)) ++
      (3 to 8).map(i => StructField(s"p$i", DoubleType, nullable = false)))

  /** D11 — SoA snapshot long table: one row per (step, particle). */
  val snapshot: StructType = StructType(Seq(
    StructField("step", LongType, nullable = false),
    StructField("particle_id", LongType, nullable = false),
    StructField("ux", FloatType, nullable = false),
    StructField("uy", FloatType, nullable = false),
    StructField("uz", FloatType, nullable = false),
    StructField("flag", FloatType, nullable = false)))

  /** D12 — measured series (`MLSOut00E.dat`): step, time, 14 quantities
    * (2 measure points × 7).
    */
  val measuredSeries: StructType = StructType(
    Seq(StructField("step", LongType, nullable = false),
      StructField("time", DoubleType, nullable = false)) ++
      (1 to 14).map(i => StructField(s"v$i", DoubleType, nullable = false)))

  /** D9 — one load-curve point of a boundary condition. */
  val curvePoint: StructType = StructType(Seq(
    StructField("bc_id", IntegerType, nullable = false),
    StructField("t", DoubleType, nullable = false),
    StructField("v", DoubleType, nullable = false)))
}
