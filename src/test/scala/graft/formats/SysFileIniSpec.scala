package graft.formats

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** D15 schema-registry tests against the real Uniaxial `SysFile.ini`
  * (191 lines) plus the generated-schema and settings-binding round trips.
  */
class SysFileIniSpec extends SparkTestBase {

  private val iniPath = "/root/reference/UniaxialCompressionTest/SysFile.ini"
  private val conPath = "/root/reference/UniaxialCompressionTest/MLS00con.dat"

  test("registry parses: categories, material params, measure items, settings, BC types") {
    assume(Files.exists(Paths.get(iniPath)))
    val reg = SysFileIni.parse(iniPath)
    assert(reg.files.map(_.category).distinct ===
      Seq("Geometry", "Material", "Setting", "Boundary"))
    assert(reg.files.exists(f => f.file == "BALL3D_PSLICE.dat" && f.role == "Particle_Model"))
    assert(reg.materialBlock === "Block_Material")
    assert(reg.materialParams.map(_.name) === Seq("E", "Miu", "D", "Un*", "Us*"))
    assert(reg.measureItems === Seq("UX", "UY", "UZ", "VX", "VY", "VZ", "EPSX", "EPSY", "EPSZ"))
    assert(reg.settings.map(_.name) === Seq("Lx", "Ly", "Lz", "CellSize", "dGap",
      "dT", "T", "dURatio", "nOutLoops", "Gx", "Gy", "Gz", "Dp"))
    assert(reg.bcTypes.map(_.name) ===
      Seq("Displacement", "Velocity", "Force", "Acceleration", "NonReflection"))
    assert(reg.bcTypes.head.params.map(_.name).take(6) ===
      Seq("X1", "X2", "Y1", "Y2", "Z1", "Z2"))
  }

  test("StructType generation preserves names, order, and descriptions") {
    assume(Files.exists(Paths.get(iniPath)))
    val reg = SysFileIni.parse(iniPath)
    val st = SysFileIni.toStructType(reg.materialParams, idField = Some("material_id"))
    assert(st.fieldNames.toSeq === Seq("material_id", "E", "Miu", "D", "Un*", "Us*"))
    assert(st("E").getComment().contains("Elastic_Modulus"))
  }

  test("settings binding: MLS00con values meet SysFile names (self-describing deck)") {
    assume(Files.exists(Paths.get(iniPath)) && Files.exists(Paths.get(conPath)))
    val reg = SysFileIni.parse(iniPath)
    val s = SysFileIni.bindSettings(reg, conPath)
    assert(s("Lx") === 50.0 && s("Ly") === 50.0 && s("Lz") === 50.0)
    assert(s("CellSize") === 2.0 && s("dGap") === 0.5)
    assert(s("dT") === 1e-7 && s("T") === 0.05)
    assert(s("nOutLoops") === 250.0 && s("Dp") === 0.6)
  }

  test("CentroidAgg udaf == avg/avg (typed Aggregator surface)") {
    import graft.functions.CentroidAgg
    import spark.implicits._
    spark.udf.register("centroid2d", udaf(CentroidAgg))
    val df = Seq((1L, 0.0, 0.0), (1L, 2.0, 4.0), (2L, 1.0, 1.0))
      .toDF("g", "x", "y")
    df.createOrReplaceTempView("pts")
    val got = spark.sql(
      "SELECT g, centroid2d(x, y) AS c FROM pts GROUP BY g ORDER BY g").collect()
    assert(got(0).getStruct(1).getDouble(0) === 1.0) // mean x of group 1
    assert(got(0).getStruct(1).getDouble(1) === 2.0)
    assert(got(1).getStruct(1).getDouble(0) === 1.0)
  }
}
