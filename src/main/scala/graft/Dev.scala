package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main — not part of the library surface. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.formats._
    val base = "/root/reference/UniaxialCompressionTest"
    val brazil = "/root/reference/BrazilSplitTest"

    val particles = DeckCodec.readParticles(spark, s"$brazil/BALL3D_PSLICE.dat")
    println(s"particles: ${particles.count()} declared=${DeckCodec.declaredCount(s"$brazil/BALL3D_PSLICE.dat")} check=${DeckCodec.checkCount(particles, s"$brazil/BALL3D_PSLICE.dat")}")
    particles.agg(min("x"), max("x"), min("z"), max("z"), countDistinct("material_id")).show()

    val bonds = DeckCodec.readBonds(spark, s"$base/MLSBond.dat")
    println(s"bonds: ${bonds.count()}")
    bonds.groupBy("group").count().orderBy("group").show()

    val (tris, scal) = DeckCodec.readJointFacets(spark, s"$base/MLSJDat.dat")
    println(s"joint tris: ${tris.count()} scalars: ${scal.count()}")

    val mats = DeckCodec.readMaterials(spark, s"$base/MLSMat00.dat")
    println("materials:"); mats.show()

    val bcs = DeckCodec.readBoundaryConditions(s"$base/MLSLD00.dat")
    println(s"BCs: ${bcs.mkString("; ")}")

    val manifest = DeckCodec.readManifest(s"$base/mls.c")
    println(s"manifest: $manifest")

    // full snapshot sweep: all 70 Uniaxial .bin files -> long table
    val snaps = SoABin.read(spark, s"$base/Output/MLSOut*.bin")
    println(s"snapshot rows: ${snaps.count()} steps: ${snaps.select(countDistinct("step")).head().getLong(0)}")
    // physics invariant: top-platen displacement uz = -20 * t = -20 * step * 1e-7
    val e = DeckCodec.readMeasuredSeries(spark, s"$base/Output/MLSOut00E.dat")
    println(s"measured series rows: ${e.count()}")
    spark.stop()
  }
}
