package graft.formats

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types._

/** D15 — the reference's schema registry: `SysFile.ini` names and documents
  * every deck file and every positional parameter (191 lines,
  * `UniaxialCompressionTest/SysFile.ini`). The deck is SELF-DESCRIBING —
  * schema lives in data, not code — and this parser preserves that
  * property: StructTypes and typed settings are GENERATED from the
  * registry ([[toStructType]], [[bindSettings]]), mirroring SURVEY §1.4.
  *
  * Layout (verified against the Uniaxial deck):
  * {{{
  * nCategories
  *   × { name, nFiles, ×{ filename, role } }
  * nMaterialBlocks, blockName, nParams, ×{ name, desc }
  * engineName, nMeasureItems, maxMeasurePoints, ×{ itemName }
  * nSettings, ×{ name, desc }
  * nBcTypes, ×{ name, desc, nParams, ×{ name, desc } }
  * }}}
  */
object SysFileIni {

  final case class Param(name: String, desc: String)
  final case class FileBinding(category: String, file: String, role: String)
  final case class BcType(name: String, desc: String, params: Seq[Param])
  final case class Registry(
      files: Seq[FileBinding],
      materialBlock: String,
      materialParams: Seq[Param],
      engineName: String,
      measureItems: Seq[String],
      settings: Seq[Param],
      bcTypes: Seq[BcType])

  def parse(path: String): Registry = {
    val lines = Files.readAllLines(Paths.get(path)).asScala
      .map(_.trim).filter(_.nonEmpty).toIndexedSeq
    var i = 0
    def next(): String = { val v = lines(i); i += 1; v }
    def nextInt(): Int = next().split("\\s+")(0).toInt
    def params(n: Int): Seq[Param] = (0 until n).map(_ => Param(next(), next()))

    val nCat = nextInt()
    val files = (0 until nCat).flatMap { _ =>
      val cat = next()
      val nFiles = nextInt()
      (0 until nFiles).map(_ => FileBinding(cat, next(), next()))
    }
    val _nMatBlocks = nextInt()
    val matBlock = next()
    val matParams = params(nextInt())
    val engine = next()
    val nItems = nextInt()
    val _maxMeasure = nextInt()
    val items = (0 until nItems).map(_ => next())
    val settings = params(nextInt())
    val nBc = nextInt()
    val bcTypes = (0 until nBc).map { _ =>
      val name = next(); val desc = next()
      BcType(name, desc, params(nextInt()))
    }
    Registry(files, matBlock, matParams, engine, items, settings, bcTypes)
  }

  /** Generate a StructType from a registry parameter block — every field
    * double (the reference's universal type, SURVEY §1.2), descriptions
    * carried as field comments.
    */
  def toStructType(ps: Seq[Param], idField: Option[String] = None): StructType = {
    val fields = ps.map(p =>
      StructField(p.name, DoubleType, nullable = false)
        .withComment(p.desc))
    StructType(idField.map(n =>
      StructField(n, IntegerType, nullable = false)).toSeq ++ fields)
  }

  /** Bind a settings file's bare numbers (`MLS00con.dat`: values only, some
    * lines multi-valued) to the registry's setting names, positionally —
    * the deck's 13 values meet the registry's 13 names.
    */
  def bindSettings(registry: Registry, settingsPath: String): Map[String, Double] = {
    val values = Files.readAllLines(Paths.get(settingsPath)).asScala
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .map(_.toDouble).toIndexedSeq
    registry.settings.map(_.name).zip(values).toMap
  }
}
