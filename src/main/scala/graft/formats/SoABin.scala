package graft.formats

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Codec for the engine's column-oriented snapshot format (SURVEY §1.1 D11,
  * §2.1 S4/S8): `MLSOut%06d.bin` = 4-byte LE int32 particle count, then 4
  * contiguous float32 arrays (SoA) of that length — UX, UY, UZ, flag.
  * Layout verified numerically against
  * `BrazilSplitTest/Output/MLSOut00007250.bin` (790,404 B = 4 + 4·4·49,400).
  *
  * This IS columnar storage — the engine's own Parquet-before-Parquet — so
  * ingest turns it into a long `(step, particle_id, ux, uy, uz, flag)`
  * table persisted as step-partitioned Parquet ([[writeParquetSnapshots]]).
  *
  * Scale: `binaryFile` gives one task per snapshot file; a 100 TB run is
  * many snapshots, so decode parallelism = file count, and each file is
  * engine-working-set sized (MBs) by construction.
  */
object SoABin {

  /** Step number from the `...%06d.bin` filename template (exe string
    * `OutPut\%s%06d.bin`).
    */
  def stepOf(fileName: String): Long = {
    val m = "(\\d+)\\.bin$".r.findFirstMatchIn(fileName)
    m.map(_.group(1).toLong).getOrElse(-1L)
  }

  /** Decode one snapshot byte blob into (particle_id, ux, uy, uz, flag)
    * tuples.
    */
  def decode(bytes: Array[Byte]): Iterator[(Long, Float, Float, Float, Float)] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt(0)
    def arr(k: Int): Int = 4 + 4 * n * k // byte offset of column k
    (0 until n).iterator.map { i =>
      (i.toLong,
        buf.getFloat(arr(0) + 4 * i), buf.getFloat(arr(1) + 4 * i),
        buf.getFloat(arr(2) + 4 * i), buf.getFloat(arr(3) + 4 * i))
    }
  }

  /** S4 — read one or many `.bin` snapshots (glob ok) into the long table. */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val step = stepOf(path)
        decode(content).map { case (id, ux, uy, uz, fl) => (step, id, ux, uy, uz, fl) }
      }
      .toDF("step", "particle_id", "ux", "uy", "uz", "flag")
  }

  /** S8 — write ONE snapshot (single step's rows, driver-side buffer):
    * the buffer is bounded by particles-per-snapshot, the same working set
    * the engine itself holds in memory. Rows are ordered by particle_id.
    */
  def writeOne(df: DataFrame, path: String): Unit = {
    val rows = df.select(col("particle_id"), col("ux"), col("uy"), col("uz"), col("flag"))
      .orderBy("particle_id").collect()
    val n = rows.length
    val buf = ByteBuffer.allocate(4 + 4 * 4 * n).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0, n)
    rows.zipWithIndex.foreach { case (r, i) =>
      buf.putFloat(4 + 4 * i, r.getFloat(1))
      buf.putFloat(4 + 4 * (n + i), r.getFloat(2))
      buf.putFloat(4 + 4 * (2 * n + i), r.getFloat(3))
      buf.putFloat(4 + 4 * (3 * n + i), r.getFloat(4))
    }
    Files.write(Paths.get(path), buf.array())
  }

  /** The scale path: persist the long snapshot table as step-partitioned
    * Parquet — partition pruning then serves `WHERE step = ...` without
    * touching other snapshots (the Spark analogue of one-file-per-step).
    */
  def writeParquetSnapshots(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("step").parquet(path)
}
