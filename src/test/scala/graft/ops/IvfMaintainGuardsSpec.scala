package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The r19 ADVICE/verdict guards on the serving-maintain machinery:
  * the lane/batch footprint namespaces must never overlap, the
  * bootstrap promote must never nest into (or silently absorb) an
  * existing destination, and the retrain `source` must stay unevaluated
  * on every non-retrain cycle (verdict #3 — the by-name contract the
  * StreamOps.maintainServing call site relies on for its hot cadence).
  */
class IvfMaintainGuardsSpec extends SparkTestBase {
  import spark.implicits._

  private def unit(seed: Int, n: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = Array.fill(16)(0f).map(_ => rnd.nextGaussian().toFloat)
      val nn = math.sqrt(v.map(x => x.toDouble * x).sum).max(1e-9)
      (seed.toLong * 100000 + i, v.map(x => (x / nn).toFloat).toSeq)
    }
  }
  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))

  test("maintain lanes: a lane spelled like a legacy batch footprint (b<digits>) is refused; ordinary digit-bearing lanes pass") {
    val dir = java.nio.file.Files.createTempDirectory("ivflane")
      .toString + "/idx"
    IvfIndex.save(IvfIndex.build(df(unit(60, 50)), nlist = 4, iters = 1),
      dir)
    // "b5"'s footprints (maint-b5-b<k>-*) are MATCHED by the legacy
    // empty-lane wipe glob for batch 5 (maint-b5-*) — a legacy torn
    // retry would wipe the lane's applied rows, so the spelling is
    // refused at the door (r19 ADVICE)
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.maintainCycle(spark, dir, df(unit(61, 5)),
        removals = None, maxCellRows = 10000, batchId = 0L, lane = "b5")
    }
    assert(ex.getMessage.contains("b5"))
    // non-ambiguous spellings keep working: digits are fine when the
    // lane is not b<digits> in full
    val w = IvfIndex.maintainCycle(spark, dir, df(unit(61, 5)),
      removals = None, maxCellRows = 10000, batchId = 0L, lane = "lane5")
    assert(w.action === "ok")
    val wb = IvfIndex.maintainCycle(spark, dir, df(unit(62, 5)),
      removals = None, maxCellRows = 10000, batchId = 0L, lane = "b12x")
    assert(wb.action === "ok")
  }

  test("bootstrapServing: a stale centroid-less destination is wiped before the promote; a live index destination is refused") {
    val base = java.nio.file.Files.createTempDirectory("ivfboot").toString
    val path = s"$base/serving"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // stale remnant: the destination EXISTS but has no centroids (the
    // shape a pre-promote crash or a foreign writer can leave; on HDFS
    // a blind rename would nest .boot INSIDE it — a live path with no
    // top-level centroids that re-bootstraps forever)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/junk"))
    IvfIndex.bootstrapServing(spark, path, df(unit(70, 60)), nlist = 4)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/centroids")),
      "the promote must land centroids at the TOP level of path")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/junk")),
      "the stale remnant is wiped, not nested into")
    assert(IvfIndex.load(spark, path).assignments.count() === 60L)
    // a LIVE index at the destination means two bootstrappers raced
    // outside the serving lock — refuse loudly, never absorb
    intercept[IllegalStateException] {
      IvfIndex.bootstrapServing(spark, path, df(unit(71, 10)), nlist = 4)
    }
    assert(IvfIndex.load(spark, path).assignments.count() === 60L,
      "the refused bootstrap must not touch the live index")
  }

  test("maintainCycle: the retrain source is BY-NAME — ok and refine cycles never evaluate it") {
    val dir = java.nio.file.Files.createTempDirectory("ivflazy")
      .toString + "/idx"
    IvfIndex.save(IvfIndex.build(df(unit(80, 100)), nlist = 4, iters = 2),
      dir)
    // an `ok` cycle: the source expression must not run — the streaming
    // hot path passes `Some(spark.read.parquet(store))` here, and a
    // strict evaluation would pay the store listing/schema inference on
    // EVERY micro-batch (r19 verdict #3)
    val w1 = IvfIndex.maintainCycle(spark, dir, df(unit(81, 10)),
      removals = None, maxCellRows = 10000, batchId = 0L,
      source = sys.error("retrain source evaluated on an ok cycle"))
    assert(w1.action === "ok")
    // a `refine` cycle re-fits cells locally — still no source read
    val w2 = IvfIndex.maintainCycle(spark, dir, df(unit(82, 60)),
      removals = None, maxCellRows = 40, batchId = 1L,
      source = sys.error("retrain source evaluated on a refine cycle"))
    assert(w2.action === "refine")
  }
}
