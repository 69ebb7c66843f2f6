package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth probe of the maintained duplicate-map roots view
  * ([[graft.streaming.StreamOps.maintainRoots]] /
  * [[graft.streaming.StreamOps.compactRoots]] /
  * [[graft.streaming.StreamOps.serveRoots]]): the claims under test are
  * (a) the per-batch closure costs BATCH work — its wall must stay flat
  * while the stored view grows two decades; (b) the FOLD is O(view) but
  * scheduled — its wall grows with the resolved row count, bought back
  * by the serve read staying bounded (the folded partition plus the
  * partitions since the last fold, instead of one directory per batch
  * forever); (c) the serve equals the all-batches recompute at any
  * boundary, at every scale.
  *
  * Per batch: `rows` loser rows in chains of 10 (doc i matched to
  * doc i-1 within its group — the closure must chase 9 hops, the
  * worst in-batch shape a star-free crawl produces). Fold every
  * `foldEvery` batches. Run e.g. `20 100000 5`: 2M-row view, folds at
  * 0.5M/1M/1.5M/2M.
  */
object RootsGrowthProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(20)
    val rows = args.lift(1).map(_.toInt).getOrElse(100000)
    val foldEvery = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val roots = java.nio.file.Files.createTempDirectory("rootsgrowth")
      .toString + "/roots"
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // batch b: ids b*rows..(b+1)*rows-1 in chains of 10 — i%10==0 is
    // the kept chain head (no row), the other nine each match i-1
    def decisions(b: Int) = spark.range(rows)
      .select((col("id") + b.toLong * rows).as("doc_id"))
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) === 0,
          lit(null).cast("long"))
          .otherwise(col("doc_id") - 1).as("matched_id"))
    (0 until batches).foreach { b =>
      val (_, wM) = t(graft.streaming.StreamOps.maintainRoots(roots,
        decisions(b), b.toLong))
      val folded = (b + 1) % foldEvery == 0
      val (_, wF) = if (folded)
        t(graft.streaming.StreamOps.compactRoots(spark, roots,
          targetParts = 8))
      else ((), 0.0)
      val (n, wS) = t(graft.streaming.StreamOps
        .serveRoots(spark, roots).count())
      println(f"batch=$b%3d view=$n%,12d maintain=$wM%6.2fs " +
        f"fold=${if (folded) f"$wF%6.2fs" else "     -"} serve=$wS%6.2fs")
    }
    // exactness at final scale: every loser roots at its chain head
    val bad = graft.streaming.StreamOps.serveRoots(spark, roots)
      .filter(col("root_id") =!= col("doc_id") - pmod(col("doc_id"),
        lit(10))).count()
    require(bad == 0, s"$bad rows not rooted at their chain head")
    println(f"exactness: all ${batches.toLong * rows * 9 / 10}%,d losers " +
      "root at their chain heads")
    spark.stop()
  }
}
