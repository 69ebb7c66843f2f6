package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The mergeable KLL quantile sketch: exactness below capacity, exact
  * weight conservation through deterministic alternating compaction,
  * serialization round-trips, rank-error envelopes under distributed
  * aggregation + merge on adversarial distributions, and the
  * maintained-summary integration (merge of partials answers within the
  * envelope — the incremental-percentile contract ops.Sketches needed).
  */
class KllSketchSpec extends SparkTestBase {

  test("below capacity the sketch is EXACT; serialization round-trips") {
    val s = KllState.empty(256)
    val vals = (1 to 100).map(_.toDouble).reverse // insertion order scrambled
    vals.foreach(s.insert)
    assert(s.n === 100L)
    assert(s.totalWeight === 100L)
    // no compaction has happened: every quantile is the exact order stat
    assert(s.quantile(0.5) === 50.0)
    assert(s.quantile(0.01) === 1.0)
    assert(s.quantile(1.0) === 100.0)
    val rt = KllState.deserialize(s.serialize())
    assert(rt.n === s.n)
    assert(rt.quantile(0.37) === s.quantile(0.37))
  }

  test("weight is conserved EXACTLY through compactions (odd counts included)") {
    val s = KllState.empty(16) // tiny k forces many compactions
    val rnd = new scala.util.Random(7)
    (1 to 9973).foreach(_ => s.insert(rnd.nextDouble() * 1000)) // prime count
    assert(s.n === 9973L)
    assert(s.totalWeight === 9973L, "alternating compaction must not leak weight")
    val t = KllState.empty(16)
    (1 to 501).foreach(i => t.insert(i.toDouble))
    s.mergeIn(t)
    assert(s.totalWeight === 9973L + 501L)
  }

  test("rank error stays inside the 2% envelope on adversarial distributions") {
    val rnd = new scala.util.Random(11)
    val dists: Map[String, Int => Double] = Map(
      "uniform" -> (_ => rnd.nextDouble() * 1e6),
      "zipf-ish" -> (_ => math.pow(rnd.nextDouble(), 8) * 1e6), // heavy head
      "two-point" -> (i => if (i % 10 == 0) 1.0 else 0.0),      // massive ties
      "sorted" -> (i => i.toDouble),                             // worst insert order
      "sawtooth" -> (i => (i % 97).toDouble))
    for ((dname, gen) <- dists) {
      val n = 50000
      val vals = (0 until n).map(gen)
      val s = KllState.empty(256)
      vals.foreach(s.insert)
      val sorted = vals.sorted
      for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
        val est = s.quantile(q)
        // exact rank interval of est (ties make it an interval)
        val lo = sorted.count(_ < est).toDouble / n
        val hi = sorted.count(_ <= est).toDouble / n
        val err = if (q < lo) lo - q else if (q > hi) q - hi else 0.0
        assert(err <= 0.02, f"$dname q=$q: rank err $err%.4f (est=$est)")
      }
    }
  }

  test("merge of partials answers within the envelope (any split)") {
    val rnd = new scala.util.Random(23)
    val n = 40000
    val vals = (0 until n).map(_ => math.pow(rnd.nextDouble(), 4) * 1e5)
    val sorted = vals.sorted
    // split into 7 uneven partials, sketch each, merge pairwise unevenly
    val cuts = Seq(0, 100, 5000, 5100, 20000, 20007, 33333, n)
    val partials = cuts.sliding(2).map { case Seq(a, b) =>
      val p = KllState.empty(256); vals.slice(a, b).foreach(p.insert); p
    }.toSeq
    val merged = partials.reduce { (a, b) => a.mergeIn(b); a }
    assert(merged.n === n.toLong)
    assert(merged.totalWeight === n.toLong)
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val est = merged.quantile(q)
      val lo = sorted.count(_ < est).toDouble / n
      val hi = sorted.count(_ <= est).toDouble / n
      val err = if (q < lo) lo - q else if (q > hi) q - hi else 0.0
      assert(err <= 0.02, f"q=$q: rank err $err%.4f after merge")
    }
  }

  test("distributed agg + summary merge: quantiles within 2% of exact ranks") {
    // the full Sketches integration: per-batch summaries with a KLL
    // column, merged through ops.Sketches.merge, read via KllF.quantile —
    // the incremental path a 100 TB pipeline would run
    val events = Tables.events(spark, Sf0001)
    val parts = Seq(0, 1, 2).map(i =>
      graft.ops.Sketches.summarize(
        events.filter(pmod(col("event_id"), lit(3)) === i),
        Seq("event_type"), "value", "user_id", kllK = Some(256)))
    val merged = graft.ops.Sketches.merge(
      parts.reduce(_ unionByName _), Seq("event_type"))
    val got = merged.select(col("event_type"),
        graft.functions.KllF.quantile(spark, col("value_kll"), 0.5).as("p50"),
        graft.functions.KllF.quantile(spark, col("value_kll"), 0.9).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exactRank = events.select(col("event_type"), col("value").cast("double").as("v"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for ((et, (p50, p90)) <- got) {
      val sorted = exactRank(et)
      val n = sorted.length.toDouble
      for ((q, est) <- Seq(0.5 -> p50, 0.9 -> p90)) {
        val lo = sorted.count(_ < est) / n
        val hi = sorted.count(_ <= est) / n
        val err = if (q < lo) lo - q else if (q > hi) q - hi else 0.0
        assert(err <= 0.02, f"$et q=$q err $err%.4f")
      }
    }
    // report() surfaces the quantile columns and drops the binary
    val rep = graft.ops.Sketches.report(merged)
    assert(rep.columns.contains("p50_v") && !rep.columns.contains("value_kll"))
    assert(rep.count() === got.size.toLong)
  }

  test("non-default k survives merge/maintain (empty buffer adopts the operand)") {
    // regression: KllMergeAgg's empty DefaultK buffer used to require
    // k-equality against the first real operand, making every kllK other
    // than 256 throw through merge/maintain
    val events = Tables.events(spark, Sf0001)
    val parts = Seq(0, 1).map(i =>
      graft.ops.Sketches.summarize(
        events.filter(pmod(col("event_id"), lit(2)) === i),
        Seq("event_type"), "value", "user_id", kllK = Some(128)))
    val merged = graft.ops.Sketches.merge(
      parts.reduce(_ unionByName _), Seq("event_type"))
    val p50s = merged.select(col("event_type"),
        graft.functions.KllF.quantile(spark, col("value_kll"), 0.5).as("p50"))
      .collect()
    assert(p50s.nonEmpty && p50s.forall(!_.isNullAt(1)))
    val dir = java.nio.file.Files.createTempDirectory("kll_k128").toString
    graft.ops.Sketches.maintain(spark, s"$dir/s", events,
      Seq("event_type"), "value", "user_id", kllK = Some(128))
    assert(spark.read.parquet(s"$dir/s").count() > 0)
  }

  test("batch quantiles == per-q quantile; report decodes the sketch once") {
    val rnd = new scala.util.Random(31)
    val s = KllState.empty(64)
    (1 to 20000).foreach(_ => s.insert(rnd.nextDouble() * 1e4))
    val qs = Array(0.9, 0.01, 0.5, 0.99, 0.1) // unsorted on purpose
    val batch = s.quantiles(qs)
    qs.zipWithIndex.foreach { case (q, i) =>
      assert(batch(i) === s.quantile(q), s"q=$q batch/single disagree")
    }
    // empty sketch: null, not a crash
    assert(KllState.quantilesFromBytes(KllState.empty(64).serialize(),
      Array(0.5)) === null)
  }

  test("maintain recovers the summary from __old after a crash in the rename window") {
    val dir = java.nio.file.Files.createTempDirectory("kll_crash").toString
    val path = s"$dir/summary"
    val events = Tables.events(spark, Sf0001)
    graft.ops.Sketches.maintain(spark, path, events.filter(col("event_id") % 2 === 0),
      Seq("event_type"), "value", "user_id")
    val nAfterFirst = spark.read.parquet(path)
      .agg(sum("n_rows")).head().getLong(0)
    // simulate the crash window: live summary renamed aside, new one never landed
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__old")))
    // next maintain must restore __old (NOT reset to the delta alone)
    graft.ops.Sketches.maintain(spark, path, events.filter(col("event_id") % 2 =!= 0),
      Seq("event_type"), "value", "user_id")
    val total = spark.read.parquet(path).agg(sum("n_rows")).head().getLong(0)
    assert(total === events.count(),
      s"history lost in recovery: $total vs ${events.count()} (first batch held $nAfterFirst)")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__old")))
  }

  test("maintain with kllK: incremental summary percentile == rescan envelope") {
    val dir = java.nio.file.Files.createTempDirectory("kll_maintain").toString
    val path = s"$dir/summary"
    val events = Tables.events(spark, Sf0001)
    Seq(0, 1, 2).foreach { i =>
      graft.ops.Sketches.maintain(spark, path,
        events.filter(pmod(col("event_id"), lit(3)) === i),
        Seq("event_type"), "value", "user_id", kllK = Some(256))
    }
    val maintained = spark.read.parquet(path)
    assert(maintained.columns.contains("value_kll"))
    val p50s = maintained.select(col("event_type"),
        graft.functions.KllF.quantile(spark, col("value_kll"), 0.5).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = events.select(col("event_type"), col("value").cast("double").as("v"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for ((et, est) <- p50s) {
      val sorted = exact(et)
      val n = sorted.length.toDouble
      val lo = sorted.count(_ < est) / n
      val hi = sorted.count(_ <= est) / n
      val err = if (0.5 < lo) lo - 0.5 else if (0.5 > hi) 0.5 - hi else 0.0
      assert(err <= 0.02, f"$et maintained p50 err $err%.4f")
    }
  }
}
