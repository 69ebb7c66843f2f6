package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Continuous-corpus-build soak: [[graft.ops.CurationFlow.ingest]]'s
  * scale claim is "per-batch cost independent of corpus size" — the
  * arriving batch broadcasts and both history probes are bucket-PRUNED
  * scan-local reads, so the wall should stay FLAT while the persisted
  * digest + band indexes grow by one kept batch per step.
  *
  * Corpus: N batches of `rows` synthetic gate-passing documents whose
  * words are (batch, doc, position)-hashed — every doc distinct, so
  * ~every doc is KEPT and the index genuinely grows by a full batch per
  * step (a first attempt replayed tagged sf0.1 replicas, but a tail tag
  * doesn't defeat minhash banding: neardup_history swallowed the
  * replicas and the index never grew — crawl-grade dup density is
  * BandIndexBench territory; THIS soak isolates index-growth cost).
  * Prints per-batch wall, decision mix, and the cursor.
  */
object CurationSoak {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nBase = graft.Tables.documents(spark, srcDir).count()
    println(s"synthetic corpus: $nBase docs x $replicas batches")
    def mkBatch(rep: Int) = {
      // 22 tokens: 2 stopwords + 20 distinct hashed words — passes every
      // gate, shares no shingles across docs
      val wordCols = (0 until 20).map(j =>
        concat(lit("w"), substring(md5(concat(col("id"),
          lit(s"_b${rep}_p$j"))), 1, 7)))
      spark.range(nBase).select(
        (col("id") * replicas + rep).as("doc_id"),
        concat(lit("the of "), concat_ws(" ", wordCols: _*)).as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    val bench = graft.ops.CurationFlow.benchShingles(mkBatch(0))
    val dir = java.nio.file.Files.createTempDirectory("cur_soak").toString
    var cursor = 0L
    var keptTotal = 0L
    (0 until replicas).foreach { rep =>
      val batch = mkBatch(rep)
      val t = System.nanoTime()
      val r = graft.ops.CurationFlow.ingest(dir, batch, bench, cursor)
      val mix = r.decisions.groupBy("status").count()
        .collect().map(x => s"${x.getString(0)}=${x.getLong(1)}")
        .sorted.mkString(" ")
      val wall = (System.nanoTime() - t) / 1e9
      cursor = r.cursor
      keptTotal += r.decisions.filter(col("status") === "kept").count()
      println(f"batch $rep%2d  wall=$wall%6.2fs  cursor=$cursor%,12d  keptTotal=$keptTotal%,9d  [$mix]")
    }

    // 2. the spam storm: one batch where half the docs are a single
    // near-dup family (shared base + per-doc tail word — every member
    // band-matches every other), against a seeded history. Exact route
    // vs the star cap: wall, decision mix, overflow report.
    println("\nspam-storm batch (50% one near-dup family) exact vs maxBucket:")
    val stormWords = (0 until 20).map(j =>
      concat(lit("s"), substring(md5(concat(col("id"), lit(s"_p$j"))), 1, 7)))
    def stormBatch = {
      val distinct = spark.range(nBase / 2).select(
        (col("id") * 2 + 1000000L).as("doc_id"),
        concat(lit("the of "), concat_ws(" ", stormWords: _*)).as("text"))
      val famBase = "the of " + (0 until 20).map(j => s"spam$j").mkString(" ")
      val spam = spark.range(nBase / 2).select(
        (col("id") * 2 + 1000001L).as("doc_id"),
        concat(lit(famBase + " t"), col("id").cast("string")).as("text"))
      distinct.unionByName(spam)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    Seq(Int.MaxValue, 1024, 64).foreach { cap =>
      val d = java.nio.file.Files.createTempDirectory("cur_storm").toString
      graft.ops.CurationFlow.ingest(d, mkBatch(0), bench, 0L) // history
      val t = System.nanoTime()
      val st = graft.ops.CurationFlow.decide(d, stormBatch, bench, 0L,
        maxBucket = cap)
      val mix = st.decisions.groupBy("status").count()
        .collect().map(x => s"${x.getString(0)}=${x.getLong(1)}")
        .sorted.mkString(" ")
      val ov = st.overflow.agg(coalesce(sum("suppressed"), lit(0L)),
        count(lit(1))).head()
      val wall = (System.nanoTime() - t) / 1e9
      val capS = if (cap == Int.MaxValue) "exact" else s"cap=$cap"
      println(f"$capS%10s  wall=$wall%6.2fs  hotBands=${ov.getLong(1)}%3d  suppressedPairs=${ov.getLong(0)}%,12d  [$mix]")
    }
  }
}
