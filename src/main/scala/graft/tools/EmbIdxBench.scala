package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the persisted EMBEDDING band index
  * (Similarity.embIndexIngest):
  *
  *   1. the `bits` dial — home-band cardinality and max occupancy as
  *      bits grows (the signature width must scale with
  *      log2(corpus / target-occupancy), or every band saturates);
  *   2. per-batch ingest wall as the index grows (the continuous-ingest
  *      cost shape — stored side stays scan-local + broadcast-probed);
  *   3. the saturated regime (bits too small for the corpus): exact
  *      probe's candidate blow-up vs the bounded form's linear output.
  *
  * Corpus: the sf embeddings replicated `replicas`× with deterministic
  * per-copy jitter (hash-derived, ±0.002/dim) — keeps the signature
  * distribution realistic while growing the corpus.
  */
object EmbIdxBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val replicas = args.lift(2).map(_.toInt).getOrElse(100)
    val nBatches = args.lift(3).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Local-iteration aid: SPARK_GRAFT_EMB_SECTIONS=4 (comma list) runs
    // a subset of the sections; bare runs do all.
    val section: Int => Boolean = sys.env.get("SPARK_GRAFT_EMB_SECTIONS")
      .map(_.split(",").map(_.trim.toInt).toSet)
      .map(ks => ks.contains(_: Int)).getOrElse(_ => true)

    val base = graft.Tables.embeddings(spark, srcDir)
      .select("vec_id", "embedding")
    val reps = spark.range(replicas).select(col("id").as("rep"))
    // jittered replica corpus; `spreadMilli` = per-dim noise amplitude in
    // 1/1000ths (2 → the ~0.005-rad twin corpus of sections 1-3; 20 →
    // the ~0.09-rad production duplicate angle of section 4)
    def mkCorpus(spreadMilli: Int) = base.crossJoin(reps)
      .select((col("vec_id") * replicas + col("rep")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), col("rep"), i),
              lit(2000L * spreadMilli))
            .cast("double") / 1e6 - spreadMilli / 1000.0).cast("float")))
          .as("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    // corpus is LAZY so a section-4-only run (SPARK_GRAFT_EMB_SECTIONS=4)
    // never materializes the sections-1-3 twin corpus it won't read; n is
    // exact from the base count (the replica cross join multiplies it)
    lazy val corpus = mkCorpus(2)
    val n = base.count() * replicas
    println(s"corpus: $n vectors ($replicas x ${n / replicas})")

    // 1. bits dial: band cardinality / occupancy
    if (section(1)) Seq(8, 12, 16, 20).foreach { bits =>
      val home = graft.ops.Similarity
        .embBandTable(corpus, "vec_id", "embedding", bits = bits)
      val s = home.groupBy("band").count()
        .agg(count(lit(1)), max("count"), avg("count")).head()
      println(f"bits=$bits%2d  bands=${s.getLong(0)}%7d  maxOcc=${s.getLong(1)}%7d  avgOcc=${s.getDouble(2)}%9.1f")
    }

    // 2. growing-index ingest at bits sized for the corpus (avg occ ~3)
    if (section(2)) {
    val bits = math.min(20,
      math.max(8, (math.log(n / 3.0) / math.log(2)).ceil.toInt))
    println(s"ingest sweep at bits=$bits, $nBatches batches")
    val dir = java.nio.file.Files.createTempDirectory("emb_bench").toString + "/idx"
    var stored = 0L
    (0 until nBatches).foreach { i =>
      val batch = corpus.filter(pmod(col("vec_id"), lit(nBatches)) === i)
      val t = System.nanoTime()
      val pairs = graft.ops.Similarity
        .embIndexIngest(dir, batch, bits = bits).count()
      val s = (System.nanoTime() - t) / 1e9
      stored += batch.count()
      println(f"batch $i%2d  wall=${s}%6.2fs  pairs=$pairs%9d  indexRows=$stored%9d")
    }
    }

    // 3. saturated regime: bits=8 over this corpus means every band is
    // hot — exact probe blows up, bounded stays linear
    if (section(3)) {
    val dirE = java.nio.file.Files.createTempDirectory("emb_sat").toString
    val hist = corpus.filter(pmod(col("vec_id"), lit(nBatches)) =!= 0)
    val arr = corpus.filter(pmod(col("vec_id"), lit(nBatches)) === 0)
    graft.ops.Dedup.bandIndexAppendPrecomputed(dirE + "/ex",
      graft.ops.Similarity.embBandTable(hist, "vec_id", "embedding", bits = 8))
    graft.ops.Dedup.bandIndexAppendPrecomputed(dirE + "/bd",
      graft.ops.Similarity.embBandTable(hist, "vec_id", "embedding", bits = 8))
    val tE = System.nanoTime()
    val exPairs = graft.ops.Similarity
      .embIndexIngest(dirE + "/ex", arr, bits = 8).count()
    println(f"saturated exact   : wall=${(System.nanoTime() - tE) / 1e9}%7.1fs  pairs=$exPairs%12d")
    val tB = System.nanoTime()
    val bd = graft.ops.Similarity
      .embIndexIngestBounded(dirE + "/bd", arr, bits = 8, maxBucket = 1024)
    val bdPairs = bd.pairs.count()
    val sup = bd.overflow.agg(sum("suppressed")).head().getLong(0)
    println(f"saturated bounded : wall=${(System.nanoTime() - tB) / 1e9}%7.1fs  pairs=$bdPairs%12d  suppressed=$sup%d")
    }

    // 4. the production recall point THROUGH the ingest path: F=4 ×
    // bits=32 vs F=1 × bits=32 on the ~0.09-rad duplicate-angle corpus
    // (independent ±0.02/dim jitters → pairwise sibling angle ~0.13 rad
    // — the regime where one 32-bit family's Hamming≤1 recall collapses
    // and OR-amplification is the fix; EmbRecallProbe measured this on
    // the CONTRACT, this section measures it on the INDEX path: sharded
    // ingest, per-batch wall, recall = recovered same-base pairs /
    // (nBases × C(replicas, 2))).
    if (section(4)) {
      val prod = mkCorpus(20)
      val nBases = n / replicas
      val allTwinPairs = nBases * (replicas.toLong * (replicas - 1) / 2)
      Seq(1, 4).foreach { fam =>
        val dirP = java.nio.file.Files.createTempDirectory("emb_prod").toString + "/idx"
        println(s"ingest sweep F=$fam bits=32, $nBatches batches")
        var total = 0L
        (0 until nBatches).foreach { i =>
          val batch = prod.filter(pmod(col("vec_id"), lit(nBatches)) === i)
          val t = System.nanoTime()
          val got = graft.ops.Similarity
            .embIndexIngest(dirP, batch, bits = 32, families = fam)
            .localCheckpoint()
          val pairs = got.count()
          val twins = got.filter(
            col("doc_a").divide(replicas).cast("long") ===
            col("doc_b").divide(replicas).cast("long")).count()
          org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(got)
          val s = (System.nanoTime() - t) / 1e9
          total += twins
          println(f"batch $i%2d  wall=${s}%6.2fs  pairs=$pairs%9d  twinPairs=$twins%9d")
        }
        println(f"F=$fam%d bits=32: recall THROUGH the index = $total%,d / $allTwinPairs%,d = ${total.toDouble / allTwinPairs}%.4f")
      }
    }
    spark.stop()
  }
}
