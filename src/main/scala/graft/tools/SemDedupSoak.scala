package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale point for `Similarity.semanticDedup` on the 100×-replicated
  * jittered corpus (EmbIdxBench's construction: every vector has ~99
  * planted near-twins at ~0.005 rad): wall, keeper count, and the
  * cell-boundary split rate at corpus-scaled nlist. The method's cost
  * contract is per-cell (n/nlist)² — nlist must grow with the corpus —
  * so the soak runs the nlist ladder and reports the within-cell pair
  * count next to the wall.
  */
object SemDedupSoak {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val replicas = args.lift(2).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.embeddings(spark, srcDir)
      .select("vec_id", "embedding")
    val reps = spark.range(replicas).select(col("id").as("rep"))
    val corpus = base.crossJoin(reps)
      .select((col("vec_id") * replicas + col("rep")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), col("rep"), i), lit(4000L))
            .cast("double") / 1e6 - 0.002).cast("float")))
          .as("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val n = corpus.count()
    val nBases = n / replicas
    println(s"corpus: $n vectors ($replicas x $nBases planted clusters)")

    // production nlist via the two-level CoarseAssign route (r15, VERDICT
    // #6): FlatAssign's per-row argmax is nlist-linear and tops out around
    // ~1k cells; CoarseAssign groups centroids under nCoarse coarse means
    // and probes wProbe groups per row — the route every production-nlist
    // IVF build here uses (IvfProdBench). Same dedup semantics.
    val ladder = Seq[(Int, graft.ops.IvfIndex.AssignRoute)](
      (256, graft.ops.IvfIndex.FlatAssign),
      (1024, graft.ops.IvfIndex.FlatAssign),
      (8192, graft.ops.IvfIndex.CoarseAssign(nCoarse = 128, wProbe = 8)))
    ladder.foreach { case (nlist, route) =>
      val t = System.nanoTime()
      val res = graft.ops.Similarity
        .semanticDedup(corpus, nlist = nlist, minCos = 0.99, route = route)
        .localCheckpoint()
      val wall = (System.nanoTime() - t) / 1e9
      val keepers = res.filter(col("is_dup") === 0).count()
      // a planted cluster that stayed whole keeps exactly 1; boundary
      // splits add one keeper per extra fragment
      val splitFrags = keepers - nBases
      val cells = res.select("cell").distinct().count()
      val routeS = if (route == graft.ops.IvfIndex.FlatAssign) "flat"
      else "coarse"
      println(f"nlist=$nlist%5d ($routeS%6s)  wall=${wall}%7.1fs  " +
        f"keepers=$keepers%7d (extra fragments=$splitFrags%d over " +
        f"$nBases%d clusters)  liveCells=$cells%d")
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(res)
    }

    // tie the r14 cell-BUCKETED layout into the SemDeDup family: build at
    // the production nlist via CoarseAssign, persist the kept corpus as a
    // serving index through saveQuantizedBucketed (constant directory
    // count), and re-read it — the dedup → serving-index handoff a corpus
    // build actually performs
    println("\nkept-corpus -> bucketed serving index (nlist=8192, coarse):")
    val t0 = System.nanoTime()
    val dedup = graft.ops.Similarity.semanticDedup(corpus, nlist = 8192,
      minCos = 0.99,
      route = graft.ops.IvfIndex.CoarseAssign(nCoarse = 128, wProbe = 8))
      .localCheckpoint()
    val keptIds = dedup.filter(col("is_dup") === 0).select("vec_id")
    val keptCorpus = corpus.join(keptIds, Seq("vec_id"), "left_semi")
      .localCheckpoint()
    val tDedup = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val model = graft.ops.IvfIndex.build(keptCorpus, nlist = 8192, iters = 1,
      route = graft.ops.IvfIndex.CoarseAssign(nCoarse = 128, wProbe = 8))
    val params = graft.ops.Quantize.fitSq8(model.assignments, "embedding")
    val dir = java.nio.file.Files.createTempDirectory("semdedup_idx").toString
    graft.ops.IvfIndex.saveQuantizedBucketed(model, dir, params,
      cellBuckets = 256)
    val tSave = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val served = graft.ops.IvfIndex.searchTopKBatch(
      graft.ops.IvfIndex.load(spark, dir), Seq(0L, 101L, 20002L), k = 5,
      nprobe = 16).count()
    val tSearch = (System.nanoTime() - t2) / 1e9
    println(f"dedup=${tDedup}%6.1fs  kept=${keptCorpus.count()}%,d  " +
      f"buildAndSave=${tSave}%6.1fs  warmSearch(3 probes)=${tSearch}%5.2fs " +
      f"(rows=$served)")
    spark.stop()
  }
}
