package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall soak for PRODUCTION LSH banding (16 bands × 8 rows, xxhash64
  * family) — the evidence item behind `q_dup_clusters`' scale claim: the
  * oracle-matched 2×2 config is correctness-gated every round, but the
  * 100 TB config needs a measured recall-vs-exact-Jaccard curve.
  *
  * Method: plant near-duplicates with a CONTROLLED similarity spectrum —
  * replica r of each base document replaces every k(r)-th token with a
  * replica-specific marker, so each (base, replica) pair has a known
  * ground-truth identity and a computable exact shingle-Jaccard (no
  * all-pairs scan: exact J is an equi-join on the planted base id, linear
  * in pairs). Empirical band recall per Jaccard bucket is then compared
  * against the standard S-curve `1 - (1 - J^rows)^bands`; matching theory
  * is the strongest available check that the banding implementation is
  * correct at ANY scale, because the curve is scale-free.
  *
  * Also times the full dup-cluster pipeline (LSH → CC → canonical) at 1×
  * and at the planted 10× corpus for the linear-ish growth check.
  */
object LshRecallBench {
  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val numBands = 16
    val rowsPerBand = 8
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.documents(spark, srcDir).select("doc_id", "text")
    // replicas 1..9: replica r mutates every k(r)-th token; k spans 5..29
    // so planted pairs cover shingle-Jaccard ~0.2 .. ~0.9
    val replicas = (1 to 9).map { r =>
      val k = r * 3 + 2
      base.select(
        (col("doc_id") + lit(r * Stride)).as("doc_id"),
        concat_ws(" ", expr(
          s"transform(split(trim(text), '\\\\s+'), (t, i) -> IF((i + 1) % $k = 0, 'zmut$r', t))"
        )).as("text"))
    }
    val corpus = replicas.foldLeft(base)(_ unionByName _)
      .repartition(cpus.toInt).localCheckpoint()
    println(s"corpus: ${corpus.count()} docs (base ${base.count()} x 10 planted)")

    // exact shingle-Jaccard per planted pair: equi-join on the base id
    val sh = corpus
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), array_distinct(
        graft.functions.WordShinglesF.shingles(spark, col("toks"), 3)).as("sh"))
    val planted = sh.filter(col("doc_id") >= Stride)
      .select(pmod(col("doc_id"), lit(Stride)).as("doc_a"), col("doc_id").as("doc_b"),
        col("sh").as("sh_b"))
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) -
            size(array_intersect(col("sh_a"), col("sh_b"))))).as("jaccard"))
      .localCheckpoint()

    // production-banding candidates over the full 10x corpus, timed
    val t0 = System.nanoTime()
    val cands = graft.ops.Dedup.lshCandidatePairs(
        corpus, "doc_id", "text", numBands, rowsPerBand)
      .localCheckpoint()
    val nCands = cands.count()
    val tCand = (System.nanoTime() - t0) / 1e9
    println(f"candidates ${numBands}x$rowsPerBand over 10x corpus: $nCands in $tCand%.1fs")

    // recall per Jaccard bucket vs the S-curve 1-(1-J^rows)^bands
    val hit = planted.join(cands.withColumn("hit", lit(1)),
      Seq("doc_a", "doc_b"), "left")
    val buckets = hit
      .withColumn("bucket", floor(col("jaccard") * 10).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("found"),
        avg("jaccard").as("mean_j"))
      .orderBy("bucket").collect()
    println("bucket  mean_J      n  found  recall  theory")
    buckets.foreach { r =>
      val j = r.getDouble(3)
      val theory = 1.0 - math.pow(1.0 - math.pow(j, rowsPerBand), numBands)
      println(f"  0.${r.getInt(0)}x  $j%6.3f ${r.getLong(1)}%6d ${r.getLong(2)}%6d " +
        f"${r.getLong(2).toDouble / r.getLong(1)}%7.3f  $theory%6.3f")
    }
    val high = hit.filter(col("jaccard") >= 0.8)
      .agg(count(lit(1)), sum(coalesce(col("hit"), lit(0)))).head()
    println(f"recall @ J>=0.8: ${high.getLong(1).toDouble / high.getLong(0)}%.4f " +
      f"(${high.getLong(1)}/${high.getLong(0)})")

    // end-to-end dup-cluster pipeline (LSH -> CC -> canonical) at 1x / 10x
    def pipeline(docs: DataFrame): Double = {
      val t = System.nanoTime()
      val pairs = graft.ops.Dedup.lshCandidatePairs(
        docs, "doc_id", "text", numBands, rowsPerBand)
      val labels = graft.ops.Graph.connectedComponents(
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      docs.select(col("doc_id"))
        .join(labels.withColumnRenamed("node_id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("canonical"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    val t1x = pipeline(base)
    val t10x = pipeline(corpus)
    println(f"dup-cluster pipeline ${numBands}x$rowsPerBand: 1x=$t1x%.1fs 10x=$t10x%.1fs " +
      f"ratio=${t10x / t1x}%.1f")
    spark.stop()
  }
}
