package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SQ8 storage-vs-recall trade, measured — the justification for
  * [[graft.ops.Quantize]]. Persists the sf embeddings twice (float32
  * parquet vs 1-byte-code parquet), reports on-disk bytes, then serves the
  * same probe batch from both and reports top-k recall of the quantized
  * serving against exact, plus the scoring wall for each. The BYTES ratio
  * is the number that scales: at 100 TB of embeddings it is the scan
  * bandwidth, cache footprint, and replication cost divisor a cluster pays
  * on every search; recall is the price, and it should sit near 1.0 for
  * SQ8 on unit-normalized corpora (64-dim fixture here).
  */
object QuantBench {

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val nProbes = args.lift(3).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Quantize, Similarity}

    val emb = graft.Tables.embeddings(spark, srcDir).localCheckpoint()
    val n = emb.count()
    val params = Quantize.fitSq8(emb)

    val base = java.nio.file.Files.createTempDirectory("quant_bench").toString
    emb.write.mode("overwrite").parquet(s"$base/float32")
    Quantize.encodeCorpus(emb, params).write.mode("overwrite")
      .parquet(s"$base/sq8")

    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(path).getLength
    }
    val fBytes = dirBytes(s"$base/float32")
    val qBytes = dirBytes(s"$base/sq8")

    val floatCorpus = spark.read.parquet(s"$base/float32").localCheckpoint()
    val codeCorpus = spark.read.parquet(s"$base/sq8").localCheckpoint()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val probeIds = (0L until nProbes.toLong).toSeq
    var hit = 0
    var total = 0
    val (_, exactWall) = time {
      probeIds.foreach { pid =>
        Similarity.cosineTopK(floatCorpus, pid, k).collect()
      }
    }
    val (_, quantWall) = time {
      probeIds.foreach { pid =>
        val probe = floatCorpus.filter(col("vec_id") === pid)
          .select(col("embedding").as("probe_emb"))
        Quantize.topKQuantized(
          codeCorpus.filter(col("vec_id") =!= pid), probe, k, params).collect()
      }
    }
    val exactSetsAll: Map[Long, Set[Long]] = probeIds.map { pid =>
      pid -> Similarity.cosineTopK(floatCorpus, pid, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap
    probeIds.foreach { pid =>
      val probe = floatCorpus.filter(col("vec_id") === pid)
        .select(col("embedding").as("probe_emb"))
      val quant = Quantize.topKQuantized(
          codeCorpus.filter(col("vec_id") =!= pid), probe, k, params)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      hit += exactSetsAll(pid).count(quant.contains)
      total += exactSetsAll(pid).size
    }

    println(f"""{"tool":"QuantBench","rows":$n,"float_bytes":$fBytes,""" +
      f""""sq8_bytes":$qBytes,"bytes_ratio":${fBytes.toDouble / qBytes}%.2f,""" +
      f""""recall_at_$k":${hit.toDouble / total}%.4f,""" +
      f""""exact_wall_s":$exactWall%.1f,"quant_wall_s":$quantWall%.1f,""" +
      f""""probes":$nProbes}""")

    // PQ rung of the ladder: m=8 -> 8 bytes/vector (32x raw), ADC serving
    import graft.ops.Pq
    val pqModel = Pq.fit(emb, m = 8, iters = 2)
    Pq.encodeCorpus(emb, pqModel).write.mode("overwrite")
      .parquet(s"$base/pq8")
    val pqBytes = dirBytes(s"$base/pq8")
    val pqCorpus = spark.read.parquet(s"$base/pq8").localCheckpoint()
    var pqHit = 0
    var pqTotal = 0
    val (_, pqWall) = time {
      probeIds.foreach { pid =>
        val pv = floatCorpus.filter(col("vec_id") === pid)
          .select("embedding").head().getSeq[Float](0).toArray
        val got = Pq.adcTopK(pqCorpus.filter(col("vec_id") =!= pid), pv, k,
            pqModel)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        pqHit += exactSetsAll(pid).count(got.contains)
        pqTotal += exactSetsAll(pid).size
      }
    }
    println(f"""{"tool":"QuantBench","codec":"pq8","rows":$n,""" +
      f""""pq_bytes":$pqBytes,"bytes_ratio_vs_float":${fBytes.toDouble / pqBytes}%.2f,""" +
      f""""recall_at_$k":${pqHit.toDouble / pqTotal}%.4f,"pq_wall_s":$pqWall%.1f}""")

    // IVFPQ serving comparison: the same PQ-coded index served by the ADC
    // fast path (m lookup reads/row, no decode) vs the generic loaded
    // path (codegen decode + dot). Same index, same probes, nprobe=4.
    locally {
      import graft.ops.IvfIndex
      val ivfModel = IvfIndex.build(emb, nlist = 16, iters = 1)
      val dirPq = java.nio.file.Files.createTempDirectory("qb_ivfpq").toString
      IvfIndex.saveQuantizedPq(ivfModel, dirPq, pqModel)
      val servingProbes = probeIds.take(32).map { pid =>
        pid -> floatCorpus.filter(col("vec_id") === pid)
          .select("embedding").head().getSeq[Float](0).toArray
      }
      val (_, adcWall) = time {
        IvfIndex.searchTopKBatchAdc(spark, dirPq, servingProbes, k,
          nprobe = 4).collect()
      }
      val loadedPq = IvfIndex.load(spark, dirPq)
      val rawProbes = floatCorpus
        .filter(col("vec_id").isInCollection(servingProbes.map(_._1)))
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
      val (_, decWall) = time {
        IvfIndex.searchTopKBatch(loadedPq, rawProbes, k, nprobe = 4,
          excludeSelf = true).collect()
      }
      println(f"""{"tool":"QuantBench","serving":"ivfpq","nprobe":4,""" +
        f""""adc_wall_s":$adcWall%.1f,"decode_wall_s":$decWall%.1f}""")

      // two-stage serving: ADC candidates -> exact re-rank over the
      // full-precision corpus. The question the curve answers: how many
      // candidates buy back how much of PQ's lossy recall, and at what
      // wall cost vs plain ADC? (cand = k degenerates to "exact-rescore
      // the ADC answer"; the interesting regime is small multiples of k.)
      val exactTop = servingProbes.map { case (pid, _) =>
        pid -> graft.ops.Similarity.cosineTopK(floatCorpus, pid, k)
          .collect().map(_.getLong(0)).toSet
      }.toMap
      Seq(k, 3 * k, 10 * k).foreach { cand =>
        var res: Map[Long, Set[Long]] = Map.empty
        val (_, w) = time {
          res = IvfIndex.searchTopKBatchAdcRerank(spark, dirPq,
              servingProbes, k, nprobe = 4, cand = cand, corpus = floatCorpus)
            .collect().map(r => (r.getLong(0), r.getLong(1)))
            .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        }
        val hit = servingProbes.map { case (pid, _) =>
          exactTop(pid).count(res.getOrElse(pid, Set.empty).contains) }.sum
        val tot = servingProbes.map { case (pid, _) => exactTop(pid).size }.sum
        println(f"""{"tool":"QuantBench","serving":"ivfpq_rerank","nprobe":4,""" +
          f""""cand":$cand,"recall_at_$k":${hit.toDouble / tot}%.4f,""" +
          f""""wall_s":$w%.1f}""")
      }
    }

    // partial-probe sweep: ONE coarse quantizer saved both ways, so the
    // cell structure is identical and any recall gap at a given nprobe is
    // attributable to the SQ8 grid alone (does quantization interact with
    // the nprobe dial?)
    import graft.ops.IvfIndex
    val nlist = 16
    val model = IvfIndex.build(emb, nlist = nlist, iters = 2)
    val dirIF = java.nio.file.Files.createTempDirectory("qb_ivf_f").toString
    val dirIQ = java.nio.file.Files.createTempDirectory("qb_ivf_q").toString
    IvfIndex.save(model, dirIF)
    IvfIndex.saveQuantized(model, dirIQ, params)
    val mF = IvfIndex.load(spark, dirIF)
    val mQ = IvfIndex.load(spark, dirIQ)
    val sweepProbes = probeIds.take(32)
    val exactSets = sweepProbes.map(pid => pid -> exactSetsAll(pid)).toMap
    Seq(1, 2, 4, 8, nlist).foreach { nprobe =>
      var h = 0; var t = 0
      def recallOf(m: IvfIndex.Model): Double = {
        h = 0; t = 0
        val res = IvfIndex.searchTopKBatch(m, sweepProbes, k, nprobe)
          .collect().groupBy(_.getLong(0))
        sweepProbes.foreach { pid =>
          val got = res.getOrElse(pid, Array.empty).map(_.getLong(1)).toSet
          h += exactSets(pid).count(got.contains); t += exactSets(pid).size
        }
        h.toDouble / t
      }
      val rF = recallOf(mF)
      val rQ = recallOf(mQ)
      println(f"""{"tool":"QuantBench","sweep":"nprobe","nprobe":$nprobe,""" +
        f""""recall_float":$rF%.4f,"recall_sq8":$rQ%.4f}""")
    }
    spark.stop()
  }
}
