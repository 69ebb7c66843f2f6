package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The other half of the embedding-index bits dial (EmbIdxBench measures
  * the cost side): RECALL of the Hamming<=1 multi-probe contract as
  * `bits` grows. For a twin at angle theta from its base, each plane
  * separates the pair with probability theta/pi, so expected straddles
  * ~ bits*theta/pi and the home+1-flip probe recovers the pair iff at
  * most ONE plane separates it — recall falls as bits rises while cost
  * falls (occupancy ~ corpus/2^bits). This prints the measured recovery
  * rate per (bits, jitter) over planted jittered twins of the real
  * embeddings, giving the sizing rule its second axis.
  */
object EmbRecallProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.embeddings(spark, srcDir)
      .select("vec_id", "embedding").localCheckpoint()
    val n = base.count()
    // jittered unit-renormalized twin: base + N(0, jit) per dim, via
    // deterministic hash-derived uniforms (sum of 2 uniforms ~ triangular
    // is close enough for an angle probe)
    def twins(jit: Double) = {
      val jittered = base.select(col("vec_id"),
        transform(col("embedding"), (x, i) => {
          val u1 = pmod(xxhash64(col("vec_id"), lit("a"), i), lit(100000L))
            .cast("double") / 100000.0
          val u2 = pmod(xxhash64(col("vec_id"), lit("b"), i), lit(100000L))
            .cast("double") / 100000.0
          x + ((u1 + u2 - lit(1.0)) * lit(jit)).cast("float")
        }).as("emb_j"))
      // renormalize to unit length (the corpus contract); norm hoisted
      // out of the lambda (the HOF-CSE rule)
      jittered
        .withColumn("nrm", sqrt(aggregate(transform(col("emb_j"),
          y => y.cast("double") * y.cast("double")), lit(0.0), (a, y) => a + y)))
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("emb_j"), x => (x / col("nrm")).cast("float"))
            .as("embedding"))
    }
    // mean angle between base and twin at this jitter (sanity column)
    def meanAngle(tw: org.apache.spark.sql.DataFrame): Double = {
      graft.functions.DotProductF.register(spark)
      base.join(tw.select((col("vec_id") - lit(1000000L)).as("vec_id"),
          col("embedding").as("emb_t")), "vec_id")
        .select(acos(least(expr("graft_dot_f(embedding, emb_t)")
          .cast("double"), lit(1.0))).as("th"))
        .agg(avg("th")).head().getDouble(0)
    }
    for (jit <- Seq(0.01, 0.03, 0.08)) {
      val tw = twins(jit).localCheckpoint()
      val th = meanAngle(tw)
      val recalls = Seq(8, 12, 16, 24, 32, 48).map { bits =>
        val hb = graft.ops.Similarity
          .embBandTable(base, "vec_id", "embedding", bits = bits)
          .select(col("doc_id"), col("band").cast("long").as("sig_b"))
        val ht = graft.ops.Similarity
          .embBandTable(tw, "vec_id", "embedding", bits = bits)
          .select((col("doc_id") - lit(1000000L)).as("doc_id"),
            col("band").cast("long").as("sig_t"))
        val rec = hb.join(ht, "doc_id")
          .select(bit_count(col("sig_b").bitwiseXOR(col("sig_t"))).as("h"))
          .agg(avg((col("h") <= 1).cast("double"))).head().getDouble(0)
        f"bits=$bits%2d ${rec}%6.3f"
      }
      println(f"jit=$jit%5.2f meanAngle=${th}%6.4f rad  n=$n%d  recall@H<=1: ${recalls.mkString("  ")}")
      // OR-amplification at the hardest setting measured above: recall
      // of any-family Hamming<=1 (the embIndexIngest families contract)
      val famRecalls = Seq(1, 2, 4, 8).map { fam =>
        def fsigs(df: org.apache.spark.sql.DataFrame, shift: Long) = graft.ops.Similarity
          .embBandTable(df, "vec_id", "embedding", bits = 32, families = fam)
          .select((col("doc_id") - lit(shift)).as("doc_id"),
            split(col("band"), ":").as("p"))
          .select(col("doc_id"),
            (if (fam == 1) lit(0) else element_at(col("p"), 1).cast("int")).as("f"),
            element_at(col("p"), -1).cast("long").as("sig"))
        val rec = fsigs(base, 0L).join(
            fsigs(tw, 1000000L).withColumnRenamed("sig", "sig_t"),
            Seq("doc_id", "f"))
          .groupBy("doc_id")
          .agg(max((bit_count(col("sig").bitwiseXOR(col("sig_t"))) <= 1)
            .cast("double")).as("hit"))
          .agg(avg("hit")).head().getDouble(0)
        f"F=$fam ${rec}%6.3f"
      }
      println(f"jit=$jit%5.2f families@bits=32: ${famRecalls.mkString("  ")}")
    }
    spark.stop()
  }
}
