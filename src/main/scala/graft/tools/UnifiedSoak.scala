package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growing-index soak of the UNIFIED text+vector build
  * ([[graft.streaming.StreamOps.unifiedStep]] — the streaming loop's
  * exact step): the two sub-flows' flat-wall claims are soaked
  * separately (CurationSoak, VecFlowSoak) and the composition's
  * additive cost is FlowProfile'd; this closes the triangle by driving
  * the composed step against ALL FIVE growing stores at once.
  *
  * Corpus per batch: `rows` gate-passing docs with (batch, doc,
  * position)-hashed words (CurationSoak's recipe — every doc distinct,
  * ~all kept), HALF of them carrying a distinct hash-seeded unit
  * embedding (VecFlowSoak's recipe — partial modality, the realistic
  * shape), plus per-batch planted twins of batch 0: 1% exact-text
  * copies (exact_history via the text digest) and 1% paraphrases —
  * FRESH text over a nudged copy of a batch-0 embedding
  * (semdup_history via the vector stage; invisible to text banding).
  */
object UnifiedSoak {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(15)
    val rows = args.lift(1).map(_.toInt).getOrElse(10000)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(8)
    val bits = args.lift(3).map(_.toInt).getOrElse(24)
    val dim = 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def unitVec(idCol: org.apache.spark.sql.Column) = {
      val comps = (0 until dim).map(j =>
        (pmod(xxhash64(idCol, lit(j)), lit(1000000L)).cast("double")
          / lit(500000.0) - lit(1.0)))
      val arr = array(comps.map(_.cast("float")): _*)
      val nrm = sqrt(aggregate(transform(arr,
        x => x.cast("double") * x.cast("double")), lit(0.0), _ + _))
      transform(arr, x => (x.cast("double") / nrm).cast("float"))
    }
    def text(idCol: org.apache.spark.sql.Column, tag: String) = {
      val words = (0 until 20).map(j =>
        concat(lit("w"), substring(md5(concat(idCol, lit(s"_${tag}_p$j"))),
          1, 7)))
      concat(lit("the of "), concat_ws(" ", words: _*))
    }
    def mkBatch(b: Int) = {
      val id = col("id") * batches + b
      val fresh = spark.range(rows).select(id.as("doc_id"),
        text(id, s"b$b").as("text"),
        when(col("id") % 2 === 0, unitVec(id)).otherwise(lit(null))
          .as("embedding"))
      val out = if (b == 0) fresh else {
        // twins target KEPT batch-0 docs: row index k = id*100+1 (odd ⇒
        // no embedding, never ≡0 mod 100 after ×batches ⇒ never a bench
        // doc) for exact-text copies, k = id*100+2 (even ⇒ embedded,
        // non-bench) for paraphrases — a first cut targeted k = id*100,
        // which is ALWAYS a benchmark doc: batch 0 dropped every
        // target, the copies matched only bench shingles
        // (contaminated), and the paras deduped against EACH OTHER
        val kCopy = (col("id") * 100 + 1) * batches
        val copies = spark.range(rows / 100)
          .select((col("id") + 50000000L + b * 100000L).as("doc_id"),
            text(kCopy, "b0").as("text"), lit(null).cast("array<float>")
              .as("embedding"))
        // fresh text, per-batch-distinct nudge of the batch-0 embedding:
        // invisible to text banding, must drop via the vector stage
        val kPara = (col("id") * 100 + 2) * batches
        val para = spark.range(rows / 100)
          .select((col("id") + 70000000L + b * 100000L).as("doc_id"),
            text(col("id") + b * 100000L, s"para$b").as("text"),
            transform(unitVec(kPara), (x, i) =>
              when(i === 0, (x.cast("double") + b * 1e-5).cast("float"))
                .otherwise(x)).as("embedding"))
        fresh.unionByName(copies).unionByName(para)
      }
      out.withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "n_chars", "embedding")
    }
    val bench = graft.ops.CurationFlow.benchShingles(
      mkBatch(0).select("doc_id", "text", "n_chars"))
    val vec = graft.ops.VectorFlow.Params(dim = dim, bits = bits)
    val base = java.nio.file.Files.createTempDirectory("uni_soak").toString
    println(s"unified soak: $batches batches x $rows docs (50% with " +
      s"vectors), compactEvery=$compactEvery, bits=$bits")
    (0 until batches).foreach { b =>
      val t = System.nanoTime()
      graft.streaming.StreamOps.unifiedStep(s"$base/idx", s"$base/out",
        bench, 256L, 16, vec = vec, compactEvery = compactEvery)(
        mkBatch(b), b.toLong)
      val wall = (System.nanoTime() - t) / 1e9
      val Some((_, _, cursor)) =
        graft.ops.CurationFlow.readLedger(spark, s"$base/idx")
      val mix = spark.read.parquet(s"$base/out")
        .filter(col("batch_id") === b)
        .groupBy("status").count()
        .collect().map(x => s"${x.getString(0)}=${x.getLong(1)}")
        .sorted.mkString(" ")
      println(f"batch $b%3d  wall=$wall%6.2fs  cursor=$cursor%,14d  [$mix]")
      // planted verdicts must name the EXPECTED stage, not just "drop"
      // (r15 verdict #5 — the id·100 lesson above was caught by exactly
      // this check done by hand; now the soak enforces it every batch):
      // every exact-text copy is exact_history, every paraphrase
      // semdup_history — a planted doc landing any OTHER status (kept,
      // contaminated, neardup_batch...) means the probe under test
      // silently stopped testing what it claims
      if (b > 0) {
        // a planted id ≡ 0 mod 100 IS a benchmark doc — the eval-set
        // rule outranks the twin by the flow's stage order (the r15
        // SCALE note's one-benchmark-per-batch row); every OTHER
        // planted doc must land exactly its stage
        val planted = spark.read.parquet(s"$base/out")
          .filter(col("batch_id") === b && col("doc_id") >= 50000000L &&
            pmod(col("doc_id"), lit(100)) =!= 0)
        val bad = planted.filter(
          (col("doc_id") < 70000000L && col("status") =!= "exact_history") ||
            (col("doc_id") >= 70000000L && col("status") =!= "semdup_history"))
          .count()
        require(bad == 0,
          s"batch $b: $bad planted docs missed their expected stage — " +
            planted.groupBy("status").count().collect().mkString(", "))
      }
    }
    spark.stop()
  }
}
