package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growing-index soak of the VECTOR corpus build
  * ([[graft.streaming.StreamOps.vectorCurationStep]] — the streaming
  * loop's exact step): N batches of `rows` synthetic vectors against
  * the persisted digest + hyperplane + kept-vector stores, with
  * scheduled compaction every `compactEvery` batches. The scale claims
  * under test, printed per batch:
  *   - wall FLAT while the three stores grow by one kept batch per step
  *     (batch broadcasts; history reads are bucket-pruned);
  *   - file counts BOUNDED by compaction (one file per bucket after
  *     each fold) instead of one-per-(batch, touched bucket) growth;
  *   - decision mix and the kept-count cursor.
  *
  * Corpus: per batch, `rows` hash-seeded random unit vectors (dim 32 —
  * random directions never meet a 0.99-cosine threshold, so ~every
  * vector is KEPT and the index genuinely grows), plus a planted
  * 1%-slice of exact twins of batch 0 (exercising the exact_history
  * probe against ever-older history). A final SPAM-STORM batch (half
  * the rows one near-identical family) contrasts the exact route with
  * the hot-bucket star cap.
  */
object VecFlowSoak {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(40)
    val rows = args.lift(1).map(_.toInt).getOrElse(20000)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(8)
    // signature width sized for the END-of-soak corpus (the sizeBands
    // occupancy rule): 8-bit signatures put 100k random vectors into 256
    // buckets - occupancy ~400, candidate joins quadratic in it, wall
    // DOUBLING over the soak (measured 21 s -> 56 s by batch 10). 24 bits
    // = 16M buckets keeps expected occupancy < 1 through 40 batches.
    val bits = args.lift(3).map(_.toInt).getOrElse(24)
    val dim = 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // unit vector seeded by (id, j): xxhash64 -> [-1, 1] per component,
    // normalized; id-distinct directions (never cosine-0.99 close in
    // 32-dim unless planted)
    def unitVec(idCol: org.apache.spark.sql.Column) = {
      val comps = (0 until dim).map(j =>
        (pmod(xxhash64(idCol, lit(j)), lit(1000000L)).cast("double")
          / lit(500000.0) - lit(1.0)))
      val arr = array(comps.map(_.cast("float")): _*)
      val nrm = sqrt(aggregate(transform(arr,
        x => x.cast("double") * x.cast("double")), lit(0.0), _ + _))
      transform(arr, x => (x.cast("double") / nrm).cast("float"))
    }
    def mkBatch(b: Int) = {
      val fresh = spark.range(rows)
        .select((col("id") * batches + b).as("vec_id"),
          unitVec(col("id") * batches + b).as("embedding"))
      if (b == 0) fresh
      else // 1% exact twins of batch 0's keeps, probing ever-older history
        fresh.unionByName(spark.range(rows / 100)
          .select((col("id") * batches * 100 + b + 50000000L).as("vec_id"),
            unitVec(col("id") * 100 * batches.toLong).as("embedding")))
    }
    def partFiles(path: String): Int = {
      val root = new java.io.File(path)
      if (!root.exists()) 0
      else {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
            .flatMap(walk) else Seq(f)
        walk(root).count(_.getName.endsWith(".parquet"))
      }
    }

    val base = java.nio.file.Files.createTempDirectory("vec_soak").toString
    val p = graft.ops.VectorFlow.Params(dim = dim, bits = bits)
    println(s"vector soak: $batches batches x $rows vectors, " +
      s"compactEvery=$compactEvery, dim=$dim, bits=$bits")
    (0 until batches).foreach { b =>
      val t = System.nanoTime()
      graft.streaming.StreamOps.vectorCurationStep(
        s"$base/idx", s"$base/out", p, compactEvery)(mkBatch(b), b.toLong)
      val wall = (System.nanoTime() - t) / 1e9
      val Some((_, _, cursor)) =
        graft.ops.CurationFlow.readLedger(spark, s"$base/idx")
      if (b % 4 == 0 || b == batches - 1) {
        val files = Seq("digest", "bands", "vectors")
          .map(s => s"$s=${partFiles(s"$base/idx/$s")}").mkString(" ")
        println(f"batch $b%3d  wall=$wall%6.2fs  kept=$cursor%,12d  files: $files")
      } else println(f"batch $b%3d  wall=$wall%6.2fs  kept=$cursor%,12d")
    }

    // spam storm: half the batch one near-identical family
    println("\nspam-storm batch (50% one family, jittered last component):")
    def storm = {
      val distinct = spark.range(rows / 2)
        .select((col("id") + 90000000L).as("vec_id"),
          unitVec(col("id") + 90000000L).as("embedding"))
      // family: a fixed direction with a tiny PER-MEMBER last-component
      // jitter — near-identical (cos >> .99) but never byte-identical,
      // so the whole family exercises the LSH route, not the digest
      // stage (a first cut used id % 97 and 98% of the family silently
      // collapsed as exact_batch digests)
      val famBase = unitVec(lit(424242L))
      val fam = spark.range(rows / 2)
        .select((col("id") + 95000000L).as("vec_id"),
          transform(famBase, (x, i) =>
            when(i === dim - 1,
              // 1e-7 steps stay above float granularity (~1.5e-8 near
              // 0.2) so every member is byte-distinct; max delta 1e-3
              // keeps the family far inside the 0.99-cosine ball
              (x.cast("double") + (col("id") + 1).cast("double") * 1e-7)
                .cast("float"))
              .otherwise(x)).as("embedding"))
      distinct.unionByName(fam)
    }
    Seq(Int.MaxValue, 1024, 64).foreach { cap =>
      val d = java.nio.file.Files.createTempDirectory("vec_storm").toString
      graft.ops.VectorFlow.ingest(s"$d/idx", mkBatch(0), 0L, p) // history
      val t = System.nanoTime()
      val st = graft.ops.VectorFlow.decide(s"$d/idx", storm, 0L,
        p.copy(maxBucket = cap))
      val mix = st.decisions.groupBy("status").count()
        .collect().map(x => s"${x.getString(0)}=${x.getLong(1)}")
        .sorted.mkString(" ")
      val ov = st.overflow.agg(coalesce(sum("suppressed"), lit(0L)),
        count(lit(1))).head()
      val wall = (System.nanoTime() - t) / 1e9
      val capS = if (cap == Int.MaxValue) "exact" else s"cap=$cap"
      println(f"$capS%10s  wall=$wall%6.2fs  hotBands=${ov.getLong(1)}%3d  " +
        f"suppressedPairs=${ov.getLong(0)}%,12d  [$mix]")
    }
    spark.stop()
  }
}
