package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe of the LATE-EMBEDDING correction
  * ([[graft.ops.VectorFlow.lateDecide]]/lateCommit): the claim under
  * test is that a late pass costs BATCH work, not CORPUS work — the
  * candidate probes are bucket-pruned index reads, the verification
  * fetch touches only collided vbkt dirs, and the EVICTION removals
  * rewrite only the buckets the losers' keys hash to
  * ([[graft.ops.Dedup.bucketedRemove]]).
  *
  * Drive: build a kept-vector corpus of `batches` × `rows` via the
  * real flow (VecFlowSoak's hash-seeded recipe, everything distinct →
  * ~all kept, stored at prio = batch), then run ONE late feed of
  * `lateRows` vectors — half FRESH (attach), half 0.1%-nudged twins of
  * stored keeps fed at prio 0 (they beat their stored twin's prio ≥ 1
  * and must EVICT it). Print the late pass's decide and commit walls
  * and the decision mix at each corpus size: the walls must stay ~flat
  * while the corpus quadruples (run with e.g. `10 20000` then
  * `40 20000`).
  */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(10)
    val rows = args.lift(1).map(_.toInt).getOrElse(20000)
    val lateRows = args.lift(2).map(_.toInt).getOrElse(2000)
    val bits = 24
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
    val dir = java.nio.file.Files.createTempDirectory("lateprobe")
      .toString + "/idx"
    val p = graft.ops.VectorFlow.Params(dim = dim, bits = bits)
    var cursor = 0L
    val t0 = System.nanoTime()
    for (b <- 0 until batches) {
      val batch = spark.range(rows)
        .select((col("id") * batches + b).as("vec_id"),
          unitVec(col("id") * batches + b).as("embedding"))
      val r = graft.ops.VectorFlow.ingest(dir, batch, cursor, p,
        prio = b + 1L)
      cursor = r.cursor
    }
    println(f"corpus built: $cursor%,d kept over $batches batches " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")

    // the late feed: half fresh directions, half nudged twins of stored
    // keeps (ids 0*batches+0, 1*batches+0, ... are batch-0 keeps)
    val fresh = spark.range(lateRows / 2)
      .select((col("id") + 700000000L).as("vec_id"),
        unitVec(col("id") + 700000000L).as("embedding"),
        lit(0L).as("prio"))
    val twins = spark.range(lateRows / 2)
      .select((col("id") + 800000000L).as("vec_id"),
        transform(unitVec(col("id") * batches.toLong), (x, i) =>
          when(i === 0, (x.cast("double") * 1.001).cast("float"))
            .otherwise(x)).as("embedding"),
        lit(0L).as("prio"))
    val late = fresh.unionByName(twins)

    val tD = System.nanoTime()
    val staged = graft.ops.VectorFlow.lateDecide(dir, late, p)
    val mix = staged.corrections.groupBy("status").count()
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
      .sorted.mkString(" ")
    val wallD = (System.nanoTime() - tD) / 1e9
    val tC = System.nanoTime()
    graft.ops.VectorFlow.lateCommit(dir, staged, p)
    val wallC = (System.nanoTime() - tC) / 1e9
    println(f"late pass over $cursor%,d stored: decide=$wallD%.1f s " +
      f"commit=$wallC%.1f s  [$mix]")
    // the corrected store serves: a copy of an evicted twin's target
    // must now match the late winner, not the evicted id
    val n = spark.read.parquet(s"$dir/vectors").count()
    println(f"store rows after commit: $n%,d")
    spark.stop()
  }
}
