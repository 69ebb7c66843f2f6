package graft.tools
import org.apache.spark.sql.SparkSession

/** Heavy one-shot fuzz of the speculative-batched BPE trainer against the
  * full-recount reference: many random corpora over SMALL alphabets (so
  * count ties, chained pairs, rollbacks, and mid-train stops all occur)
  * across batch sizes, asserting the merge SEQUENCE and the final CORPUS
  * are identical. PropertySpec pins 5 cases per suite run; this drives
  * hundreds — run it after any trainer change (r12: 240/240 identical).
  */
object BpeEquivalenceFuzz {
  def main(args: Array[String]): Unit = {
    val cases = args.headOption.map(_.toInt).getOrElse(60)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val alphabets = Seq(Seq("a", "b"), Seq("a", "b", "c"),
      Seq("a", "b", "c", "d"), Seq("a", "b", "c", "ab", "x", "yz"))
    var run = 0
    for (c <- 0 until cases; batch <- Seq(1, 2, 3, 8)) {
      val alpha = alphabets(rnd.nextInt(alphabets.size))
      val nDocs = 1 + rnd.nextInt(8)
      val docs = (0 until nDocs).map { i =>
        val len = rnd.nextInt(60)
        (i.toLong, Seq.fill(len)(alpha(rnd.nextInt(alpha.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val nMerges = 1 + rnd.nextInt(10)
      val (mi, ci) = graft.ops.TextOps.trainPhraseMerges(
        docs, "doc_id", "text", nMerges, batch = batch)
      val (mr, cr) = graft.ops.TextOps.trainPhraseMergesRecount(
        docs, "doc_id", "text", nMerges)
      def corpusOf(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      require(mi == mr,
        s"case $c batch=$batch: merge sequences diverge:\n  inc=$mi\n  rec=$mr")
      require(corpusOf(ci) == corpusOf(cr),
        s"case $c batch=$batch: final corpora diverge (merges $mi)")
      run += 1
      if (run % 40 == 0) println(s"$run cases identical...")
    }
    println(s"DONE: $run/$run trainer runs identical to the reference")
    spark.stop()
  }
}
