package graft.tools

import graft.functions.KllState

/** Empirical rank-error sweep for the KLL sketch at the PropertySpec k
  * values. Measures the max rank error over the (n, seed) grid for each k
  * and prints it next to the test envelope `max(0.02, 2.0/k)` — run to
  * re-validate the envelope constant if the sketch internals change.
  */
object KllEnvelopeSweep {
  def main(args: Array[String]): Unit = {
    val qs = Seq(0.1, 0.5, 0.9)
    for (k <- Seq(32, 64, 256)) {
      var worst = 0.0
      var worstCase = ""
      for (seed <- 0L until 300L; n <- 100 to 3000 by 100) {
        val rnd = new scala.util.Random(seed)
        val vals = Seq.fill(n)(rnd.nextDouble() * 100 - 50)
        val s = KllState.empty(k)
        vals.foreach(s.insert)
        val sorted = vals.sorted
        for (q <- qs) {
          val est = s.quantile(q)
          val lo = sorted.count(_ < est).toDouble / n
          val hi = sorted.count(_ <= est).toDouble / n
          val err = if (q < lo) lo - q else if (q > hi) q - hi else 0.0
          if (err > worst) { worst = err; worstCase = s"n=$n seed=$seed q=$q" }
        }
      }
      val envelope = math.max(0.02, 2.8 / k)
      println(f"k=$k%3d  maxErr=$worst%.4f  envelope=$envelope%.4f  " +
        f"ok=${worst <= envelope}  worst at: $worstCase")
    }
  }
}
