package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Formatted-plan dumper for the optimization rounds: writes
  * `explain("formatted")` of catalog keys to `<outDir>/<key>_<tag>.txt`
  * under the BENCH session shape (local[32], shuffle=32, UTC) so the
  * committed plan artifacts match what the timed runs execute.
  *
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [key ...]
  *
  * No keys = the full catalog. Note: invoking a catalog key's builder
  * executes any internal staging actions it performs (store builds,
  * fixture copies) — the dump prices a normal invocation, which is
  * exactly the plan the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.queries.keySet.toSeq.sorted
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      try {
        val plan = graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"PLANDUMP ok $n")
      } catch { case t: Throwable =>
        System.err.println(s"PLANDUMP FAILED $n: $t")
      }
    }
    spark.stop()
  }
}
