package graft.tools

import org.apache.spark.sql.SparkSession

/** Times q_unified_late's per-invocation store copy (fixture -> work
  * dir) in isolation: builds the memoized fixture once, then measures
  * N FileUtil.copy calls — the driver-side, non-job cost every timed
  * invocation pays. `runMain graft.tools.LateCopyProbe [sfDir] [n]`.
  */
object LateCopyProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", graft.ops.FsUtil.localFsImpl)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (fix, _) = graft.queries.SharedBuilds.unifiedLateFixture(spark, d)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(fix).getFileSystem(conf)
    val files = fs.listFiles(new org.apache.hadoop.fs.Path(s"$fix/store"), true)
    var nf = 0; var bytes = 0L
    while (files.hasNext) { val f = files.next(); nf += 1; bytes += f.getLen }
    println(s"LATECOPY store files=$nf bytes=$bytes")
    (1 to n).foreach { i =>
      val work = java.nio.file.Files.createTempDirectory("latecopy").toString
      val t0 = System.nanoTime()
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$fix/store"), fs,
        new org.apache.hadoop.fs.Path(work + "/c"), false, conf)
      println(f"LATECOPY hadoop run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val t1 = System.nanoTime()
      graft.ops.FsUtil.copyTree(fs,
        new org.apache.hadoop.fs.Path(s"$fix/store"),
        new org.apache.hadoop.fs.Path(work + "/c2"), conf)
      println(f"LATECOPY nio    run$i ${(System.nanoTime() - t1) / 1e9}%.3f s")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(work))
    }
    // which primitive pays the fork: create vs rename vs setPermission
    val probeDir = java.nio.file.Files.createTempDirectory("fsops").toString
    def opTime(label: String)(op: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      (1 to 50).foreach(op)
      println(f"FSOP $label%-16s ${(System.nanoTime() - t0) / 1e6 / 50}%8.2f ms/op")
    }
    opTime("fs.create") { i =>
      val o = fs.create(new org.apache.hadoop.fs.Path(s"$probeDir/c$i"))
      o.write(42); o.close()
    }
    opTime("fs.rename") { i =>
      fs.rename(new org.apache.hadoop.fs.Path(s"$probeDir/c$i"),
        new org.apache.hadoop.fs.Path(s"$probeDir/r$i"))
    }
    opTime("fs.setPermission") { i =>
      fs.setPermission(new org.apache.hadoop.fs.Path(s"$probeDir/r$i"),
        new org.apache.hadoop.fs.permission.FsPermission("644"))
    }
    opTime("fs.open+read") { i =>
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$probeDir/r$i"))
      in.read(); in.close()
    }
    opTime("fs.getFileStatus") { i =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$probeDir/r$i"))
    }
    opTime("fs.mkdirs") { i =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$probeDir/d$i"))
    }
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(probeDir))
    spark.stop()
  }
}
