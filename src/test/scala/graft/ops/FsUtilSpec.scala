package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** FsUtil.copyTree — the local-scheme fast path must produce a
  * byte-identical tree at a nonexistent destination (the FileUtil.copy
  * case q_unified_late's fixture copy relies on) and refuse an existing
  * one (where FileUtil.copy's semantics diverge — it would nest).
  */
class FsUtilSpec extends AnyFunSuite {

  private def hadoopFs(p: String) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    (new Path(p).getFileSystem(conf), conf)
  }

  test("copyTree clones a local tree byte-identically, sidecars included") {
    val root = Files.createTempDirectory("fsutil").toString
    val src = Paths.get(root, "src")
    Files.createDirectories(src.resolve("a/b"))
    Files.write(src.resolve("f1.bin"), Array[Byte](1, 2, 3))
    Files.write(src.resolve("a/f2.bin"), Array.fill[Byte](1000)(7))
    Files.write(src.resolve("a/b/.f3.crc"), Array[Byte](9, 9))
    Files.createDirectories(src.resolve("empty"))
    val (fs, conf) = hadoopFs(root)
    val dst = Paths.get(root, "dst")
    assert(FsUtil.copyTree(fs, new Path(src.toString),
      new Path(dst.toString), conf))
    val rel = Files.walk(src).iterator()
    while (rel.hasNext) {
      val s = rel.next()
      val d = dst.resolve(src.relativize(s))
      assert(Files.exists(d), s"missing ${src.relativize(s)}")
      if (Files.isRegularFile(s))
        assert(java.util.Arrays.equals(Files.readAllBytes(s),
          Files.readAllBytes(d)), s"bytes differ at ${src.relativize(s)}")
    }
    // and nothing extra
    assert(Files.walk(dst).count() == Files.walk(src).count())
  }

  test("writeBytes create-or-truncates and clears a stale checksum") {
    val root = Files.createTempDirectory("fsutil3").toString
    val (fs, _) = hadoopFs(root)
    val p = new Path(root, "sub/side.json")
    FsUtil.writeBytes(fs, p, "abc".getBytes("UTF-8"))
    assert(Files.readAllBytes(Paths.get(root, "sub/side.json"))
      .sameElements("abc".getBytes("UTF-8")))
    // overwrite (fs.create(p, true) semantics)
    FsUtil.writeBytes(fs, p, "xy".getBytes("UTF-8"))
    assert(Files.readAllBytes(Paths.get(root, "sub/side.json"))
      .sameElements("xy".getBytes("UTF-8")))
    // a stale Hadoop-path CRC must not survive an nio overwrite: write
    // through fs.create (stamps .side.json.crc), then through writeBytes,
    // then read back through the CHECKSUMMED open — a stale CRC would
    // throw ChecksumException here
    val out = fs.create(p, true)
    try out.write("hadoop-bytes".getBytes("UTF-8")) finally out.close()
    assert(Files.exists(Paths.get(root, "sub/.side.json.crc")))
    FsUtil.writeBytes(fs, p, "fresh".getBytes("UTF-8"))
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in).mkString
    finally in.close()
    assert(body == "fresh")
  }

  test("copyTree refuses an existing destination") {
    val root = Files.createTempDirectory("fsutil2").toString
    val src = Paths.get(root, "src")
    Files.createDirectories(src)
    Files.write(src.resolve("f.bin"), Array[Byte](1))
    val dst = Paths.get(root, "dst")
    Files.createDirectories(dst)
    val (fs, conf) = hadoopFs(root)
    intercept[IllegalArgumentException] {
      FsUtil.copyTree(fs, new Path(src.toString),
        new Path(dst.toString), conf)
    }
  }
}
