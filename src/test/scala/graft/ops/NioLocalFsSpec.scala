package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** [[NioLocalFileSystem]] — the `file`-scheme FS the session builders
  * register (r21). Its ONLY behavioral delta vs the stock
  * LocalFileSystem is HOW the permission bits land (java.nio instead
  * of a forked chmod shell); the bits themselves, create/mkdirs
  * semantics, and checksum sidecars must be identical.
  */
class NioLocalFsSpec extends AnyFunSuite {

  private def freshFs(): (NioLocalFileSystem, Configuration) = {
    val conf = new Configuration()
    val fs = new NioLocalFileSystem()
    fs.initialize(new java.net.URI("file:///"), conf)
    (fs, conf)
  }

  private def posixBits(p: java.nio.file.Path): Int = {
    import java.nio.file.attribute.PosixFilePermission._
    val order = IndexedSeq(OTHERS_EXECUTE, OTHERS_WRITE, OTHERS_READ,
      GROUP_EXECUTE, GROUP_WRITE, GROUP_READ,
      OWNER_EXECUTE, OWNER_WRITE, OWNER_READ)
    val set = Files.getPosixFilePermissions(p)
    order.zipWithIndex.foldLeft(0) { case (acc, (perm, i)) =>
      if (set.contains(perm)) acc | (1 << i) else acc }
  }

  test("setPermission lands the exact rwx bits through java.nio") {
    val (fs, _) = freshFs()
    val root = Files.createTempDirectory("niofs")
    val f = root.resolve("f.bin")
    Files.write(f, Array[Byte](1, 2, 3))
    for (bits <- Seq(Integer.parseInt("644", 8), Integer.parseInt("755", 8),
        Integer.parseInt("600", 8), Integer.parseInt("640", 8))) {
      fs.setPermission(new Path(f.toString),
        new FsPermission(bits.toShort))
      assert(posixBits(f) === bits, f"bits 0${bits.toOctalString}")
    }
  }

  test("create writes data + checksum sidecar like the stock class") {
    val (fs, _) = freshFs()
    val root = Files.createTempDirectory("niofs")
    val f = new Path(root.resolve("out/part-000.bin").toString)
    val out = fs.create(f, new FsPermission("644"), true, 4096,
      1.toShort, 4096L, null)
    try out.write(Array[Byte](5, 6, 7, 8)) finally out.close()
    assert(Files.exists(root.resolve("out/part-000.bin")))
    assert(Files.exists(root.resolve("out/.part-000.bin.crc")),
      "checksum sidecar missing — ChecksumFileSystem semantics lost")
    assert(posixBits(root.resolve("out/part-000.bin")) ===
      Integer.parseInt("644", 8))
    // the checksummed read path must verify cleanly against the sidecar
    val in = fs.open(f)
    val buf = new Array[Byte](4)
    try in.readFully(0L, buf) finally in.close()
    assert(buf.toSeq === Seq[Byte](5, 6, 7, 8))
  }

  test("mkdirs applies the permission to created dirs") {
    val (fs, _) = freshFs()
    val root = Files.createTempDirectory("niofs")
    val d = root.resolve("a/b/c")
    assert(fs.mkdirs(new Path(d.toString),
      new FsPermission(Integer.parseInt("750", 8).toShort)))
    assert(Files.isDirectory(d))
    assert(posixBits(d) === Integer.parseInt("750", 8))
  }

  test("sticky/setuid bits fall back to the stock shell route") {
    val (fs, _) = freshFs()
    val root = Files.createTempDirectory("niofs")
    val f = root.resolve("s.bin")
    Files.write(f, Array[Byte](1))
    // 01644: sticky bit — nio can't express it; the override must
    // delegate rather than silently drop the bit
    fs.setPermission(new Path(f.toString),
      new FsPermission(Integer.parseInt("1644", 8).toShort))
    assert(posixBits(f) === Integer.parseInt("644", 8))
    val stat = fs.getFileStatus(new Path(f.toString))
    assert(stat.getPermission.getStickyBit,
      "sticky bit lost — fallback to the shell route did not happen")
  }
}
