package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** The `_graft_layout.json` sidecar shared by the hash-bucketed on-disk
  * layouts (the band index's `bkt` dirs, the SCD2 archive's `ubkt`
  * dirs): the bucket count is part of the layout contract — a reader
  * using a different modulus prunes away directories that DO contain
  * matching rows, silently — so the count is stamped at creation and
  * validated on every entry (r14 review finds #1/#4). The underscore
  * prefix keeps Spark's file listing from treating it as data.
  */
private[graft] object LayoutSidecar {
  private val Name = "_graft_layout.json"

  private def file(path: String) = new Path(path, Name)

  /** Stamp `buckets` into a freshly-written directory (overwrites). */
  def stamp(fs: FileSystem, path: String, buckets: Int): Unit = {
    FsUtil.writeBytes(fs, file(path),
      s"""{"buckets":$buckets}""".getBytes("UTF-8"))
  }

  /** Read the stamped bucket count, if the sidecar exists. */
  def read(fs: FileSystem, path: String): Option[Int] = {
    val f = file(path)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val body = try {
        // The FS contract allows short reads — loop to EOF so a partial
        // first read can't truncate the digits of the bucket count.
        val out = new java.io.ByteArrayOutputStream(256)
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toString("UTF-8")
      } finally in.close()
      "\"buckets\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(body).map(_.group(1).toInt)
    }
  }

  /** For entry points that don't carry a bucket count (compaction):
    * throw on a data-bearing directory with no sidecar, return the
    * stamped count otherwise.
    */
  def requireStamped(fs: FileSystem, path: String,
                     legacyHint: String): Option[Int] = {
    val r = read(fs, path)
    if (r.isEmpty) {
      val p = new Path(path)
      val hasData = fs.exists(p) && fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      if (hasData)
        throw new IllegalStateException(s"$path has data but no layout " +
          s"sidecar: $legacyHint")
    }
    r
  }

  /** PRE-write stamping (r15, ADVICE): validate against an existing
    * sidecar, or stamp one BEFORE the first data append. Stamping after
    * the append left a crash window — a genuinely bucketed first append
    * with no sidecar yet, which every later entry point refuses as a
    * "legacy flat" layout until a manual migrate. Stamping first makes
    * the crash outcome benign: a sidecar-only directory reads as an
    * empty index with a frozen bucket count. `fs.create` makes the
    * directory, so this works on a not-yet-existing index too.
    */
  def stampAhead(fs: FileSystem, path: String, buckets: Int): Unit =
    read(fs, path) match {
      case Some(b) =>
        require(b == buckets,
          s"$path is bucketed with buckets=$b but the caller passed " +
            s"buckets=$buckets — the bucket count is frozen at creation")
      case None => stamp(fs, path, buckets)
    }

  /** Pre-read/write validation: the caller's bucket count must match the
    * stamped one, and a directory holding data WITHOUT a sidecar (a
    * pre-sidecar layout whose rows the bucketed reader would silently
    * lose) is refused.
    */
  def check(fs: FileSystem, path: String, buckets: Int,
            legacyHint: String): Unit =
    requireStamped(fs, path, legacyHint).foreach { b =>
      require(b == buckets,
        s"$path is bucketed with buckets=$b but the caller passed " +
          s"buckets=$buckets — the bucket count is frozen at creation")
    }
}
