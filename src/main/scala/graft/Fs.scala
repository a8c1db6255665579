package graft

/** Local-filesystem scratch helpers for the replay harnesses, sink
  * exercisers and specs. One definition — this tree-delete previously
  * existed as 18 inline copies, and a divergent copy (e.g. one that
  * follows symlinks or swallows the listing stream) is exactly the kind
  * of scratch-cleanup bug that only shows up as a full /tmp. */
object Fs {

  /** Delete `p` recursively (no-op if absent). NOFOLLOW_LINKS is
    * load-bearing: plain `Files.isDirectory` FOLLOWS a symlink to a
    * directory, which turns "delete my scratch dir" into "recurse into
    * whatever the scratch linked to and delete THAT" — a symlink must be
    * deleted as the link itself, never traversed. */
  def rmTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = java.nio.file.Files.list(p)
      val children = try {
        val b = Vector.newBuilder[java.nio.file.Path]
        val it = s.iterator()
        while (it.hasNext) b += it.next()
        b.result()
      } finally s.close()
      children.foreach(rmTree)
    }
    java.nio.file.Files.deleteIfExists(p)
  }
}
