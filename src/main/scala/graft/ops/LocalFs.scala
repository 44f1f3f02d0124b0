package graft.ops

/** Local-filesystem scaffolding hygiene, shared by the rehearsal
  * harness's generated-table cleanup, the startup stale-tmp sweep and
  * specs — one copy of the recursive delete and the recursive
  * newest-mtime instead of the six that had drifted apart. java.io.File
  * deliberately: every caller operates on java.io.tmpdir scratch trees,
  * never on data the engine computes over (engine-side deletes go
  * through the Hadoop FileSystem, e.g. SimilarityQueries.deleteTree).
  */
object LocalFs {

  /** Recursive delete; a missing path or failed delete is a no-op (these
    * trees are scaffolding — leaking one costs disk, never correctness).
    */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  def deleteRecursively(path: String): Unit =
    deleteRecursively(new java.io.File(path))

  /** Newest lastModified anywhere in a tree — the age signal for sweep
    * guards: parquet writes land in nested partition subdirectories
    * without refreshing the root mtime, so a root-only check would
    * misread an actively-written tree as stale.
    */
  def newestMtime(f: java.io.File): Long = {
    val own = f.lastModified()
    if (!f.isDirectory) own
    else Option(f.listFiles()).getOrElse(Array.empty)
      .foldLeft(own)((m, c) => math.max(m, newestMtime(c)))
  }
}
