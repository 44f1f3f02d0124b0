package graft.ops

import org.apache.spark.sql.SparkSession

/** Prefix-versioned two-phase commit for indexes whose generation is
  * MORE THAN ONE parquet tree (so parquet's own `_SUCCESS` cannot be the
  * commit point): each generation lives under `<prefix>_v{n}/`, a
  * `_GRAFT_COMMIT` marker is written only after every tree of the
  * generation landed, readers resolve the highest COMMITTED version, and
  * a crash mid-write leaves the previous generation live with the torn
  * one as skipped-past garbage (numbered past, never resurrected).
  * Shared by [[GraphIndex]] (nodes + edges per generation) and
  * [[MaxSimIndex]] (token tree + meta per generation).
  *
  * Single-writer assumption, like every maintenance op here.
  */
private[ops] final class VersionedTree(prefix: String) {

  private val re = s"${java.util.regex.Pattern.quote(prefix)}_v\\d+"

  private def fsOf(spark: SparkSession, path: String) = {
    val root = new org.apache.hadoop.fs.Path(path)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  def committedVersions(spark: SparkSession, path: String): Seq[Int] = {
    val (fs, root) = fsOf(spark, path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.matches(re) &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_GRAFT_COMMIT")))
      .map(_.getName.stripPrefix(s"${prefix}_v").toInt)
  }

  /** Highest committed generation name, e.g. "graph_v3". */
  def liveVersion(spark: SparkSession, path: String): String = {
    val live = committedVersions(spark, path)
    require(live.nonEmpty, s"no committed $prefix generation under $path")
    s"${prefix}_v${live.max}"
  }

  /** Next-generation numbering must pass UNCOMMITTED leftovers too — a
    * crashed writer's torn tree may hold the highest number.
    */
  private def maxVersion(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Int =
    if (!fs.exists(root)) 0
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.matches(re))
      .map(_.stripPrefix(s"${prefix}_v").toInt)
      .foldLeft(0)(math.max)

  /** Write the next generation: `writeTrees` receives the generation
    * directory and must land every tree under it; only after it returns
    * is the commit marker created and every superseded generation
    * (committed or torn) deleted — readers never lose a resolvable live
    * tree.
    */
  def commitNext(spark: SparkSession, path: String)(
      writeTrees: String => Unit): String = {
    val (fs, root) = fsOf(spark, path)
    val next = s"${prefix}_v${maxVersion(fs, root) + 1}"
    writeTrees(s"$path/$next")
    fs.create(new org.apache.hadoop.fs.Path(s"$path/$next/_GRAFT_COMMIT"))
      .close()
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.matches(re) && p.getName != next)
      .foreach(p => fs.delete(p, true))
    next
  }
}
