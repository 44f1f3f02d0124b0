package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable IVF index: build the codebook + inverted lists ONCE, write
  * them as parquet, and serve any number of probe batches from the stored
  * artifact — the build-once/probe-many shape real retrieval workloads
  * have (the inline [[Similarity.ivfTopKWith]] re-derives assignments on
  * every call, which is right for one-shot analytics and wrong for a
  * query service fielding thousands of probe batches).
  *
  * Layout under `path`:
  *   - `centroids/` — (centroid_id, centroid ARRAY<DOUBLE>, cnorm):
  *     nlist rows, broadcast at probe time;
  *   - `lists/` — (neighbor_id, vec, vnorm) PARTITIONED BY `list`:
  *     each corpus vector exactly once, keyed by its Voronoi cell.
  *
  * Why `partitionBy(list)` is the load-bearing choice: the probe join's
  * key IS the partition column, and the probe side (queries × nprobe
  * rows) broadcasts — so Spark's dynamic partition pruning turns each
  * probe batch into a scan of ONLY the probed lists' directories. At
  * nlist=4096 and nprobe=8 a batch touches ~0.2% of the corpus bytes;
  * that multiplier is the entire point of IVF, and it survives here
  * WITHOUT a custom reader because the layout lines up with Spark's own
  * pruning machinery. `repartition(list)` before the write keeps it to
  * one writer per list (no small-files explosion); stored vnorm spares
  * every probe batch the norm recompute.
  *
  * Results are identical to the inline path on the same codebook
  * (spec-gated: IvfIndexSpec, oracle-gated: q_ann_ivf_persist).
  */
object IvfIndex {

  /** Build the index from a corpus and a caller-supplied codebook (pair
    * with [[graft.ml.KMeans.centroidFrame]], or any sampled frame) and
    * persist it under `path` (overwrite).
    */
  def write(
      path: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      centIdCol: String = "centroid_id",
      centVecCol: String = "centroid",
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val cent = Similarity.centFrame(centroids, centIdCol, centVecCol)
    cent.select(col("__cid").as("centroid_id"), col("__cv").as("centroid"),
        col("__cn").as("cnorm"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    Similarity.invertedLists(corpus, idCol, vecCol, cent)
      .select(col("__list").as("list"), col("neighbor_id"),
        col("__nv").as("vec"), col("__nn").as("vnorm"))
      .repartition(col("list"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("list")
      .parquet(s"$path/lists")
  }

  /** Append a delta of NEW corpus vectors into the persisted lists
    * without rewriting untouched lists: each delta vector is assigned to
    * its Voronoi cell with the STORED codebook (stored cnorm, same
    * argmax + tie-break as [[write]] — so an appended vector lands in
    * exactly the cell a from-scratch rebuild would put it in), and the
    * append-mode partitioned write adds files ONLY under the `list=`
    * directories the delta actually touches. Probe parity with a
    * from-scratch build over old∪delta holds by construction; the spec
    * and `q_ann_ivf_upsert` gate it.
    *
    * Contract: delta ids must be NEW (this is append, not upsert —
    * re-appending an existing id duplicates it in its list; dedup
    * upstream, e.g. [[Dedup.keepFirst]] on id). Growing corpora
    * accumulate small files per touched list — run [[compact]] on the
    * usual compactor cadence to restore one-file-per-list.
    */
  def append(
      spark: SparkSession,
      path: String,
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val cent = spark.read.parquet(s"$path/centroids").select(
      col("centroid_id").as("__cid"), col("centroid").as("__cv"),
      col("cnorm").as("__cn"))
    Similarity.invertedLists(delta, idCol, vecCol, cent)
      .select(col("__list").as("list"), col("neighbor_id"),
        col("__nv").as("vec"), col("__nn").as("vnorm"))
      .repartition(col("list"))
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("list")
      .parquet(s"$path/lists")
  }

  /** Rewrite the inverted lists back to one writer per list, merging the
    * small files [[append]] accumulates. Same compaction discipline as
    * the gold-table compactor: write the merged copy BESIDE the live
    * tree, then swap directories — a reader that raced the swap sees
    * either the old complete tree or the new one, never a half-deleted
    * directory (rename is atomic per directory on a real filesystem;
    * object stores should front this with their usual pointer layer).
    */
  def compact(
      spark: SparkSession,
      path: String,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    spark.read.parquet(s"$path/lists")
      .repartition(col("list"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("list")
      .parquet(s"$path/lists_compacting")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(conf)
    val live = new org.apache.hadoop.fs.Path(s"$path/lists")
    val next = new org.apache.hadoop.fs.Path(s"$path/lists_compacting")
    val old = new org.apache.hadoop.fs.Path(s"$path/lists_old")
    fs.delete(old, true)
    require(fs.rename(live, old), s"compact: could not retire $live")
    require(fs.rename(next, live), s"compact: could not promote $next")
    fs.delete(old, true)
  }

  /** Serve one probe batch from the stored artifact. Same output contract
    * as [[Similarity.ivfTopKWith]]: (query_id, neighbor_id, rank, cos).
    */
  def topK(
      spark: SparkSession,
      path: String,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 3): DataFrame = {
    val centStored = spark.read.parquet(s"$path/centroids")
    val listsStored = spark.read.parquet(s"$path/lists")
    // The partition column comes back through directory-name inference,
    // which narrows numeric types (long → int). Align the CODEBOOK side
    // to the inferred type — casting the broadcast-small side keeps the
    // partitioned scan's join key a bare partition attribute, which is
    // what keeps dynamic partition pruning eligible. Ids that actually
    // wrote a lists/ directory fit the inferred type by construction;
    // an EMPTY centroid (no assigned vectors) can carry an id beyond
    // that range, and a bare non-ANSI cast would wrap it onto a real
    // list id, mis-routing its probes — so out-of-range ids map to a
    // NULL join key instead. NULL never equi-joins, which is exactly
    // the empty centroid's semantics: probing it contributes no rows.
    val listType = listsStored.schema("list").dataType
    val idRange: Option[(Long, Long)] = listType match {
      case org.apache.spark.sql.types.ByteType =>
        Some((Byte.MinValue.toLong, Byte.MaxValue.toLong))
      case org.apache.spark.sql.types.ShortType =>
        Some((Short.MinValue.toLong, Short.MaxValue.toLong))
      case org.apache.spark.sql.types.IntegerType =>
        Some((Int.MinValue.toLong, Int.MaxValue.toLong))
      case _ => None // long/string/decimal inference: cast is total
    }
    val safeId = idRange match {
      case Some((lo, hi)) =>
        when(col("centroid_id").between(lo, hi), col("centroid_id"))
      case None => col("centroid_id")
    }
    val cent = centStored.select(
      safeId.cast(listType).as("__cid"),
      col("centroid").as("__cv"), col("cnorm").as("__cn"))
    val lists = listsStored.select(col("list").as("__list"),
      col("neighbor_id"), col("vec").as("__nv"), col("vnorm").as("__nn"))
    Similarity.probeInvertedLists(probes, idCol, vecCol, k, cent, lists, nprobe)
  }
}
