package graft.streaming

import org.apache.spark.sql.SparkSession

/** Generation-addressed signature index: the reader-safe form of
  * [[StreamingDedup.compactIndex]]'s in-place swap, and the layout an
  * object-store deployment actually runs. The index root holds
  * generation directories (`gen-00000`, `gen-00001`, …) plus a
  * MANIFEST file naming the live one; readers resolve the manifest,
  * then read ONLY their resolved generation, so a compaction —
  * rewrite into a NEW generation, atomically flip the pointer — can
  * never mutate files under a reader mid-scan. Old generations are
  * retained for `retain` flips (a reader that resolved before the
  * flip finishes against its own generation), then deleted — the
  * store's manifest-watermark discipline applied to the dedup
  * signature store. The pointer flip is write-tmp + atomic rename on
  * HDFS/local; on object-store schemes it is a direct overwrite
  * create of the manifest key (a single PUT is atomic there, while
  * rename is copy+delete and would expose a missing-manifest window).
  *
  * All manifest and directory I/O goes through the Hadoop FS (same
  * layer as the parquet data), so an hdfs:// or s3a:// index root
  * works end-to-end — a java.io manifest read against a remote root
  * would fail claiming no MANIFEST even though init() wrote one.
  *
  * Micro-batch appends land INSIDE the current generation (the
  * foreachBatch sink is the only writer and is sequential, so append
  * vs compact never race each other); only maintenance creates
  * generations.
  */
object GenIndex {

  private def manifestPath(root: String) = s"$root/MANIFEST"

  /** Absolute path of the live generation directory. */
  def currentGen(root: String): String = {
    val m = manifestPath(root)
    require(graft.core.Fs.hadoopExists(m),
      s"GenIndex: no MANIFEST under $root — init() first")
    s"$root/${graft.core.Fs.readUtf8(m).trim}"
  }

  /** Create generation 0 via `seed` (given the directory to write)
    * and publish it.
    */
  def init(root: String)(seed: String => Unit): Unit = {
    seed(s"$root/gen-00000")
    flip(root, "gen-00000")
  }

  /** FLAT-object-store schemes where `rename` is NOT an atomic
    * metadata operation but a copy+delete emulation — on these, the
    * tmp+rename flip would open a window where concurrent
    * `currentGen` readers see a missing MANIFEST mid-copy. A
    * single-object overwrite PUT IS atomic there (readers see the old
    * or the new manifest body, never absence), so the flip writes the
    * manifest key directly.
    *
    * Azure schemes (abfs/abfss, wasb/wasbs) are deliberately ABSENT:
    * on ADLS Gen2's hierarchical namespace rename IS an atomic
    * metadata op while create+write+close is not a single PUT —
    * `create()` exposes a zero-byte MANIFEST before the flush, the
    * exact partial-manifest window the rename branch avoids. Azure
    * therefore takes the tmp+rename branch below. Caveat stated
    * rather than hidden: on a NON-HNS account through the legacy
    * wasb driver NEITHER branch is atomic (rename is client-side
    * copy+delete, create exposes the empty blob), so the rename
    * branch there trades a read-empty-manifest window for a
    * manifest-briefly-absent one — `currentGen`'s existence require
    * at least fails loudly on the latter. Production Azure
    * deployments should use abfs over HNS, where the rename branch
    * is genuinely atomic.
    */
  private val ObjectStoreSchemes =
    Set("s3a", "s3", "s3n", "gs", "oss", "cos")

  private def flip(root: String, gen: String): Unit = {
    val (fs, rootP) = graft.core.Fs.hadoop(root)
    val manifest = new org.apache.hadoop.fs.Path(rootP, "MANIFEST")
    if (ObjectStoreSchemes.contains(fs.getUri.getScheme)) {
      // object store: direct overwrite create — one atomic PUT of the
      // manifest object (rename there is copy+delete, the one thing
      // this flip must never rely on)
      graft.core.Fs.writeUtf8(manifest.toString, gen)
    } else {
      val tmp = new org.apache.hadoop.fs.Path(rootP, "MANIFEST.tmp")
      graft.core.Fs.writeUtf8(tmp.toString, gen)
      // rename-with-overwrite through FileContext: FileSystem.rename
      // refuses an existing destination, and delete-then-rename would
      // open a no-manifest window for concurrent readers. Atomic on
      // HDFS/local (a metadata op), which is what this branch serves.
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration)
      fc.rename(tmp, manifest,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** The live generation and the name its successor must take —
    * the ONE place that knows the `gen-%05d` naming/parsing contract
    * (including the five-digit overflow subtlety retention guards
    * against). External rewriters ([[graft.ops.AnnIndex.compact]])
    * resolve both here, build `root/<next>`, then [[publish]].
    */
  def nextGen(root: String): (String, String) = {
    val cur = currentGen(root)
    val n = cur.substring(cur.lastIndexOf("gen-") + 4).toInt
    (cur, f"gen-${n + 1}%05d")
  }

  /** Compact the live generation into a new one and flip the pointer:
    * the same clustered rewrite as [[StreamingDedup.compactIndex]]
    * (content-preserving by construction — one read, one write), but
    * never in place. Generations more than `retain` flips old are
    * deleted afterwards.
    */
  def compact(spark: SparkSession, root: String, clusterCols: Seq[String],
      targetFiles: Int = 8, partitionCols: Seq[String] = Nil,
      retain: Int = 1): Unit = {
    val (cur, next) = nextGen(root)
    StreamingDedup.rewriteClustered(spark, cur, s"$root/$next",
      clusterCols, targetFiles, partitionCols)
    publish(root, next, retain)
  }

  /** Publish an externally-built generation: flip the manifest to
    * `gen`, then apply retention. For indexes whose rewrite is not
    * the single clustered-parquet shape [[compact]] assumes — e.g.
    * the model + codes composite of [[graft.ops.AnnIndex]] — the
    * caller builds `root/<gen>` itself and hands the flip here so
    * the pointer/retention discipline stays in one place. (All I/O
    * resolves the Hadoop conf from the ACTIVE session, so there is
    * deliberately no SparkSession parameter to mislead callers.)
    */
  def publish(root: String, gen: String,
      retain: Int = 1): Unit = {
    flip(root, gen)
    // retention orders by the PARSED generation number: %05d names
    // overflow five digits at gen-100000, where a lexicographic sort
    // would place the freshly-flipped live generation FIRST and this
    // pass would delete it
    val (fs, rootP) = graft.core.Fs.hadoop(root)
    fs.listStatus(rootP)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-"))
      .sortBy(_.getPath.getName.stripPrefix("gen-").toInt)
      .dropRight(retain + 1)
      .foreach(st => fs.delete(st.getPath, true))
  }
}
