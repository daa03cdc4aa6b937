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
  * signature store. The pointer flip is write-tmp + atomic rename
  * here; on object storage it is a conditional PUT of the manifest
  * key.
  *
  * Micro-batch appends land INSIDE the current generation (the
  * foreachBatch sink is the only writer and is sequential, so append
  * vs compact never race each other); only maintenance creates
  * generations.
  */
object GenIndex {

  private def manifest(root: String) = new java.io.File(root, "MANIFEST")

  /** Absolute path of the live generation directory. */
  def currentGen(root: String): String = {
    val m = manifest(root)
    require(m.exists,
      s"GenIndex: no MANIFEST under $root — init() first")
    val gen = new String(
      java.nio.file.Files.readAllBytes(m.toPath), "UTF-8").trim
    new java.io.File(root, gen).toString
  }

  /** Create generation 0 via `seed` (given the directory to write)
    * and publish it.
    */
  def init(root: String)(seed: String => Unit): Unit = {
    val dir = new java.io.File(root, "gen-00000")
    seed(dir.toString)
    flip(root, "gen-00000")
  }

  private def flip(root: String, gen: String): Unit = {
    val tmp = new java.io.File(root, "MANIFEST.tmp")
    java.nio.file.Files.write(tmp.toPath, gen.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, manifest(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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
    val cur = currentGen(root)
    val n = new java.io.File(cur).getName.stripPrefix("gen-").toInt
    val next = f"gen-${n + 1}%05d"
    StreamingDedup.rewriteClustered(spark, cur,
      new java.io.File(root, next).toString, clusterCols, targetFiles,
      partitionCols)
    flip(root, next)
    // retention orders by the PARSED generation number: %05d names
    // overflow five digits at gen-100000, where a lexicographic sort
    // would place the freshly-flipped live generation FIRST and this
    // pass would delete it
    new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .sortBy(_.getName.stripPrefix("gen-").toInt)
      .dropRight(retain + 1)
      .foreach(graft.core.Fs.deleteRecursively)
  }
}
