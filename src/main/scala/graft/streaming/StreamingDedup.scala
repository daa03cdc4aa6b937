package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection INSIDE a streaming ingest — the shape a
  * live 100 TB pipeline actually runs: documents arrive as events,
  * each micro-batch probes a persistent BAND INDEX (the signature
  * store of everything ingested so far) for near-dup candidates,
  * verifies the candidates exactly, and appends its own signatures to
  * the index before the next batch.
  *
  * The state story is deliberately NOT Spark operator state: near-dup
  * detection needs the full corpus's signatures forever (a duplicate
  * can arrive years after its original), so no watermark can bound an
  * in-operator state store. The index lives as a table on storage —
  * here a parquet dir; in production a (band, bkey)-bucketed table so
  * a probe prunes to the buckets its batch actually touches — and the
  * streaming side stays STATELESS per batch: probe work is
  * |batch bands| × |matching buckets| (the banded-LSH bound, same as
  * the batch incremental form), never |corpus|², and a restart
  * resumes from the index as-is because appends happen only after the
  * batch's pairs are materialized.
  *
  * Batch-division invariance (pinned by StreamingDedupSpec): the union
  * of emitted pairs over any micro-batching of the same new docs
  * equals [[Dedup.simhashPairsIncremental]] on the same old/new split
  * — a pair's batch finds it exactly once, at the batch of its LATER
  * member (both-in-batch pairs via the batch probing itself,
  * cross-batch pairs because the earlier member is already in the
  * index, new-old pairs against the seed).
  */
object StreamingDedup {

  /** Seed the band index with the at-rest corpus: one row per
    * (id, band) — (id, simhash, band, bkey), the same fingerprint and
    * banding as the probe side. Production builds this once from the
    * signature store; Spark-side it is one linear pass + write.
    */
  def seedSimhashIndex(corpus: DataFrame, textCol: String, idCol: String,
      indexDir: String, bits: Int = 64, bands: Int = 4,
      shingleK: Int = 3): Unit =
    seedFingerprintIndex(Dedup.simhash(corpus, textCol, idCol, bits,
      shingleK), indexDir, bits, bands)

  /** Fingerprint-GENERIC index seed: any family whose fingerprint
    * travels in the simhash bit-string form (text simhash, image
    * dHash, audio energy, video temporal envelope) seeds the same
    * (id, simhash, band, bkey) index — one streaming-dedup machine,
    * six families. `fp` is (id, simhash).
    */
  def seedFingerprintIndex(fp0: DataFrame, indexDir: String,
      bits: Int = 64, bands: Int = 4): Unit =
    // ONE projection (simhashBandRows: posexplode of the band slices
    // with the fingerprint carried on each row) — the fingerprint
    // evaluates once per document in the single write pass, so the
    // pre-r18 localCheckpoint (which existed because the band-keys
    // union + id-join referenced fp five times) and the corpus-sized
    // id-join shuffle are both gone from the seed.
    // Undecodable payloads (null fingerprint → null band keys) are
    // dropped HERE, on the generator output: bkey is produced by the
    // Generate, so Catalyst cannot push this filter below it into the
    // fingerprint projection — a caller-side
    // `where(fingerprint.isNotNull)` is pushed under the projection by
    // alias substitution and evaluates the decode/kernel TWICE per row
    // (guide §4.4's duplication, measured on the image/audio tiers).
    Dedup.simhashBandRows(fp0, bits, bands)
      .where(col("bkey").isNotNull)
      .write.mode("overwrite").parquet(indexDir)

  /** One micro-batch of the streaming probe: fingerprint `batch`,
    * probe the index AND the batch itself on (band, bkey), verify
    * candidates by exact hamming distance, then append the batch's
    * signatures to the index. Returns the verified pairs
    * (a, b, hamming), a < b — already materialized (the append must
    * not race the probe's lazy evaluation).
    */
  def simhashProbeBatch(batch: DataFrame, textCol: String, idCol: String,
      indexDir: String, bits: Int = 64, bands: Int = 4,
      maxDistance: Int = 3, shingleK: Int = 3): DataFrame =
    fingerprintProbeBatch(Dedup.simhash(batch, textCol, idCol, bits,
      shingleK), indexDir, bits, bands, maxDistance)

  /** Fingerprint-generic micro-batch probe — the
    * [[simhashProbeBatch]] body over a precomputed (id, simhash)
    * batch frame; shares [[simhashPairsAgainst]] (probe-vs-index AND
    * within-batch, candidate-restricted verify) and the append.
    */
  def fingerprintProbeBatch(fp0: DataFrame, indexDir: String,
      bits: Int = 64, bands: Int = 4, maxDistance: Int = 3): DataFrame = {
    require(maxDistance <= bands - 1,
      s"banding into $bands bands is only exact up to distance ${bands - 1}")
    val spark = fp0.sparkSession
    // ONE projection and ONE checkpoint per micro-batch: the band rows
    // carry the fingerprint (simhashBandRows), so the fingerprint
    // (media decode included) evaluates once while this checkpoint
    // materializes — the pre-r18 shape checkpointed fp separately and
    // paid an id-join shuffle per batch to re-attach simhash. The
    // undecodable-payload filter runs on the generator's bkey output
    // (see seedFingerprintIndex — a fingerprint-column filter would be
    // pushed into the projection and run the decode twice per row).
    val probe = Dedup.simhashBandRows(fp0, bits, bands)
      .where(col("bkey").isNotNull)
      .localCheckpoint()
    val pairs = simhashPairsAgainst(probe,
        spark.read.parquet(indexDir), bits, maxDistance)
      .localCheckpoint()
    probe.write.mode("append").parquet(indexDir)
    pairs
  }

  /** Candidate generation + hamming verify of one banded probe against
    * one index snapshot — the shared core of [[simhashProbeBatch]] and
    * [[simhashProbeBatchPruned]]. Both sides carry
    * (id, band, bkey, simhash). The probe joins the index AND itself
    * (within-batch near-dups would silently vanish for coarse
    * micro-batching otherwise); both sides' band rows CARRY their
    * fingerprint, so every candidate pair leaves the band join with
    * (sa, sb) in hand and the Hamming verify is a pure projection —
    * no fingerprint re-join, no candidate-restricted index re-scan
    * (the body comment records what the pre-r18 shape paid).
    */
  private def simhashPairsAgainst(probe: DataFrame, index: DataFrame,
      bits: Int, maxDistance: Int): DataFrame = {
    // every candidate is found through a band row, and both sides'
    // band rows carry their fingerprint — so the pair leaves the band
    // join with (sa, sb) in hand and the Hamming verify is a pure
    // projection. The pre-r18 shape shipped (a, b) id pairs, derived a
    // candidate-restricted fingerprint frame from index ∪ probe (one
    // more scan of the corpus-sized index per micro-batch), and paid
    // two re-join shuffles; all three steps are gone. (sa, sb) follow
    // the least/greatest normalization so sa is always a's.
    val px = probe.select(col("band"), col("bkey"), col("id").as("x"),
      col("simhash").as("sx"))
    def ySide(df: DataFrame) = df.select(col("band"), col("bkey"),
      col("id").as("y"), col("simhash").as("sy"))
    px.join(ySide(index), Seq("band", "bkey"))
      .unionByName(px.join(ySide(probe), Seq("band", "bkey")))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"),
        when(col("x") < col("y"), col("sx")).otherwise(col("sy")).as("sa"),
        when(col("x") < col("y"), col("sy")).otherwise(col("sx")).as("sb"))
      .distinct()
      .withColumn("hamming",
        Dedup.hammingDistance(col("sa"), col("sb"), bits).cast("long"))
      .where(col("hamming") <= maxDistance)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Partition prefix of a probe key: `pmod(xxhash64(keys…), parts)` —
    * the column under which the PRUNED index layout directories its
    * rows. Each family member passes its own probe keys: simhash and
    * minhash (band, bkey) — mixing `band` in keeps one band's keyspace
    * from clumping when `bkey` entropy is low — winnow (fp), cosine
    * (tbl, bucket).
    */
  def keyPrefix(parts: Int, keys: Column*): Column =
    pmod(xxhash64(keys: _*), lit(parts.toLong))

  /** Simhash/minhash member form of [[keyPrefix]]. */
  def bkeyPrefix(band: Column, bkey: Column, parts: Int): Column =
    keyPrefix(parts, band, bkey)

  /** Layout-contract marker: every pruned seed records its `parts`
    * in `_graft_parts` (underscore-prefixed — parquet readers skip
    * it), and every pruned probe require()s a match. A seed/probe
    * modulus mismatch would otherwise intersect live directories
    * NON-trivially (hash mod 64 values all exist among mod-1024
    * dirs), silently reading a plausible slice and dropping the pairs
    * whose rows live in unvisited directories.
    */
  // marker I/O goes through the Hadoop FS like the index data itself
  // (graft.core.Fs.writeUtf8/readUtf8) — a java.io.File marker against
  // an hdfs:// or s3a:// index root would claim the marker is missing
  // even though the seed wrote it, despite the data path supporting
  // such URIs
  private[streaming] def writePartsMarker(indexDir: String,
      parts: Int): Unit =
    graft.core.Fs.writeUtf8(s"$indexDir/_graft_parts", parts.toString)

  private def checkPartsMarker(indexDir: String, parts: Int): Unit = {
    val m = s"$indexDir/_graft_parts"
    require(graft.core.Fs.hadoopExists(m),
      s"pruned index $indexDir has no _graft_parts layout marker — " +
        "seed it with seed*IndexPruned (or restore the marker after " +
        "an external rewrite)")
    val seeded = graft.core.Fs.readUtf8(m).trim.toInt
    require(seeded == parts,
      s"pruned index $indexDir was seeded with parts=$seeded but the " +
        s"probe was called with parts=$parts — prefixes would resolve " +
        "to the wrong directories and pairs would be silently dropped")
  }

  /** Copy the layout marker (if any) from one index directory to a
    * rewritten one — compaction must carry the contract forward.
    */
  private[streaming] def copyPartsMarker(srcDir: String,
      destDir: String): Unit =
    if (graft.core.Fs.hadoopExists(s"$srcDir/_graft_parts"))
      graft.core.Fs.writeUtf8(s"$destDir/_graft_parts",
        graft.core.Fs.readUtf8(s"$srcDir/_graft_parts"))

  /** Read ONLY the touched pruned-index directories (touched ∩ live,
    * ONE top-level listing instead of O(parts) partition-discovery
    * listings). Empty hit set → an empty frame with `schemaFrom`'s
    * schema. NOT materialized: since the r18 carried-fingerprint /
    * source-verify restructures, every probe core scans its index
    * exactly ONCE (the candidate join; verification re-derives from
    * the doc/vector source or rides the band rows), so the pre-r19
    * localCheckpoint here was one pure-overhead scheduled job per
    * micro-batch — the pairs job now reads the pruned directories
    * directly. Exposed to the layout spec so the pruning evidence is
    * measured on THIS read path, not a synthetic equivalent.
    */
  private[streaming] def readTouchedPruned(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String, touched: Set[Long],
      schemaFrom: DataFrame): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("pfx="))
      .map(n => n.stripPrefix("pfx=").toLong).toSet
    val hit = (touched & live).toSeq.sorted
    if (hit.isEmpty) schemaFrom.limit(0)
    else spark.read.option("basePath", indexDir)
      .parquet(hit.map(p => s"$indexDir/pfx=$p"): _*).drop("pfx")
  }

  /** Distinct prefixes of a (pfx-carrying) probe — a bounded
    * driver-side set, ≤ min(parts, |batch keys|).
    */
  private def touchedOf(probe: DataFrame): Set[Long] =
    probe.select(col("pfx")).distinct().collect().map(_.getLong(0)).toSet

  /** Append a batch's (pfx-carrying) probe rows to a pruned index,
    * clustered on pfx so each batch adds ONE file per touched
    * directory — the small-files rate compaction has to absorb.
    */
  private def appendPruned(probe: DataFrame, indexDir: String): Unit =
    probe.repartition(col("pfx"))
      .write.mode("append").partitionBy("pfx").parquet(indexDir)

  /** Seed the PRUNED simhash band index: same rows as
    * [[seedSimhashIndex]], laid out `partitionBy(pfx)` with
    * `pfx = ` [[bkeyPrefix]] over `parts` directories. This is the
    * layout the plain probe's Scaladoc promises for production: a
    * micro-batch touches at most |batch| × bands distinct (band, bkey)
    * keys, so a probe filtered to the batch's prefixes READS only
    * those directories (partition pruning at the scan) — per-batch
    * index I/O is bounded by the batch's keyspace, never the corpus.
    * At 100 TB the index is the corpus-sized side and every micro-batch
    * re-reading it is the dominant cost of the un-pruned layout.
    */
  def seedSimhashIndexPruned(corpus: DataFrame, textCol: String,
      idCol: String, indexDir: String, parts: Int = 64, bits: Int = 64,
      bands: Int = 4, shingleK: Int = 3): Unit = {
    // one projection — band rows carry the fingerprint (see
    // seedFingerprintIndex); the only shuffle left is the pfx
    // clustering for the partitioned layout
    val fp = Dedup.simhash(corpus, textCol, idCol, bits, shingleK)
    Dedup.simhashBandRows(fp, bits, bands)
      .withColumn("pfx", bkeyPrefix(col("band"), col("bkey"), parts))
      .repartition(col("pfx"))
      .write.mode("overwrite").partitionBy("pfx").parquet(indexDir)
    writePartsMarker(indexDir, parts)
  }

  /** One micro-batch of the PRUNED streaming probe: identical pair
    * semantics to [[simhashProbeBatch]] (same core, so
    * batch-division invariance and replay idempotence carry over), but
    * the index read is restricted to the batch's own partition
    * prefixes — the distinct `pfx` values of the probe rows, at most
    * min(`parts`, |batch| × bands) of them, collected to the driver as
    * a bounded set and read as EXPLICIT touched-∩-live directory paths
    * ([[readTouchedPruned]]; the spec pins the strict file subset on
    * this read path). `parts` must match the seed's value — the prefix
    * function is the layout's contract, enforced by the
    * `_graft_parts` marker (a mismatch fails loudly instead of
    * silently dropping pairs).
    */
  def simhashProbeBatchPruned(batch: DataFrame, textCol: String,
      idCol: String, indexDir: String, parts: Int = 64, bits: Int = 64,
      bands: Int = 4, maxDistance: Int = 3, shingleK: Int = 3): DataFrame = {
    require(maxDistance <= bands - 1,
      s"banding into $bands bands is only exact up to distance ${bands - 1}")
    val spark = batch.sparkSession
    val fp = Dedup.simhash(batch, textCol, idCol, bits, shingleK)
    // one projection + one checkpoint per batch (fingerprint on the
    // band rows — see fingerprintProbeBatch)
    val probe = Dedup.simhashBandRows(fp, bits, bands)
      .withColumn("pfx", bkeyPrefix(col("band"), col("bkey"), parts))
      .localCheckpoint()
    checkPartsMarker(indexDir, parts)
    val index = readTouchedPruned(spark, indexDir, touchedOf(probe),
      schemaFrom = probe.drop("pfx"))
    val pairs = simhashPairsAgainst(probe.drop("pfx"), index,
        bits, maxDistance)
      .localCheckpoint()
    appendPruned(probe, indexDir)
    pairs
  }

  /** Compact a probe index in place: every micro-batch append adds a
    * file (per shuffle partition), so a long-running ingest
    * accumulates O(batches) small files and directory listing + footer
    * reads come to dominate each batch's index scan — the classic
    * streaming small-files problem, same failure mode the event
    * store's segment compaction exists for. Rewrites the index
    * CLUSTERED on `clusterCols` (probe keys: band/bkey, tbl/bucket,
    * fp) into `targetFiles` files, then swaps the new generation in.
    * Content-preserving by construction (one read, one write, no
    * filtering), so a compaction between any two batches cannot
    * change any future batch's pairs — CompactIndexSpec pins both.
    * The swap is not concurrent-reader-safe; call it BETWEEN batches
    * (foreachBatch is sequential, so inside the sink is safe —
    * production on object storage would write a new generation dir
    * and flip a manifest pointer instead, the store's own manifest
    * discipline).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, clusterCols: Seq[String],
      targetFiles: Int = 8, partitionCols: Seq[String] = Nil): Unit = {
    val tmp = new java.io.File(indexDir + ".compact-tmp")
    graft.core.Fs.deleteRecursively(tmp)
    rewriteClustered(spark, indexDir, tmp.toString, clusterCols,
      targetFiles, partitionCols)
    val live = new java.io.File(indexDir)
    graft.core.Fs.deleteRecursively(live)
    require(tmp.renameTo(live),
      s"compactIndex: could not swap $tmp into place at $live")
  }

  /** The clustered rewrite both compaction forms share
    * ([[compactIndex]]'s in-place swap and [[GenIndex.compact]]'s
    * generation flip): one read, one write — content-preserving by
    * construction. A PRUNED layout must be rewritten partitionBy the
    * same dirs or the pruning column degrades to a data column and
    * every later probe loses directory pruning; clustering on the
    * partition cols sends each dir's rows to one task, so the rewrite
    * is one file per directory. The `_graft_parts` layout marker is
    * carried forward.
    */
  private[streaming] def rewriteClustered(
      spark: org.apache.spark.sql.SparkSession,
      srcDir: String, destDir: String, clusterCols: Seq[String],
      targetFiles: Int, partitionCols: Seq[String]): Unit = {
    val w = spark.read.parquet(srcDir)
      .repartition(targetFiles, clusterCols.map(col): _*)
      .write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(destDir)
    copyPartsMarker(srcDir, destDir)
  }

  /** Seed the MINHASH band index from the at-rest corpus: one row per
    * (id, band) — (id, band, bkey), the same signature/banding as the
    * probe side. Unlike simhash the index carries no per-doc
    * fingerprint: minhash verification is exact Jaccard over shingle
    * sets, which the probe re-derives candidate-restricted from the
    * document store at verify time.
    */
  def seedMinhashIndex(corpus: DataFrame, textCol: String, idCol: String,
      indexDir: String, k: Int = 3, numHashes: Int = 8,
      bands: Int = 4): Unit = {
    val sh = Dedup.wordShingles(corpus, textCol, idCol, k)
    Dedup.bandKeys(Dedup.minhashSignatures(sh, numHashes),
        bands, numHashes / bands)
      .write.mode("overwrite").parquet(indexDir)
  }

  /** One micro-batch of the streaming MINHASH probe — the
    * [[simhashProbeBatch]] shape with LSH-over-minhash banding and a
    * candidate-restricted exact-Jaccard verify: shingle + sign the
    * batch, probe the index AND the batch on (band, bkey), then
    * verify ONLY candidate-pair documents, shingled on demand from
    * `docSource` (the document store covering everything ingested so
    * far — at 100 TB the verify reads O(candidate docs), never the
    * corpus; the r11 candidate-restricted discipline). Appends the
    * batch's band keys to the index after the pairs are materialized.
    * Returns (a, b, jaccard), a < b, jaccard ≥ `threshold`.
    */
  def minhashProbeBatch(batch: DataFrame, textCol: String, idCol: String,
      indexDir: String, docSource: DataFrame, k: Int = 3,
      numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.0): DataFrame = {
    val spark = batch.sparkSession
    val sh = Dedup.wordShingles(batch, textCol, idCol, k)
    val probe = Dedup.bandKeys(Dedup.minhashSignatures(sh, numHashes),
        bands, numHashes / bands)
      .localCheckpoint()
    val pairs = minhashPairsAgainst(probe, spark.read.parquet(indexDir),
        docSource, textCol, idCol, k, threshold)
      .localCheckpoint()
    probe.write.mode("append").parquet(indexDir)
    pairs
  }

  /** Candidate generation + exact-Jaccard verify of one minhash-banded
    * probe against one index snapshot — the shared core of
    * [[minhashProbeBatch]] and [[minhashProbeBatchPruned]]. Both sides
    * carry (id, band, bkey); verification re-derives shingles
    * candidate-restricted from `docSource` (the SOURCE is semi-joined
    * down BEFORE the explode, so the explode never touches the
    * non-candidate corpus — jaccardForCandidates semi-joins again
    * internally).
    */
  private def minhashPairsAgainst(probe: DataFrame, index: DataFrame,
      docSource: DataFrame, textCol: String, idCol: String, k: Int,
      threshold: Double,
      verify: (DataFrame, DataFrame) => DataFrame =
        Dedup.jaccardForCandidates,
      measureCol: String = "jaccard"): DataFrame = {
    val all = index.unionByName(probe)
    val cand = probe.as("x")
      .join(all.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("a"),
        greatest(col("x.id"), col("y.id")).as("b"))
      .distinct()
      .localCheckpoint()
    val candIds = cand.select(col("a").as("docsrc_id"))
      .unionAll(cand.select(col("b").as("docsrc_id"))).distinct()
    val candDocs = docSource
      .join(candIds,
        docSource(idCol) === candIds("docsrc_id"), "left_semi")
    val candSh = Dedup.wordShingles(candDocs, textCol, idCol, k)
    verify(cand, candSh)
      .where(col(measureCol) >= threshold)
  }

  /** The CONTAINMENT member of the streaming family over the pruned,
    * generation-addressed layout: the [[minhashProbeBatchPruned]]
    * probe verbatim (one band index serves every measure — the probe,
    * the touched-∩-live read, and the clustered append are all the
    * minhash member's) with the asymmetric |A∩B|/min verify
    * ([[Dedup.containmentForCandidates]]) in place of Jaccard. Same
    * batch-division invariance by the same argument: a pair is
    * emitted when its later member arrives, and both measures verify
    * from the members' FULL shingle sets via `docSource`, never from
    * partial batch state. Returns (a, b, containment), a < b.
    */
  def containmentProbeBatchPruned(batch: DataFrame, textCol: String,
      idCol: String, indexDir: String, docSource: DataFrame,
      parts: Int = 64, k: Int = 3, numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.0): DataFrame = {
    val spark = batch.sparkSession
    val sh = Dedup.wordShingles(batch, textCol, idCol, k)
    val probe = Dedup.bandKeys(Dedup.minhashSignatures(sh, numHashes),
        bands, numHashes / bands)
      .withColumn("pfx", keyPrefix(parts, col("band"), col("bkey")))
      .localCheckpoint()
    checkPartsMarker(indexDir, parts)
    val index = readTouchedPruned(spark, indexDir, touchedOf(probe),
      schemaFrom = probe.drop("pfx"))
    val pairs = minhashPairsAgainst(probe.drop("pfx"), index,
        docSource, textCol, idCol, k, threshold,
        verify = Dedup.containmentForCandidates,
        measureCol = "containment")
      .localCheckpoint()
    appendPruned(probe, indexDir)
    pairs
  }

  /** PRUNED-layout minhash index seed: [[seedMinhashIndex]] rows laid
    * out `partitionBy(pfx = ` [[keyPrefix]] `(band, bkey))` — same
    * layout contract as the simhash member.
    */
  def seedMinhashIndexPruned(corpus: DataFrame, textCol: String,
      idCol: String, indexDir: String, parts: Int = 64, k: Int = 3,
      numHashes: Int = 8, bands: Int = 4): Unit = {
    val sh = Dedup.wordShingles(corpus, textCol, idCol, k)
    Dedup.bandKeys(Dedup.minhashSignatures(sh, numHashes),
        bands, numHashes / bands)
      .withColumn("pfx", keyPrefix(parts, col("band"), col("bkey")))
      .repartition(col("pfx"))
      .write.mode("overwrite").partitionBy("pfx").parquet(indexDir)
    writePartsMarker(indexDir, parts)
  }

  /** PRUNED-layout minhash probe: identical pair semantics to
    * [[minhashProbeBatch]] (shared core), index read restricted to the
    * batch's own partition prefixes.
    */
  def minhashProbeBatchPruned(batch: DataFrame, textCol: String,
      idCol: String, indexDir: String, docSource: DataFrame,
      parts: Int = 64, k: Int = 3, numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.0): DataFrame = {
    val spark = batch.sparkSession
    val sh = Dedup.wordShingles(batch, textCol, idCol, k)
    val probe = Dedup.bandKeys(Dedup.minhashSignatures(sh, numHashes),
        bands, numHashes / bands)
      .withColumn("pfx", keyPrefix(parts, col("band"), col("bkey")))
      .localCheckpoint()
    checkPartsMarker(indexDir, parts)
    val index = readTouchedPruned(spark, indexDir, touchedOf(probe),
      schemaFrom = probe.drop("pfx"))
    val pairs = minhashPairsAgainst(probe.drop("pfx"), index,
        docSource, textCol, idCol, k, threshold)
      .localCheckpoint()
    appendPruned(probe, indexDir)
    pairs
  }

  /** Seed the WINNOW fingerprint index from the at-rest corpus: one
    * row per (id, fp) — the distinct winnowed fingerprints, the same
    * selection as the probe side. Overlap counting needs every
    * retained fingerprint, so unlike the banded indexes this one keeps
    * the full per-doc selection (still O(len/w) per document — the
    * winnowing guarantee, not the shingle set).
    */
  def seedWinnowIndex(corpus: DataFrame, textCol: String, idCol: String,
      indexDir: String, k: Int = 3, w: Int = 4): Unit =
    Dedup.winnowFingerprints(corpus, textCol, idCol, k, w)
      .select(col("id"), col("fp")).distinct()
      .write.mode("overwrite").parquet(indexDir)

  /** One micro-batch of the streaming WINNOW probe: fingerprint the
    * batch, join the index AND the batch on fp, count shared
    * fingerprints per candidate pair, keep pairs at `minShared`+.
    * The shared count is COMPLETE at emission time — the batch holds
    * its member's full selection and the earlier member's full
    * selection is already indexed — so the `minShared` gate and the
    * emitted counts are batch-division-invariant like the other two
    * probes. Returns (a, b, shared_fps), a < b.
    */
  def winnowProbeBatch(batch: DataFrame, textCol: String, idCol: String,
      indexDir: String, k: Int = 3, w: Int = 4,
      minShared: Long = 2L): DataFrame = {
    val spark = batch.sparkSession
    val fps = Dedup.winnowFingerprints(batch, textCol, idCol, k, w)
      .select(col("id"), col("fp")).distinct().localCheckpoint()
    val pairs = winnowPairsAgainst(fps, spark.read.parquet(indexDir),
        minShared)
      .localCheckpoint()
    fps.write.mode("append").parquet(indexDir)
    pairs
  }

  /** Shared-fingerprint pair counting of one winnow selection against
    * one index snapshot — the shared core of [[winnowProbeBatch]] and
    * [[winnowProbeBatchPruned]]. Counts stay COMPLETE under pruning:
    * every fingerprint two documents share is, by definition, in the
    * batch member's own selection, so its directory is always among
    * the probe's touched prefixes.
    */
  private def winnowPairsAgainst(fps: DataFrame, index: DataFrame,
      minShared: Long): DataFrame = {
    val all = index.unionByName(fps)
    fps.select(col("id").as("x"), col("fp"))
      .join(all.select(col("id").as("y"), col("fp")), "fp")
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"), col("fp"))
      .distinct()
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
  }

  /** PRUNED-layout winnow index seed: [[seedWinnowIndex]] rows laid
    * out `partitionBy(pfx = ` [[keyPrefix]] `(fp))` — the fingerprint
    * itself is the probe key.
    */
  def seedWinnowIndexPruned(corpus: DataFrame, textCol: String,
      idCol: String, indexDir: String, parts: Int = 64, k: Int = 3,
      w: Int = 4): Unit = {
    Dedup.winnowFingerprints(corpus, textCol, idCol, k, w)
      .select(col("id"), col("fp")).distinct()
      .withColumn("pfx", keyPrefix(parts, col("fp")))
      .repartition(col("pfx"))
      .write.mode("overwrite").partitionBy("pfx").parquet(indexDir)
    writePartsMarker(indexDir, parts)
  }

  /** PRUNED-layout winnow probe: identical pair/count semantics to
    * [[winnowProbeBatch]] (shared core), index read restricted to the
    * batch's own fingerprint prefixes.
    */
  def winnowProbeBatchPruned(batch: DataFrame, textCol: String,
      idCol: String, indexDir: String, parts: Int = 64, k: Int = 3,
      w: Int = 4, minShared: Long = 2L): DataFrame = {
    val spark = batch.sparkSession
    val fps = Dedup.winnowFingerprints(batch, textCol, idCol, k, w)
      .select(col("id"), col("fp")).distinct()
      .withColumn("pfx", keyPrefix(parts, col("fp")))
      .localCheckpoint()
    checkPartsMarker(indexDir, parts)
    val index = readTouchedPruned(spark, indexDir, touchedOf(fps),
      schemaFrom = fps.drop("pfx"))
    val pairs = winnowPairsAgainst(fps.drop("pfx"), index, minShared)
      .localCheckpoint()
    appendPruned(fps, indexDir)
    pairs
  }

  /** Seed the random-hyperplane COSINE bucket index from the at-rest
    * corpus: one row per (id, tbl) — (id, tbl, bucket), the
    * multi-table signature of [[graft.ops.Similarity.cosineNearDupPairs]].
    * Vectors themselves stay in the vector store (`vecSource` at probe
    * time); the index carries only bucket keys.
    */
  def seedCosineIndex(corpus: DataFrame, idCol: String, vecCol: String,
      indexDir: String, planes: Int = 16, tables: Int = 3): Unit =
    // one corpus pass (posexplode over the per-table bucket array; pos
    // IS the table index) — the pre-r18 union of per-table selects
    // scanned the corpus `tables` times
    corpus.select(col(idCol).as("id"),
        posexplode(array((0 until tables).map(t =>
          graft.ops.Similarity.lshBucket(col(vecCol), planes, t)): _*))
          .as(Seq("tbl", "bucket")))
      .write.mode("overwrite").parquet(indexDir)

  /** One micro-batch of the streaming EMBEDDING-COSINE probe — the
    * semantic member of the family. The stream carries vector IDS
    * (production events reference the vector store; floats round-trip
    * badly through text payloads), so the batch first pulls its
    * vectors from `vecSource` by semi-join, signs them into all
    * `tables` hyperplane tables, probes the index AND itself on
    * (tbl, bucket), and verifies candidates by exact rounded cosine —
    * vectors again read candidate-restricted from `vecSource`. No
    * bucket-size pruning here (unlike the batch form's `maxBucket`):
    * bucket size evolves as the index grows, so a mid-stream size cut
    * would break batch-division invariance; production guards
    * over-dense buckets with a bounded per-bucket anchor cap instead
    * (the semanticDedup discipline). Returns (a, b, cosine), a < b,
    * cosine ≥ `threshold`; appends the batch's bucket rows after the
    * pairs are materialized.
    */
  def cosineProbeBatch(batchIds: DataFrame, vecSource: DataFrame,
      idCol: String, vecCol: String, indexDir: String, threshold: Double,
      planes: Int = 16, tables: Int = 3): DataFrame = {
    val spark = batchIds.sparkSession
    val probe = cosineProbeBuckets(batchIds, vecSource, idCol, vecCol,
      planes, tables).localCheckpoint()
    val pairs = cosinePairsAgainst(probe, spark.read.parquet(indexDir),
        vecSource, idCol, vecCol, threshold)
      .localCheckpoint()
    probe.write.mode("append").parquet(indexDir)
    pairs
  }

  /** Multi-table hyperplane bucket rows (id, tbl, bucket) for a batch
    * of arriving vector ids — the probe side shared by the flat and
    * pruned cosine members.
    */
  private def cosineProbeBuckets(batchIds: DataFrame, vecSource: DataFrame,
      idCol: String, vecCol: String, planes: Int, tables: Int): DataFrame = {
    val ids = batchIds.select(col(batchIds.columns.head).as("probe_id"))
    val bvecs = vecSource
      .join(ids, vecSource(idCol) === ids("probe_id"), "left_semi")
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
    // one pass over the batch's vectors (see seedCosineIndex)
    bvecs.select(col("id"),
      posexplode(array((0 until tables).map(t =>
        graft.ops.Similarity.lshBucket(col("vec"), planes, t)): _*))
        .as(Seq("tbl", "bucket")))
  }

  /** Candidate generation + exact rounded-cosine verify of one bucket
    * probe against one index snapshot — the shared core of
    * [[cosineProbeBatch]] and [[cosineProbeBatchPruned]]. Vectors are
    * read candidate-restricted from `vecSource`.
    */
  private def cosinePairsAgainst(probe: DataFrame, index: DataFrame,
      vecSource: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val all = index.unionByName(probe)
    val cand = probe.select(col("tbl"), col("bucket"), col("id").as("x"))
      .join(all.select(col("tbl"), col("bucket"), col("id").as("y")),
        Seq("tbl", "bucket"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint()
    val candIds = cand.select(col("a").as("cid"))
      .unionAll(cand.select(col("b").as("cid"))).distinct()
    val vecs = vecSource
      .join(candIds, vecSource(idCol) === candIds("cid"), "left_semi")
      .select(col(idCol).as("vid"), col(vecCol).as("vv"))
    cand
      .join(vecs.select(col("vid").as("a"), col("vv").as("va")), "a")
      .join(vecs.select(col("vid").as("b"), col("vv").as("vb")), "b")
      .withColumn("cosine",
        round(graft.ops.Similarity.cosine(col("va"), col("vb")), 6))
      .where(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }

  /** PRUNED-layout cosine bucket index seed: [[seedCosineIndex]] rows
    * laid out `partitionBy(pfx = ` [[keyPrefix]] `(tbl, bucket))`.
    */
  def seedCosineIndexPruned(corpus: DataFrame, idCol: String,
      vecCol: String, indexDir: String, parts: Int = 64,
      planes: Int = 16, tables: Int = 3): Unit = {
    // one corpus pass (see seedCosineIndex)
    corpus.select(col(idCol).as("id"),
        posexplode(array((0 until tables).map(t =>
          graft.ops.Similarity.lshBucket(col(vecCol), planes, t)): _*))
          .as(Seq("tbl", "bucket")))
      .withColumn("pfx", keyPrefix(parts, col("tbl"), col("bucket")))
      .repartition(col("pfx"))
      .write.mode("overwrite").partitionBy("pfx").parquet(indexDir)
    writePartsMarker(indexDir, parts)
  }

  /** PRUNED-layout cosine probe: identical pair semantics to
    * [[cosineProbeBatch]] (shared core), index read restricted to the
    * batch's own (tbl, bucket) prefixes.
    */
  def cosineProbeBatchPruned(batchIds: DataFrame, vecSource: DataFrame,
      idCol: String, vecCol: String, indexDir: String, threshold: Double,
      parts: Int = 64, planes: Int = 16, tables: Int = 3): DataFrame = {
    val spark = batchIds.sparkSession
    val probe = cosineProbeBuckets(batchIds, vecSource, idCol, vecCol,
        planes, tables)
      .withColumn("pfx", keyPrefix(parts, col("tbl"), col("bucket")))
      .localCheckpoint()
    checkPartsMarker(indexDir, parts)
    val index = readTouchedPruned(spark, indexDir, touchedOf(probe),
      schemaFrom = probe.drop("pfx"))
    val pairs = cosinePairsAgainst(probe.drop("pfx"), index,
        vecSource, idCol, vecCol, threshold)
      .localCheckpoint()
    appendPruned(probe, indexDir)
    pairs
  }
}
