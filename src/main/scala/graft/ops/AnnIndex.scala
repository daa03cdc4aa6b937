package graft.ops

import graft.streaming.GenIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, generation-addressed IVF-PQ index — the ANN
  * counterpart of the streaming dedup family's signature store, and
  * the missing piece of the in-session [[Similarity.ivfPqTopKBatch]]:
  * at 100 TB the codes table is corpus-sized, so retraining and
  * re-encoding it for every query batch (what every gated in-session
  * ANN leg does) is a scale-killer. The reference builds its indexes
  * once, at segment seal, and serves reads from the built artifact
  * (`/root/reference/crates/sierradb/src/writer_thread_pool.rs:698-793`,
  * `database.rs:815-854`); this is that shape on Spark storage.
  *
  * Layout, inside a [[graft.streaming.GenIndex]] generation dir:
  * {{{
  *   <root>/MANIFEST            -> "gen-00001"     (atomic pointer)
  *   <root>/gen-00001/cents/    parquet (cid long, ce array<double>)
  *   <root>/gen-00001/books/    parquet (s int, ci int, ce array<double>)
  *   <root>/gen-00001/codes/ivf_cid=<cid>/  parquet
  *       (vec_id, code0..code{m-1}, recon_err)
  * }}}
  *
  * The quantizers (coarse centroids + PQ codebooks) are TRAINED ONCE
  * at seed time and FROZEN — the standard IVF discipline: arrivals
  * are encoded with the frozen model (a pure, codegen'd projection,
  * zero shuffle beyond the per-list clustering write), and the model
  * only changes at a full rebuild into a new generation. That is what
  * makes appends cheap and results reproducible: the same vector
  * encodes to the same codes no matter when it arrives.
  *
  * Scale shape of a query batch: the probe set is nprobe lists per
  * query, so the codes READ is partition-pruned to the probed
  * `ivf_cid=` directories (explicit path list — one manifest resolve,
  * one directory listing, never a corpus scan), scoring is the ADC
  * constant-array lookup, and per-query top-k runs on bounded heaps.
  * Per-batch I/O is bounded by the probed lists' size — the defining
  * IVF-PQ candidate mass — not the corpus.
  *
  * Maintenance: [[compact]] rewrites the codes clustered per list
  * into a NEW generation and atomically flips the manifest
  * ([[GenIndex]] semantics — readers that resolved before the flip
  * finish against their own generation), absorbing the one-file-per-
  * append-per-touched-list accumulation.
  */
object AnnIndex {

  /** The frozen model: coarse centroids (cid → centroid) and PQ
    * codebooks (subspace → code id → centroid). Both are bounded
    * trained constants (nlist and m×k entries). `codec` selects the
    * within-list code format: "pq" (codebook ADC, optionally
    * residual/IVFADC), "sq8" (per-vector symmetric int8 — the faiss
    * `IVF…,SQ8` flavor: no codebooks, books is empty, scoring is the
    * full-precision-query-vs-codes cosine whose per-vector scale
    * cancels), or "bq" (sign-bit binary codes packed `bqWords` longs
    * per row — Hamming-scored candidates; pair with
    * [[queryBatchRefined]] for the exact re-rank, the production BQ
    * shape).
    */
  final case class Model(cents: Seq[(Any, Seq[Double])],
      books: Seq[Seq[Seq[Double]]], residual: Boolean = false,
      codec: String = "pq", opqSteps: Int = 0, opqDims: Int = 64,
      bqDims: Int = 64) {
    /** packed long words per code row under the "bq" codec */
    def bqWords: Int = (bqDims + 63) / 64
    def m: Int = books.length
    def k: Int = books.head.length
    def sub: Int = books.head.head.length
    // lazy val, not def: residOf calls this per training vector and
    // queryBatch's residual cube per (query, probed list) — a def
    // would rebuild the full cid→centroid map O(sample × nlist) times
    lazy val centOf: Map[Long, Seq[Double]] = cents.map { case (cid, ce) =>
      cid.asInstanceOf[Number].longValue() -> ce
    }.toMap
    /** nearest-list residual of a driver-side vector — the same
      * rounded-cosine ranking (ties to the smaller cid) as the
      * engine's assignment projection
      */
    def residOf(x: Seq[Double]): Seq[Double] = {
      val cid = cents.map { case (c, ce) =>
        (1.0 - Similarity.cos6(x, ce), c.asInstanceOf[Number].longValue())
      }.min._2
      val c = centOf(cid)
      x.indices.map(i => x(i) - c(i))
    }
  }

  /** Train the quantizers from `corpus` and publish generation 0:
    * model tables + the corpus encoded into per-list directories.
    * Training matches [[Similarity.ivfPqTopKBatch]] exactly (same
    * rounded Lloyd's loops, same ordered-prefix/hash sample), so a
    * from-scratch in-session build and a seed+append+query through
    * this index produce identical results — which is what the
    * correctness gate pins.
    */
  def seed(corpus: DataFrame, root: String, nlist: Int, trainIters: Int,
      m: Int, k: Int, pqIters: Int, maxSample: Int = 10000,
      sampleMode: String = "prefix", idCol: String = "vec_id",
      vecCol: String = "embedding", residual: Boolean = false,
      codec: String = "pq", opqSteps: Int = 0, opqDims: Int = 64): Unit = {
    val spark = corpus.sparkSession
    val model = trainModel(corpus, nlist, trainIters, m, k, pqIters,
      maxSample, sampleMode, idCol, vecCol, residual, codec, opqSteps,
      opqDims)
    GenIndex.init(root) { dir =>
      writeModel(spark, dir, model)
      encode(corpus, model, idCol, vecCol)
        .repartition(col("ivf_cid"))
        .write.mode("overwrite").partitionBy("ivf_cid")
        .parquet(s"$dir/codes")
    }
  }

  /** Quantizer training shared by [[seed]] and [[reseed]] — ONE
    * implementation (the never-drift discipline), a pure function of
    * (corpus, params): same rounded Lloyd's loops, same
    * ordered-prefix/hash sample as [[Similarity.ivfPqTopKBatch]].
    */
  private def trainModel(corpus: DataFrame, nlist: Int, trainIters: Int,
      m: Int, k: Int, pqIters: Int, maxSample: Int,
      sampleMode: String, idCol: String, vecCol: String,
      residual: Boolean, codec: String, opqSteps: Int,
      opqDims: Int): Model = {
    require(codec == "pq" || codec == "sq8" || codec == "bq",
      s"unknown codec $codec")
    require(codec == "pq" || !residual,
      "residual encoding is a PQ concept — sq8/bq have no codebooks")
    // OPQ pre-rotation: the quantizers TRAIN in the rotated space (the
    // rotation is part of the frozen model — encode() and queryBatch()
    // apply it from the _opq marker, so the raw corpus passes through
    // encode unrotated here and encode rotates exactly once)
    val trainCorpus =
      if (opqSteps > 0)
        Similarity.opqRotate(corpus, vecCol, vecCol, opqSteps, opqDims)
      else corpus
    // ONE training-sample collection feeds the coarse trainer and the
    // PQ books (lazy: the sq8/bq codecs at trainIters == 0 never touch
    // it) — each collection is a full-corpus TakeOrdered pass, the
    // dominant training cost at scale, and the pre-r18 shape paid it
    // once per trainer. The trainIters == 0 fallback keeps
    // coarseCentroids' raw-corpus id-prefix semantics (the in-session
    // paths' contract — for sampleMode="hash" the sample prefix would
    // differ, silently breaking "training matches the in-session
    // build exactly").
    lazy val sample = Similarity.collectTrainingSample(trainCorpus,
      maxSample, sampleMode, idCol, vecCol)
    val cents =
      if (trainIters > 0) Similarity.kmeansFrom(sample, nlist, trainIters)
      else Similarity.coarseCentroids(trainCorpus, nlist, 0,
        sampleMode, idCol, vecCol, maxSample)
    // residual=true is the classical IVFADC composition: the PQ books
    // train on the SAMPLE's residuals (x minus its nearest final
    // centroid) and every encode/query below follows the flag — the
    // persisted counterpart of Similarity.ivfPqResidualTopKBatch
    val books =
      if (codec != "pq") Nil // sq8/bq per-vector codes: nothing to train
      else if (residual) {
        val pre = Model(cents, Nil, residual = true)
        Similarity.pqTrainFrom(sample.map(s => pre.residOf(s._2)),
          m, k, pqIters)
      } else Similarity.pqTrainFrom(sample.map(_._2), m, k, pqIters)
    // bq packs by static word slices, so the dimension count is model
    // state — read off the trained coarse centroids (per-dimension
    // means of the same vectors), zero extra Spark actions
    val bqDims =
      if (codec == "bq") cents.head._2.length
      else 64
    Model(cents, books, residual, codec, opqSteps, opqDims, bqDims)
  }

  /** Encode a batch of NEW vectors with the live generation's frozen
    * model and append them into its per-list directories — one file
    * per touched list per batch (the small-files rate [[compact]]
    * absorbs). The projection is the exact [[Similarity.pqCodesWith]]
    * + nearest-centroid expression the seed used, so append order and
    * batching never change a vector's codes.
    */
  def append(vecs: DataFrame, root: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val gen = GenIndex.currentGen(root)
    val model = readModel(vecs.sparkSession, gen)
    encode(vecs, model, idCol, vecCol)
      .repartition(col("ivf_cid"))
      .write.mode("append").partitionBy("ivf_cid")
      .parquet(s"$gen/codes")
  }

  /** Tombstone-delete a batch of ids from the live generation: the
    * ids are appended under `<gen>/tombs/` (one small file per delete
    * batch — the LSM discipline: deletes are writes). Queries mask
    * tombstoned ids out of the probed slice ([[queryBatch]]) and
    * [[compact]] applies them physically (anti-join during the
    * rewrite) and drops the tombstone set with the old generation.
    *
    * Semantics: DELETE WINS within a generation — a tombstone masks
    * every code row bearing the id, including rows appended AFTER the
    * delete, until a compaction has physically removed both; re-insert
    * after that compaction behaves as a fresh id. (A per-row
    * sequence-number order would need the store's version algebra;
    * the index is a derived artifact, so set semantics + compaction
    * are the contract — same shape as the replay-duplicate rule.)
    *
    * Scale: the per-query masking anti-join is bounded by
    * |tombstones since last compaction| — a maintenance-cadence
    * constant, not a corpus term (compaction resets it to zero), and
    * with AQE the small side broadcasts.
    */
  def delete(ids: DataFrame, root: String,
      idCol: String = "vec_id"): Unit = {
    val gen = GenIndex.currentGen(root)
    ids.select(col(idCol).cast("long").as(idCol)).distinct()
      .coalesce(1)
      .write.mode("append").parquet(s"$gen/tombs")
  }

  /** The generation's tombstone set, empty-frame when none exist. */
  private def tombsOf(spark: SparkSession, gen: String,
      idCol: String): DataFrame =
    if (graft.core.Fs.hadoopExists(s"$gen/tombs"))
      spark.read.parquet(s"$gen/tombs")
        .select(col(idCol).cast("long").as(idCol))
    else spark.range(0).select(col("id").as(idCol))

  /** ADC top-k for a driver-side query batch against the PERSISTED
    * index: resolve the manifest, load the frozen model, rank each
    * query's nprobe nearest lists driver-side (nlist-bounded), then
    * read ONLY the probed `ivf_cid=` directories and score by the
    * per-query lookup cube — the same literal-cube / explode /
    * bounded-heap plan as [[Similarity.ivfPqTopKBatch]], with the
    * trained constants and codes coming from storage instead of being
    * recomputed. Returns (qid, `idCol`, adist, rk), rk ≤ `kNN`.
    */
  def queryBatch(spark: SparkSession, root: String,
      qVecs: Seq[(Long, Seq[Double])], kNN: Int, nprobe: Int,
      idCol: String = "vec_id",
      allowed: Option[DataFrame] = None): DataFrame = {
    require(qVecs.nonEmpty, "empty query batch")
    val gen = GenIndex.currentGen(root)
    val model = readModel(spark, gen)
    // OPQ models rank probes and build cubes in the ROTATED space —
    // the driver-side rotation is the bit-identical mirror of the
    // encode projection (Similarity.opqRotateVec)
    val qv = if (model.opqSteps > 0)
      qVecs.map { case (id, v) =>
        (id, Similarity.opqRotateVec(v, model.opqSteps, model.opqDims))
      }
    else qVecs
    // per-query probe set by 6-dp-rounded cosine (ties to the smaller
    // cid) — Similarity.probeSets, the identical ranking to the
    // in-session path
    val probes = Similarity.probeSets(qv, model.cents, nprobe)
    val probedCids = probes.flatMap(_._2).toSet
    // partition-pruned codes read: explicit probed-∩-live directory
    // paths under one listing — per-batch I/O is the probed lists,
    // never the corpus (readTouchedPruned discipline)
    val (fs, codesRoot) = graft.core.Fs.hadoop(s"$gen/codes")
    val live = fs.listStatus(codesRoot).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("ivf_cid="))
      .map(_.stripPrefix("ivf_cid=").toLong).toSet
    val hit = probedCids.intersect(live).toSeq.sorted
    val scoreCol = model.codec match {
      case "sq8" => "cosine"
      case "bq"  => "hamming"
      case _     => "adist"
    }
    val empty = spark.range(0).select(
      col("id").as("qid"), col("id").as(idCol),
      (if (model.codec == "bq") col("id")
       else col("id").cast("double")).as(scoreCol), col("id").as("rk"))
    if (hit.isEmpty) return empty
    // dropDuplicates on vec_id: an at-least-once ingest that replays
    // an append batch leaves bit-identical duplicate code rows (the
    // frozen model maps a vector to one code row forever), and a
    // duplicate surviving into a top-k would occupy two of the k
    // slots. The dedup runs on the PROBED slice only — bounded by the
    // probe set, never the corpus; compact() absorbs duplicates
    // globally.
    // tombstone mask after the dedup: bounded by deletes since the
    // last compaction (which applies them physically), never a corpus
    // term — see delete()
    // FILTERED search (faiss IDSelector semantics): the allowed-id
    // relation PRE-filters the probed candidate slice by one semi-join
    // — scoring is per-candidate independent, so the filtered top-k
    // equals the post-filtered full ranking by construction
    // (AnnIndexSpec pins it), but only allowed rows are ever scored.
    // The join runs on the PROBED slice, so its cost is bounded by
    // the probe set, and the filter relation itself streams through a
    // shuffle/broadcast join at whatever size the predicate yields —
    // never collected. Recall caveat stated: probes are ranked on the
    // UNFILTERED coarse centroids, so a highly-selective filter wants
    // a larger nprobe (the standard filtered-ANN guidance).
    val codes0 = spark.read.option("basePath", s"$gen/codes")
      .parquet(hit.map(c => s"$gen/codes/ivf_cid=$c"): _*)
      .dropDuplicates("vec_id")
      .join(tombsOf(spark, gen, idCol), Seq(idCol), "left_anti")
    val codes = allowed match {
      case Some(a) => codes0.join(
        a.select(a.columns.head).toDF(idCol), Seq(idCol), "left_semi")
      case None => codes0
    }
    // the scoring tail is the SHARED implementation behind the
    // in-session paths (adcProbeScoreTopK / sq8ProbeScoreTopK) — the
    // plan this index's bit-equality contract is pinned against
    if (model.codec == "sq8")
      Similarity.sq8ProbeScoreTopK(codes, qv, probes, kNN, idCol)
    else if (model.codec == "bq")
      Similarity.bqProbeScoreTopK(codes,
        qv.map { case (id, v) =>
          (id, Similarity.packSignBits(v, model.bqWords)) },
        probes, kNN, idCol, model.bqWords)
    else
      Similarity.adcProbeScoreTopK(codes, qv, probes, model.books,
        model.centOf, model.residual, kNN, idCol)
  }

  /** RESEED: train a NEW model on the CURRENT corpus, re-encode into
    * a new generation, and atomically flip the manifest — the
    * model-refresh path a production index eventually needs once the
    * corpus drifts from the seed-time training sample (the frozen-
    * model discipline is per GENERATION, not forever). The index is a
    * derived artifact, so the rebuild derives from the store of
    * record: codes cannot be re-encoded from codes, the caller passes
    * the corpus — exactly [[seed]]'s contract, into [[GenIndex]]'s
    * next generation instead of generation 0.
    *
    * Reader safety is the GenIndex contract: a reader that resolved
    * the manifest before the flip finishes against its own generation
    * (old model + old codes — internally consistent); the flip is one
    * atomic manifest write, and `retain` old generations survive it.
    * A reseed on an unchanged corpus with the same training params is
    * bit-identical to a fresh [[seed]] of that corpus (training is a
    * pure function of the corpus — the determinism contract every
    * trained-constant leg pins), which is what the correctness gate
    * checks.
    *
    * Scale: one training pass (bounded sample), one full-corpus
    * encode projection + clustered write — the cost of a seed, run at
    * maintenance cadence; queries never block.
    */
  def reseed(corpus: DataFrame, root: String, nlist: Int, trainIters: Int,
      m: Int, k: Int, pqIters: Int, maxSample: Int = 10000,
      sampleMode: String = "prefix", idCol: String = "vec_id",
      vecCol: String = "embedding", residual: Boolean = false,
      codec: String = "pq", opqSteps: Int = 0, opqDims: Int = 64,
      retain: Int = 1, allowShrink: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    val (cur, next) = GenIndex.nextGen(root)
    val dir = s"$root/$next"
    // shrinkage guard FIRST — before any training or encode work: the
    // caller passes the corpus (codes cannot be re-encoded from
    // codes), so a corpus snapshot that misses vectors appended to
    // the live generation after the snapshot would silently vanish at
    // the flip. The new generation's id set IS the corpus's (encode
    // is a projection), so the EXACT check is one anti-join count:
    // every SURVIVING live id (duplicates collapsed, tombstones
    // applied — the set a reader of `cur` sees) must appear in the
    // corpus. A count comparison is not enough — a stale snapshot
    // missing N old vectors but carrying ≥N new ids passes it while
    // the old vectors still vanish at the flip. One shuffle of two id
    // columns, refused before a full-corpus encode is wasted, and no
    // orphaned unpublished generation directory is left behind.
    if (!allowShrink) {
      val vanishing = spark.read.parquet(s"$cur/codes")
        .dropDuplicates(idCol)
        .join(tombsOf(spark, cur, idCol), Seq(idCol), "left_anti")
        .select(idCol)
        .join(corpus.select(idCol).distinct(), Seq(idCol), "left_anti")
        .count()
      require(vanishing == 0L,
        s"reseed would shrink the index: $vanishing live ids are " +
          "absent from the passed corpus — the corpus snapshot is " +
          "missing vectors present in the live generation (stale " +
          "snapshot?). Pass allowShrink=true to publish anyway.")
    }
    val model = trainModel(corpus, nlist, trainIters, m, k, pqIters,
      maxSample, sampleMode, idCol, vecCol, residual, codec, opqSteps,
      opqDims)
    writeModel(spark, dir, model)
    encode(corpus, model, idCol, vecCol)
      .repartition(col("ivf_cid"))
      .write.mode("overwrite").partitionBy("ivf_cid")
      .parquet(s"$dir/codes")
    GenIndex.publish(root, next, retain)
  }

  /** Rewrite the live generation's codes clustered one-file-per-list
    * into a NEW generation and flip the manifest — reader-safe
    * compaction, model tables carried forward verbatim. SET-preserving
    * rather than row-preserving: bit-identical duplicate code rows
    * left by an at-least-once ingest replay are absorbed here (the
    * global half of [[queryBatch]]'s probed-slice dedup).
    */
  def compact(spark: SparkSession, root: String, targetFiles: Int = 8,
      retain: Int = 1): Unit = {
    val (cur, next) = GenIndex.nextGen(root)
    // model tables carried forward as a BYTE-IDENTICAL file copy — the
    // strongest form of "verbatim", and two fewer scheduled jobs than
    // the pre-r18 parquet decode + re-serialize round-trip (the model
    // is frozen; compaction rewrites codes, never the model)
    copyModel(spark, cur, s"$root/$next")
    // tombstones are APPLIED here (anti-join during the rewrite) and
    // NOT carried into the new generation — the physical half of the
    // delete contract; the new generation starts with an empty
    // tombstone set
    spark.read.parquet(s"$cur/codes")
      .dropDuplicates("vec_id")
      .join(tombsOf(spark, cur, "vec_id"), Seq("vec_id"), "left_anti")
      .repartition(targetFiles, col("ivf_cid"))
      .write.mode("overwrite").partitionBy("ivf_cid")
      .parquet(s"$root/$next/codes")
    GenIndex.publish(root, next, retain)
  }

  /** [[queryBatch]] + the exact re-rank tail (faiss `RFlat` over a
    * persisted index): the index retrieves `rerank` candidates per
    * query by its codec's approximate score, and full-precision cosine
    * against `corpus`'s RAW vectors re-ranks ONLY those survivors —
    * [[Similarity.exactRefineTopK]], the same shared tail as the
    * in-session refine/matryoshka legs. Refine reads rerank × Q raw
    * rows (a query-batch constant); the index's probe-bounded read
    * carries all corpus-scale cost. Refine is codec-agnostic by
    * construction: it always scores in the ORIGINAL space (cosine is
    * rotation-invariant, so OPQ models need no unrotation).
    * Returns (qid, idCol, cosine, rk), rk ≤ kNN.
    */
  def queryBatchRefined(spark: SparkSession, root: String,
      corpus: DataFrame, qVecs: Seq[(Long, Seq[Double])], kNN: Int,
      rerank: Int, nprobe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding",
      allowed: Option[DataFrame] = None): DataFrame = {
    require(rerank >= kNN, "rerank depth must cover the final top-k")
    // `allowed` composes: the index pre-filters its probed slice
    // (IDSelector semantics), so the refine tail re-ranks only
    // allowed survivors — "top-k among documents matching a
    // predicate, exactly re-ranked", the production RAG retrieval
    // shape, with no filter logic in the refine itself
    val survivors = queryBatch(spark, root, qVecs, rerank, nprobe,
        idCol, allowed)
      .select(col("qid"), col(idCol))
    Similarity.exactRefineTopK(corpus, survivors, qVecs, kNN, idCol,
      vecCol)
  }

  /** Collect a bounded query batch as the driver-side
    * `(id, vector)` seq [[queryBatch]] takes — ordered by id so the
    * probe sets and the lookup cube are deterministic. One helper so
    * every call site (gated queries, bench canaries, plan tools)
    * builds the batch identically.
    */
  def collectQueryVecs(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Long, Seq[Double])] =
    df.select(col(idCol), col(vecCol)).collect().toSeq
      .map(r => (r.getLong(0),
        r.getSeq[Any](1).map { case n: Number => n.doubleValue() }))
      .sortBy(_._1)

  /** The frozen-model encode projection shared by seed and append:
    * nearest coarse centroid (6-dp-rounded cosine ranking, ties to
    * the smaller cid) carried through the PQ code assignment — all
    * plan literals, zero shuffle, stays in whole-stage codegen.
    */
  private def encode(vecs: DataFrame, model: Model, idCol: String,
      vecCol: String): DataFrame = {
    // the rotation is model state: every vector entering the index is
    // rotated exactly once, no matter which batch or codec
    val rvecs =
      if (model.opqSteps > 0)
        Similarity.opqRotate(vecs, vecCol, vecCol, model.opqSteps,
          model.opqDims)
      else vecs
    val assigned = rvecs.withColumn("ivf_cid",
      element_at(Similarity.centroidRanking(col(vecCol), model.cents), 1)
        .getField("cid").cast("long"))
    if (model.codec == "sq8")
      // per-vector symmetric int8 — the exact quantizeInt8 projection
      // the in-session ivfSq8TopKBatch encodes with, still zero-shuffle
      Curation.quantizeInt8(assigned, idCol, vecCol)
        .select(col(idCol), col("ivf_cid"), col("codes").as("cd"))
    else if (model.codec == "bq")
      // sign-bit packing — the exact packSignBitsCol projection the
      // in-session flat scan encodes with, zero-shuffle, 1 bit/dim
      assigned.select(col(idCol), col("ivf_cid"),
        Similarity.packSignBitsCol(col(vecCol), model.bqWords)
          .as("code"))
    else if (model.residual)
      // classical IVFADC: codes quantize x - centroid(list(x)) — the
      // residual is a zip_with against the cid->centroid map literal,
      // still a zero-shuffle codegen projection
      Similarity.pqCodesWith(
        assigned.withColumn("rv",
          zip_with(col(vecCol).cast("array<double>"),
            element_at(typedLit(model.centOf), col("ivf_cid")),
            (a, b) => a - b)),
        model.books, idCol = idCol, vecCol = "rv", keep = Seq("ivf_cid"))
    else
      Similarity.pqCodesWith(assigned, model.books, idCol = idCol,
        vecCol = vecCol, keep = Seq("ivf_cid"))
  }

  /** Carry a generation's frozen-model files into a new generation
    * directory as a byte-level copy (driver-side Hadoop FS I/O, no
    * Spark jobs) — [[compact]]'s model handoff. Invalidates the
    * model memo for `dest` first: generation numbers restart when a
    * root is wiped and re-seeded, so in a long-lived JVM the dest
    * path may carry a memo entry from a prior lifetime of the same
    * root — serving it after this copy would be silently stale.
    */
  private def copyModel(spark: SparkSession, cur: String,
      dest: String): Unit = {
    modelCache.synchronized { modelCache.remove(dest) }
    val (fs, _) = graft.core.Fs.hadoop(cur)
    val conf = spark.sparkContext.hadoopConfiguration
    Seq("cents", "books", "_residual", "_codec", "_opq", "_bqdims")
      .foreach { n =>
        val src = new org.apache.hadoop.fs.Path(s"$cur/$n")
        if (fs.exists(src))
          org.apache.hadoop.fs.FileUtil.copy(fs, src,
            fs, new org.apache.hadoop.fs.Path(s"$dest/$n"), false, conf)
      }
  }

  /** Frozen-model memo, keyed by generation directory. A generation's
    * model tables are written once (before publish) and never mutated
    * — maintenance writes a NEW generation — so re-reading cents+books
    * from parquet on EVERY append/compact/query call (two scheduled
    * collect jobs apiece, a fixed maintenance-latency constant at any
    * corpus size) is pure overhead after the first read. Deliberately
    * populated only by a GENUINE parquet read, never by [[writeModel]]
    * (which instead invalidates): the first reader of every generation
    * still exercises the full model round-trip, so the bench's
    * persisted-vs-in-session equality canaries keep their power to
    * catch storage-layer bugs. Bounded LRU; entries for deleted temp
    * generations age out.
    */
  private val modelCache =
    new java.util.LinkedHashMap[String, Model](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Model]): Boolean = size() > 64
    }

  private def writeModel(spark: SparkSession, dir: String,
      model: Model): Unit = {
    modelCache.synchronized { modelCache.remove(dir) }
    import spark.implicits._
    // the residual flag and the codec are part of the model contract:
    // a probe must build the encode-matching scoring or every distance
    // is wrong
    graft.core.Fs.writeUtf8(s"$dir/_residual", model.residual.toString)
    graft.core.Fs.writeUtf8(s"$dir/_codec", model.codec)
    graft.core.Fs.writeUtf8(s"$dir/_opq",
      s"${model.opqSteps}:${model.opqDims}")
    if (model.codec == "bq")
      graft.core.Fs.writeUtf8(s"$dir/_bqdims", model.bqDims.toString)
    model.cents
      .map { case (cid, ce) => (cid.asInstanceOf[Number].longValue(), ce) }
      .toDF("cid", "ce")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/cents")
    model.books.zipWithIndex
      .flatMap { case (book, s) =>
        book.zipWithIndex.map { case (ce, ci) => (s, ci, ce) }
      }
      .toDF("s", "ci", "ce")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/books")
  }

  /** Read the frozen model back — through the per-generation memo
    * (see [[modelCache]]): the first call per generation does the
    * parquet round-trip, later calls in the same JVM reuse it.
    */
  private def readModel(spark: SparkSession, dir: String): Model = {
    modelCache.synchronized { Option(modelCache.get(dir)) } match {
      case Some(m) => m
      case None =>
        val m = readModelIO(spark, dir)
        modelCache.synchronized { modelCache.put(dir, m) }
        m
    }
  }

  /** The actual parquet round-trip behind [[readModel]]. Codebook
    * centroid ids are POSITIONS (`books(s)(ci)`), so both tables
    * re-sort on their ids — parquet row order is not a contract.
    */
  private def readModelIO(spark: SparkSession, dir: String): Model = {
    val cents = spark.read.parquet(s"$dir/cents")
      .collect().toSeq
      .map(r => (r.getLong(0): Any, r.getSeq[Double](1)))
      .sortBy(_._1.asInstanceOf[Long])
    val books = spark.read.parquet(s"$dir/books")
      .collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))
    val residual = graft.core.Fs.hadoopExists(s"$dir/_residual") &&
      graft.core.Fs.readUtf8(s"$dir/_residual").trim.toBoolean
    val codec =
      if (graft.core.Fs.hadoopExists(s"$dir/_codec"))
        graft.core.Fs.readUtf8(s"$dir/_codec").trim
      else "pq" // pre-codec generations are all PQ
    val (opqSteps, opqDims) =
      if (graft.core.Fs.hadoopExists(s"$dir/_opq")) {
        val Array(st, dm) =
          graft.core.Fs.readUtf8(s"$dir/_opq").trim.split(":")
        (st.toInt, dm.toInt)
      } else (0, 64) // pre-OPQ generations are unrotated
    val bqDims =
      if (graft.core.Fs.hadoopExists(s"$dir/_bqdims"))
        graft.core.Fs.readUtf8(s"$dir/_bqdims").trim.toInt
      else 64
    Model(cents, books, residual, codec, opqSteps, opqDims, bqDims)
  }
}
