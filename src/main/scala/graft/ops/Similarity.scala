package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - `bruteForceTopK`: exact cosine top-k. Query side broadcast, one
  *     pass over the corpus, per-query top-k via bounded heaps
  *     ([[graft.plans.TopK]], ranks from the final heap pass). This is
  *     the correctness baseline and is already 100 TB-shaped for small
  *     query sets (broadcast join + single scan, no shuffle of the
  *     corpus).
  *   - `lshTopK`: random-hyperplane LSH. Each vector gets a `planes`-bit
  *     bucket signature; only same-bucket pairs are scored. The
  *     hyperplanes are derived deterministically from md5 so results
  *     are reproducible across engines (an external oracle can recompute
  *     them). At scale this turns the cross join into an equi-join on
  *     bucket — the shuffle key is the bucket id.
  *
  * All arithmetic is double-precision, sequential over the array, so
  * results are bit-stable across engines.
  */
object Similarity {

  /** Sequential-fold dot product in double precision. Codegen'd native
    * expression (graft.functions.ArrayDotCols) — value-identical to the
    * `aggregate(zip_with(...))` higher-order formulation (same element
    * order and double sequence, VecExprSpec pins it) but it stays inside
    * whole-stage codegen instead of interpreted per-element eval.
    */
  def dot(a: Column, b: Column): Column = graft.functions.vec.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-query top-k of scored (qid, id, cosine) candidates by
    * (cosine desc, id asc), ranks emitted by the heap pass — bounded
    * heaps instead of a full per-group window sort. The candidate set
    * per query is a corpus fraction (all of it for brute force), so
    * the window's group sort is the part that breaks first at scale;
    * the explicit pre-projection keeps heap rows narrow (column
    * pruning does not push through a custom node).
    */
  private def topKByCosine(scored: DataFrame, k: Int, idCol: String): DataFrame =
    graft.plans.TopK.topKPerKey(
        scored.select(col("qid"), col(idCol), col("cosine")),
        Seq("qid"), Seq(col("cosine").desc, col(idCol).asc), k,
        rankCol = Some("rk"))
      .select(col("qid"), col(idCol), col("cosine"), col("rk"))

  /** Exact top-k neighbors for the query rows (qid, qe). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    topKByCosine(
      corpus.crossJoin(broadcast(queries))
        .where(col(idCol) =!= col("qid"))
        .withColumn("cosine", round(cosine(col("qe"), col(vecCol)), 6)),
      k, idCol)

  /** Scalar-quantized (SQ8) top-k — the compression tier BETWEEN raw
    * floats and PQ that production vector stores offer (faiss
    * `SQ8`/Milvus `SQ8` flavor): the corpus is stored as per-vector
    * symmetric int8 codes under [[Curation.quantizeInt8]]'s exact
    * quantizer (scale = max|x|/127, floor(x/scale + 0.5) clamped to
    * ±127) and queries score full-precision-against-dequantized
    * cosine. The per-vector scale is a POSITIVE SCALAR, so it cancels
    * in the cosine — scoring runs directly on the codes, and the
    * asymmetric distance needs no dequantize multiply at all.
    *
    * Scale shape: one projection to quantize (zero shuffle, stays in
    * codegen), then the flat-scan batch form of [[pqAdcTopKBatch]] —
    * every code row explodes into the Q query positions, distance is
    * one codegen'd dot over the int8 codes, survivors feed the
    * two-phase bounded heaps. At 100 TB the win is the SCAN: int8
    * codes are 1/8th the bytes of float64 embeddings, and recall is
    * bounded only by 8-bit component rounding (≈1.0 in practice, vs
    * PQ's subspace quantization loss) — SQ8 is what you run when PQ
    * recall is not acceptable but raw floats don't fit the I/O budget.
    */
  def sq8TopKBatch(corpus: DataFrame, queryPred: Column, kNN: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val codes = Curation.quantizeInt8(corpus, idCol, vecCol)
      .select(col(idCol), col("codes").cast("array<double>").as("cd"))
    val qVecs = AnnIndex.collectQueryVecs(corpus.where(queryPred),
      idCol, vecCol)
    require(qVecs.nonEmpty, "empty query batch")
    val qcube = typedLit(qVecs.map(_._2))
    val qids = typedLit(qVecs.map(_._1): Seq[Long])
    val exploded = codes.select(col(idCol), col("cd"),
      posexplode(qids).as(Seq("qpos", "qid")))
    val qv = element_at(qcube, col("qpos") + 1)
    val scored = exploded
      .where(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(cosine(qv, col("cd")), 6).as("cosine"))
    topKByCosine(scored, kNN, idCol)
  }

  /** IVF + SQ8 composed ANN — the coarse quantizer routes each query
    * to its `nprobe` nearest inverted lists, and WITHIN the probed
    * lists distance is full-precision-query-vs-int8-codes cosine (the
    * [[sq8TopKBatch]] scoring, whose per-vector scale cancels). The
    * faiss `IVF…,SQ8` index flavor: PQ's candidate-mass bound with
    * SQ8's near-lossless recall — what you run when the I/O budget
    * rules out raw floats but PQ's subspace loss is unacceptable.
    *
    * Scale shape: quantization and list assignment are one zero-
    * shuffle projection over the corpus scan; each code row explodes
    * only into the queries probing ITS list (candidate rows =
    * Σ_q |probed lists of q|, never Q × N); survivors feed the
    * two-phase bounded heaps.
    */
  def ivfSq8TopKBatch(corpus: DataFrame, queryPred: Column, kNN: Int,
      nlist: Int = 10, nprobe: Int = 2, trainIters: Int = 0,
      sampleMode: String = "prefix", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = coarseCentroids(corpus, nlist, trainIters, sampleMode,
      idCol, vecCol)
    val codes = Curation.quantizeInt8(
        corpus.withColumn("ivf_cid",
          element_at(centroidRanking(col(vecCol), cents), 1)
            .getField("cid").cast("long")),
        idCol, vecCol)
      .select(col(idCol), col("ivf_cid"), col("codes").as("cd"))
    val qVecs = AnnIndex.collectQueryVecs(corpus.where(queryPred),
      idCol, vecCol)
    require(qVecs.nonEmpty, "empty query batch")
    val probes = probeSets(qVecs, cents, nprobe)
    sq8ProbeScoreTopK(codes, qVecs, probes, kNN, idCol)
  }

  /** Exact re-ranking REFINEMENT over IVF-PQ (the faiss
    * `IVF…,PQ…,RFlat` two-stage shape, Jégou et al.'s re-ranking): the
    * ADC pass retrieves `rerank` candidates per query from the probed
    * lists, then ONLY those survivors are scored by exact cosine
    * against their raw vectors and the top `kNN` re-ranked. This is
    * how production closes PQ's quantization-loss recall gap without
    * paying the flat-scan cost: the refine step reads `rerank × Q`
    * raw vectors — a query-batch constant — never the corpus.
    *
    * Scale shape: the survivor set (rerank × Q rows of ids) BROADCASTS
    * back onto the corpus scan (one equi-join probe — the corpus is
    * read once more but only the id+vector columns, and only survivor
    * rows leave the scan), exact scoring is the [[bruteForceTopK]]
    * formula against the driver-side query map, and the final top-k
    * runs the same bounded heaps.
    */
  def ivfPqRefineTopKBatch(corpus: DataFrame, queryPred: Column,
      kNN: Int, rerank: Int, nlist: Int = 10, nprobe: Int = 2,
      trainIters: Int = 0, m: Int = 4, k: Int = 16, iters: Int = 2,
      sampleMode: String = "prefix", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(rerank >= kNN, "rerank depth must cover the final top-k")
    val survivors = ivfPqTopKBatch(corpus, queryPred, rerank, nlist,
        nprobe, trainIters, m, k, iters, sampleMode = sampleMode,
        idCol = idCol, vecCol = vecCol)
      .select(col("qid"), col(idCol))
    val qVecs = AnnIndex.collectQueryVecs(corpus.where(queryPred),
      idCol, vecCol)
    exactRefineTopK(corpus, survivors, qVecs, kNN, idCol, vecCol)
  }

  /** The shared exact-re-rank tail: broadcast the (qid, id) survivor
    * set back onto the corpus scan (one equi-join probe), score the
    * full-precision cosine against the driver-side query map, rank on
    * the bounded heaps. ONE implementation behind
    * [[ivfPqRefineTopKBatch]] and [[matryoshkaRefineTopKBatch]].
    */
  private[graft] def exactRefineTopK(corpus: DataFrame, survivors: DataFrame,
      qVecs: Seq[(Long, Seq[Double])], kNN: Int, idCol: String,
      vecCol: String): DataFrame = {
    val qMap = typedLit(qVecs.toMap)
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(survivors), idCol)
      .select(col("qid"), col(idCol),
        round(cosine(element_at(qMap, col("qid")), col(vecCol)), 6)
          .as("cosine"))
    topKByCosine(scored, kNN, idCol)
  }

  /** Matryoshka (MRL) two-stage retrieval (Kusupati et al. 2022):
    * stage 1 searches in the PREFIX-TRUNCATED embedding space (`dims`
    * leading coordinates — a Matryoshka-trained model packs coarse
    * semantics there, so truncated cosine is a cheap, surprisingly
    * faithful ranking at 1/dims the arithmetic and scan bytes), and
    * stage 2 re-ranks the `rerank` survivors by exact full-dimension
    * cosine — the same refine tail as [[ivfPqRefineTopKBatch]].
    *
    * Scale shape: stage 1 is the brute-force explode at truncated
    * width (at 100 TB you'd store the truncated prefix as its own
    * column/index — the scan then reads dims/D of the bytes); stage 2
    * reads rerank × Q raw vectors, a query-batch constant.
    */
  def matryoshkaRefineTopKBatch(corpus: DataFrame, queryPred: Column,
      kNN: Int, rerank: Int, dims: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(rerank >= kNN, "rerank depth must cover the final top-k")
    val qVecs = AnnIndex.collectQueryVecs(corpus.where(queryPred),
      idCol, vecCol)
    require(qVecs.nonEmpty, "empty query batch")
    val qTrunc = typedLit(qVecs.map(_._2.take(dims)))
    val qids = typedLit(qVecs.map(_._1): Seq[Long])
    val scored = corpus
      .select(col(idCol),
        slice(col(vecCol), 1, dims).cast("array<double>").as("tv"))
      .select(col(idCol), col("tv"),
        explode(typedLit(qVecs.indices.toList)).as("qpos"))
      .withColumn("qid", element_at(qids, col("qpos") + 1))
      .where(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(cosine(element_at(qTrunc, col("qpos") + 1), col("tv")), 6)
          .as("cosine"))
    val survivors = topKByCosine(scored, rerank, idCol)
      .select(col("qid"), col(idCol))
    exactRefineTopK(corpus, survivors, qVecs, kNN, idCol, vecCol)
  }

  /** The shared IVF-SQ8 scoring tail: given the per-list int8 codes
    * frame (`idCol`, `ivf_cid`, `cd`), the driver-side query batch and
    * each query's probe set, explode each code row into exactly its
    * probing queries, score the full-precision query against the bare
    * codes (the per-vector SQ8 scale is a positive scalar — it cancels
    * in the cosine), and rank per query on the two-phase bounded
    * heaps. ONE implementation behind [[ivfSq8TopKBatch]] and the
    * persisted [[AnnIndex.queryBatch]] sq8 codec — the same
    * never-drift discipline as [[adcProbeScoreTopK]]. Returns
    * (qid, idCol, cosine, rk), rk ≤ kNN.
    */
  private[ops] def sq8ProbeScoreTopK(codes: DataFrame,
      qVecs: Seq[(Long, Seq[Double])], probes: Seq[(Long, Seq[Long])],
      kNN: Int, idCol: String): DataFrame = {
    val cidToQpos: Map[Long, Seq[Int]] = probes.zipWithIndex
      .flatMap { case ((_, cids), qpos) => cids.map(_ -> qpos) }
      .groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2).sorted }
    val qcube = typedLit(qVecs.map(_._2))
    val qids = typedLit(qVecs.map(_._1): Seq[Long])
    val emptyProbe = typedLit(Seq.empty[Int])
    // ivf_cid cast to long EXPLICITLY (mirror of adcProbeScoreTopK):
    // the persisted AnnIndex path feeds a partition-inferred
    // IntegerType ivf_cid, and the map literal is keyed bigint —
    // relying on ElementAt's implicit coercion works but is fragile
    val exploded = codes
      .select(col(idCol), col("cd").cast("array<double>").as("cdv"),
        explode(coalesce(
          element_at(typedLit(cidToQpos), col("ivf_cid").cast("long")),
          emptyProbe)).as("qpos"))
    val qv = element_at(qcube, col("qpos") + 1)
    val scored = exploded
      .withColumn("qid", element_at(qids, col("qpos") + 1))
      .where(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(cosine(qv, col("cdv")), 6).as("cosine"))
    topKByCosine(scored, kNN, idCol)
  }

  /** OPQ-lite rotation schedule: `t` Givens rotations, each touching
    * one (i, j) coordinate pair with an EXACT-RATIONAL angle — cosine
    * and sine are legs of a Pythagorean triple divided by its
    * hypotenuse, so both are single IEEE divisions any engine computes
    * bit-identically (no libm cos/sin, whose last-ulp behavior differs
    * across engines and would poison the downstream codebook training).
    * Pair, triple, and sign are md5-derived (the [[planeWeights]]
    * discipline), so the schedule is a reproducible constant baked
    * into the plan AND into the generated oracle SQL.
    *
    * This is the cheap end of OPQ (Ge et al., "Optimized Product
    * Quantization", CVPR 2013): a data-independent rotation that mixes
    * coordinates across PQ subspace boundaries before quantization.
    * Full OPQ alternates rotation and codebook training; the rotation
    * here is fixed — what the engine contributes is the COMPOSITION
    * (rotate → train → encode → ADC all inside the engine, one
    * zero-shuffle projection for the rotation), which is the part a
    * 100 TB deployment needs from the platform. Returns
    * (i, j, cos, sin) with 0-based i < j.
    */
  private[graft] def opqSchedule(t: Int,
      dims: Int = 64): Seq[(Int, Int, Double, Double)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(s: String, mod: Int): Int = {
      val d = md.digest(s.getBytes("UTF-8"))
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % mod
    }
    // (a, b, c): primitive Pythagorean triples — cos = a/c, sin = b/c
    val triples = Seq((3.0, 4.0, 5.0), (5.0, 12.0, 13.0),
      (8.0, 15.0, 17.0), (7.0, 24.0, 25.0), (20.0, 21.0, 29.0),
      (9.0, 40.0, 41.0), (12.0, 35.0, 37.0), (28.0, 45.0, 53.0))
    (0 until t).map { r =>
      val i = bucket(s"opq:i:$r", dims)
      val j0 = bucket(s"opq:j:$r", dims)
      val j = if (j0 == i) (i + 1) % dims else j0
      val (a, b, c) = triples(bucket(s"opq:t:$r", triples.size))
      val sign = if (bucket(s"opq:s:$r", 2) == 0) 1.0 else -1.0
      (math.min(i, j), math.max(i, j), a / c, sign * (b / c))
    }
  }

  /** Driver-side mirror of [[opqRotate]] for a single vector — the
    * SAME step-by-step Givens sequence in the same IEEE order, so a
    * query vector rotated here lands bit-identical to a corpus vector
    * rotated by the column projection (the persistent index's
    * encode/probe consistency depends on it).
    */
  private[ops] def opqRotateVec(v: Seq[Double], t: Int,
      dims: Int = 64): Seq[Double] = {
    val a = v.toArray
    opqSchedule(t, dims).foreach { case (i, j, c, s) =>
      val vi = a(i)
      val vj = a(j)
      a(i) = vi * c - vj * s
      a(j) = vi * s + vj * c
    }
    a.toSeq
  }

  /** Apply the [[opqSchedule]] rotation to a vector column — a single
    * zero-shuffle projection. Built by PER-DIMENSION expression
    * accumulation (each Givens step rewrites only its two touched
    * coordinate expressions), not by rebuilding the array per step —
    * so the expression tree grows with touches per dimension (~t/dims
    * expected), never with t × dims, and the whole rotation stays one
    * codegen'd `array(...)` node. The arithmetic per element is the
    * exact step-by-step sequence (`vi·c − vj·s`, `vi·s + vj·c`) the
    * oracle's chained CTEs compute — same IEEE ops in the same order.
    */
  def opqRotate(df: DataFrame, vecCol: String, outCol: String,
      t: Int, dims: Int = 64): DataFrame = {
    val v0 = col(vecCol).cast("array<double>")
    var comp: IndexedSeq[Column] =
      (1 to dims).map(p => element_at(v0, p)).toIndexedSeq
    opqSchedule(t, dims).foreach { case (i, j, c, s) =>
      val vi = comp(i)
      val vj = comp(j)
      comp = comp.updated(i, vi * lit(c) - vj * lit(s))
        .updated(j, vi * lit(s) + vj * lit(c))
    }
    df.withColumn(outCol, array(comp: _*))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * +1 if the first hex digit of md5("p:i") is ≥ 8 else -1. Distinct
    * `table` seeds give independent hash tables. The weights depend
    * only on (table, plane, dim) — CONSTANTS — so they are computed
    * once on the driver and baked into the plan as literal arrays; an
    * external SQL oracle recomputes the identical md5 derivation.
    */
  private[ops] def planeWeights(planes: Int, table: Int, dims: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { p =>
      val seed = if (table == 0) s"$p:" else s"t$table:$p:"
      (1 to dims).map { i =>
        val d = md.digest((seed + i).getBytes("UTF-8"))
        if (((d(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
      }
    }
  }

  /** `planes`-bit signature of a vector: bit p = sign(Σ_i w(p,i)·v_i).
    * One fused zip_with/aggregate per plane against a literal weight
    * vector — zero hashing at runtime, stays in codegen.
    */
  def lshBucket(vecCol: Column, planes: Int, table: Int = 0, dims: Int = 64): Column = {
    val projections = planeWeights(planes, table, dims).map { w =>
      val proj = graft.functions.vec.dotLit(vecCol, w)
      when(proj > 0, lit("1")).otherwise(lit("0"))
    }
    concat(projections: _*)
  }

  /** Multi-table LSH ANN: union of `tables` independent hyperplane
    * tables — candidate recall 1-(1-p)^T instead of p, the standard
    * recall/probe-cost dial. Same bucket equi-join shuffle shape.
    */
  def lshTopKMultiTable(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, tables: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val candidates = (0 until tables).map { t =>
      val bucketed = corpus.withColumn("bucket", lshBucket(col(vecCol), planes, t))
      val qb = queries.withColumn("qbucket", lshBucket(col("qe"), planes, t))
      bucketed.join(broadcast(qb),
          col("bucket") === col("qbucket") && col(idCol) =!= col("qid"))
        .select(col("qid"), col("qe"), col(idCol), col(vecCol))
    }.reduce(_ unionByName _).distinct()
    topKByCosine(
      candidates.withColumn("cosine", round(cosine(col("qe"), col(vecCol)), 6)),
      k, idCol)
  }

  /** Centroid list sorted by (distance asc, cid asc) as ONE projection
    * expression over the broadcast-in-plan centroid literals — no join,
    * no window, no shuffle. Distance is `1 - cosine` (computed on the
    * ROUNDED cosine) so ordering matches an `ORDER BY cosine DESC, cid`
    * oracle exactly, including the -0.0/0.0 collapse.
    */
  private[ops] def centroidRanking(vec: Column, cents: Seq[(Any, Seq[Double])]): Column =
    array_sort(array(cents.map { case (cid, ce) =>
      // dot against the centroid literal is codegen'd; the centroid's
      // own norm is a driver-side constant (same left-to-right fold as
      // the runtime norm, so the double is bit-identical)
      val c = graft.functions.vec.dotLit(vec, ce) /
        (norm(vec) * lit(graft.functions.VecOps.normOf(ce)))
      struct((lit(1.0) - round(c, 6)).as("d"), lit(cid).as("cid"))
    }: _*))

  /** Decimal rounding identical to Spark SQL's `round(x, 6)` on
    * doubles (shortest-decimal-repr BigDecimal, HALF_UP) — the driver-
    * side k-means below must reproduce the engine's rounded cosines
    * bit-for-bit or training diverges from its SQL oracle mirror.
    */
  private[ops] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private[ops] def dotSeq(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private[ops] def cos6(a: Seq[Double], b: Seq[Double]): Double = {
    // zero-norm vectors define cosine as 0.0 — the unguarded quotient
    // is NaN and BigDecimal(NaN) throws, which would crash the whole
    // training loop on one degenerate embedding
    val denom = math.sqrt(dotSeq(a, a)) * math.sqrt(dotSeq(b, b))
    if (denom == 0.0) 0.0 else round6(dotSeq(a, b) / denom)
  }

  /** Lloyd's-trained coarse quantizer: `iters` k-means rounds over the
    * first `maxSample` corpus vectors (by id — an ordered prefix keeps
    * the training set, and therefore the whole quantizer, exactly
    * reproducible by an external SQL oracle; a production build would
    * hash-sample instead, same shape). Each round assigns every sample
    * vector to its nearest centroid by 6-dp-rounded cosine (ties to the
    * smallest centroid id) and re-centers each cluster on the per-
    * dimension mean, rounded to 6 dp — the roundings pin every engine
    * to the same decimals, so assignment boundaries cannot drift
    * between this training loop and the oracle's unrolled iterations.
    * Empty clusters keep their previous centroid.
    *
    * The quantizer is a trained CONSTANT (like any model): the sample
    * is bounded (`maxSample`), the loop is driver-side, and the result
    * is baked into the plan as literals.
    */
  /** Seed + bucket bound for `sampleMode = "hash"` training samples:
    * rows whose md5 bucket (same [0,10000) arithmetic as
    * `Curation.hashBucket`, independent seed) falls under the bound —
    * a 20% uniform sample uncorrelated with ingest order, unlike the
    * id-prefix mode. Public so the SQL oracle pins the same predicate.
    */
  val HashSampleSeed = "qtrain"
  val HashSampleBuckets = 2000L

  /** The bounded training sample, by mode: `"prefix"` takes the first
    * `maxSample` ids (reproducible but biased wherever id correlates
    * with content — ingest order usually does); `"hash"` takes the
    * md5-bucket sample (unbiased, equally reproducible — the bucket is
    * pure arithmetic on the id). Both orderBy id so the collected
    * sample order, and therefore the whole trained constant, is
    * engine-independent.
    */
  private[ops] def trainingSample(corpus: DataFrame, maxSample: Int,
      sampleMode: String, idCol: String): DataFrame = sampleMode match {
    case "prefix" => corpus.orderBy(col(idCol)).limit(maxSample)
    case "hash" => corpus
      .where(graft.ops.Curation.hashBucket(col(idCol), HashSampleSeed)
        < lit(HashSampleBuckets))
      .orderBy(col(idCol)).limit(maxSample)
    case other =>
      throw new IllegalArgumentException(s"unknown sampleMode: $other")
  }

  /** Collect the (id, vector) training sample ONCE — the single
    * corpus pass shared by the coarse and PQ trainers. Composed paths
    * (IVF-PQ in-session and the persisted index) train BOTH quantizers
    * from the same sample; collecting it once per path instead of once
    * per trainer halves the training-time corpus scans (each
    * collection is a TakeOrdered pass over the full corpus — at 100 TB
    * the dominant training cost by far).
    */
  private[ops] def collectTrainingSample(corpus: DataFrame, maxSample: Int,
      sampleMode: String, idCol: String,
      vecCol: String): Seq[(Any, Seq[Double])] =
    trainingSample(corpus, maxSample, sampleMode, idCol)
      .select(col(idCol), col(vecCol)).collect().toSeq
      .map(r => (r.get(0),
        r.getSeq[Any](1).map { case n: Number => n.doubleValue() }))

  def kmeansCentroids(corpus: DataFrame, nlist: Int, iters: Int,
      maxSample: Int = 10000, sampleMode: String = "prefix",
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Any, Seq[Double])] =
    kmeansFrom(collectTrainingSample(corpus, maxSample, sampleMode,
      idCol, vecCol), nlist, iters)

  /** [[kmeansCentroids]]'s Lloyd's core over an already-collected
    * (ordered) training sample — callers holding the sample train both
    * quantizers from one collection. */
  private[ops] def kmeansFrom(sample: Seq[(Any, Seq[Double])], nlist: Int,
      iters: Int): Seq[(Any, Seq[Double])] = {
    val init = sample.take(nlist)
    (0 until iters).foldLeft(init) { (cents, _) =>
      val assigned = sample.map { case (_, v) =>
        // argmax of rounded cosine, tie → first (= smallest cid, since
        // centroids keep the ordered-prefix id order)
        val ci = cents.indices.maxBy(i => (cos6(v, cents(i)._2), -i))
        (ci, v)
      }.groupBy(_._1)
      cents.zipWithIndex.map { case ((cid, old), i) =>
        assigned.get(i) match {
          case Some(members) =>
            val vs = members.map(_._2)
            val dims = vs.head.indices
            (cid, dims.map(d => round6(vs.map(_(d)).sum / vs.size)): Seq[Double])
          case None => (cid, old)
        }
      }
    }
  }

  /** 6-dp-rounded squared L2 distance in the exact expansion form
    * `x·x - 2·x·c + c·c` (all dots sequential folds) — the ONE formula
    * the PQ trainer, the Spark encoding expressions, and the SQL
    * oracle all share, so the three compute identical doubles.
    */
  private[ops] def l2r6(x: Seq[Double], c: Seq[Double]): Double =
    round6(dotSeq(x, x) - 2 * dotSeq(x, c) + dotSeq(c, c))

  /** Product-quantization codebooks: split the vector into `m`
    * subspaces and train an independent `k`-centroid codebook per
    * subspace with the same rounded Lloyd's discipline as
    * [[kmeansCentroids]] (argmin of 6-dp-rounded L2², ties to the
    * smallest centroid id; 6-dp-rounded per-dim means; empty clusters
    * keep their centroid; ordered-prefix training sample). Returns
    * m × k × (dims/m) centroid values — a trained constant.
    *
    * PQ is the vector-compression scale path: a 64-dim float vector
    * (256 bytes) becomes m code bytes + shared codebooks, and
    * approximate distances run off per-subspace lookup tables.
    */
  def pqTrain(corpus: DataFrame, m: Int, k: Int, iters: Int,
      maxSample: Int = 10000, sampleMode: String = "prefix",
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Seq[Double]]] =
    pqTrainFrom(
      collectTrainingSample(corpus, maxSample, sampleMode, idCol, vecCol)
        .map(_._2),
      m, k, iters)

  /** [[pqTrain]]'s Lloyd's core over an already-collected (ordered)
    * training sample — the residual IVF-PQ path trains on driver-side
    * residual vectors that never exist as a corpus column.
    */
  private[ops] def pqTrainFrom(sample: Seq[Seq[Double]], m: Int, k: Int,
      iters: Int): Seq[Seq[Seq[Double]]] = {
    require(sample.nonEmpty, "pqTrain needs a non-empty corpus")
    val dims = sample.head.length
    require(dims % m == 0, s"$dims dims not divisible into $m subspaces")
    val sub = dims / m
    (0 until m).map { s =>
      val xs = sample.map(_.slice(s * sub, s * sub + sub))
      (0 until iters).foldLeft(xs.take(k)) { (cents, _) =>
        val assigned = xs
          .map(x => (cents.indices.minBy(i => (l2r6(x, cents(i)), i)), x))
          .groupBy(_._1)
        cents.zipWithIndex.map { case (old, i) =>
          assigned.get(i) match {
            case Some(members) =>
              val vs = members.map(_._2)
              (0 until sub).map(d => round6(vs.map(_(d)).sum / vs.size)): Seq[Double]
            case None => old
          }
        }
      }
    }
  }

  /** PQ encoding as a pure projection: per subspace, the id of the
    * nearest trained centroid (6-dp-rounded L2², ties to the smallest
    * id) plus the total rounded reconstruction distance. The codebooks
    * are plan literals, so encoding is zero-shuffle and stays in
    * whole-stage codegen — at 100 TB this is a scan-speed re-encode of
    * the embedding store.
    */
  def pqCodes(corpus: DataFrame, m: Int = 4, k: Int = 8, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqCodesWith(corpus,
      pqTrain(corpus, m, k, iters, idCol = idCol, vecCol = vecCol),
      idCol = idCol, vecCol = vecCol)

  /** [[pqCodes]] against pre-trained codebooks — callers that already
    * hold the books (ADC search trains them for its lookup tables)
    * encode without re-running the driver-side training loop. `keep`
    * names extra columns of `corpus` to carry through unchanged (e.g.
    * a coarse-quantizer list id for the IVF-PQ composition).
    */
  def pqCodesWith(corpus: DataFrame, books: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding",
      keep: Seq[String] = Nil): DataFrame = {
    val m = books.length
    val sub = books.head.head.length
    val v = col(vecCol)
    val picks = (0 until m).map { s =>
      val xs = slice(v, s * sub + 1, sub)
      val sorted = array_sort(array(books(s).zipWithIndex.map { case (c, ci) =>
        val d = round(graft.functions.vec.dot(xs, xs)
          - lit(2.0) * graft.functions.vec.dotLit(xs, c)
          + lit(dotSeq(c, c)), 6)
        struct(d.as("d"), lit(ci.toLong).as("cid"))
      }: _*))
      element_at(sorted, 1).as(s"p$s")
    }
    corpus.select(col(idCol) +: keep.map(col) ++: picks: _*)
      .select(col(idCol) +: keep.map(col) ++:
        (0 until m).map(s => col(s"p$s.cid").as(s"code$s")) :+
        round((0 until m).map(s => col(s"p$s.d")).reduce(_ + _), 6)
          .as("recon_err"): _*)
  }

  /** PQ-ADC ANN: asymmetric distance computation over the PQ codes.
    * For each query the m×k table of rounded subspace distances to the
    * trained centroids is precomputed on the driver (tiny — it IS the
    * ADC trick), and every corpus vector's approximate distance is a
    * pure LOOKUP: `Σ_s table[s][code_s]` via `element_at` on literal
    * arrays — no vector arithmetic touches the corpus at query time.
    * Per-query top-k via window rank.
    *
    * Scale shape: the corpus side reads only the m code columns (the
    * compressed store, 16-64× smaller than raw vectors), the scoring
    * is codegen'd constant-array indexing, and the only ordering is
    * the per-query top-k. This is how billion-vector search actually
    * runs; recall is bounded by quantization error, so the exact
    * brute/IVF paths remain the verification tier.
    */
  def pqAdcTopK(corpus: DataFrame, queryIds: Seq[Long], kNN: Int,
      m: Int = 4, k: Int = 8, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val books = pqTrain(corpus, m, k, iters, idCol = idCol, vecCol = vecCol)
    val sub = books.head.head.length
    val codes = pqCodesWith(corpus, books, idCol = idCol, vecCol = vecCol)
    val qVecs: Seq[(Long, Seq[Double])] = corpus
      .where(col(idCol).isin(queryIds: _*))
      .select(col(idCol), col(vecCol)).collect().toSeq
      .map(r => (r.getLong(0),
        r.getSeq[Any](1).map { case n: Number => n.doubleValue() }))
      .sortBy(_._1)
    val perQuery = qVecs.map { case (qid, qv) =>
      val cells = (0 until m).map { s =>
        books(s).map(c => l2r6(qv.slice(s * sub, s * sub + sub), c))
      }
      val dist = round((0 until m).map(s =>
        element_at(array(cells(s).map(lit): _*),
          col(s"code$s").cast("int") + 1)).reduce(_ + _), 6)
      codes.where(col(idCol) =!= qid)
        .select(lit(qid).as("qid"), col(idCol), dist.as("adist"))
    }.reduce(_ unionByName _)
    graft.plans.TopK.topKPerKey(perQuery, Seq("qid"),
        Seq(col("adist").asc, col(idCol).asc), kNN, rankCol = Some("rk"))
      .select(col("qid"), col(idCol), col("adist"), col("rk"))
  }

  /** Batch PQ-ADC: ONE corpus pass for the whole query batch — the
    * shape a training-data pipeline actually runs ("kNN-join the query
    * set against the corpus"), where [[pqAdcTopK]]'s one-scan-per-query
    * union would be a scale-killer.
    *
    * The per-query ADC tables are stacked into a Q × (m·k) lookup cube
    * carried as one plan literal (Q=10⁴ queries at m=4,k=8 is ~2.5 MB —
    * broadcast-register territory, far under executor memory), each
    * codes row `posexplode`s the query-id list — the Q logical
    * (query, candidate) pairs any kNN-join must enumerate, produced by
    * a generator, not by Q plan branches — and the approximate distance
    * is m constant-array `element_at` lookups into the row's cube
    * slice. Per-query top-k runs on [[graft.plans.TopKPerKey]]'s
    * two-phase bounded heaps, so the only shuffle carries
    * ≤ partitions · Q · kNN survivor rows, never the Q × N score
    * matrix. Plan size, scan count, and shuffle volume are all
    * independent of Q; queries beyond literal-cube size would swap the
    * literal for a broadcast (qid, table) dimension with the corpus
    * side unchanged.
    *
    * Queries are selected by `queryPred` over the corpus itself
    * (bounded batch, collected once to build the cube).
    */
  def pqAdcTopKBatch(corpus: DataFrame, queryPred: Column, kNN: Int,
      m: Int = 4, k: Int = 8, iters: Int = 2,
      maxSample: Int = 10000, sampleMode: String = "prefix",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val books = pqTrain(corpus, m, k, iters, maxSample, sampleMode,
      idCol = idCol, vecCol = vecCol)
    val sub = books.head.head.length
    val codes = pqCodesWith(corpus, books, idCol = idCol, vecCol = vecCol)
    val qVecs: Seq[(Long, Seq[Double])] = corpus
      .where(queryPred)
      .select(col(idCol), col(vecCol)).collect().toSeq
      .map(r => (r.getLong(0),
        r.getSeq[Any](1).map { case n: Number => n.doubleValue() }))
      .sortBy(_._1)
    require(qVecs.nonEmpty, "empty query batch")
    // ONE literal node each (typedLit), not Q·m·k nested lit() calls:
    // at production geometry (k=256, m=8) the per-cell form would put
    // ~Q·2048 expression nodes in the plan and analysis would dominate
    // the query — a single nested-ArrayData literal keeps plan size
    // independent of the cube's volume
    val cubeVals: Seq[Seq[Double]] = qVecs.map { case (_, qv) =>
      (0 until m).flatMap(s =>
        books(s).map(c => l2r6(qv.slice(s * sub, s * sub + sub), c))).toSeq
    }
    val cube = typedLit(cubeVals)
    val qids = typedLit(qVecs.map(_._1): Seq[Long])
    val exploded = codes.select(
      col(idCol) +: (0 until m).map(s => col(s"code$s")) :+
        posexplode(qids).as(Seq("qpos", "qid")): _*)
    val qtab = element_at(cube, col("qpos") + 1)
    val dist = round((0 until m).map(s =>
      element_at(qtab, lit(s * k) + col(s"code$s").cast("int") + 1))
      .reduce(_ + _), 6)
    val scored = exploded
      .where(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol), dist.as("adist"))
    // rank comes from the final heap pass itself (rankCol) — the heap
    // already ordered each key's survivors, so no Window operator
    // appears anywhere in this plan
    graft.plans.TopK.topKPerKey(scored, Seq("qid"),
        Seq(col("adist").asc, col(idCol).asc), kNN, rankCol = Some("rk"))
      .select(col("qid"), col(idCol), col("adist"), col("rk"))
  }

  /** IVF-PQ composed ANN — the production stack: the coarse quantizer
    * routes each query to its `nprobe` nearest inverted lists, and
    * WITHIN the probed lists distance is the PQ-ADC lookup against the
    * trained codebooks (non-residual flavor: codes quantize the raw
    * vectors, as in the classical IVFADC variant without residual
    * encoding — both quantizers train exactly as their standalone
    * gated counterparts, so the oracle reuses both CTE chains).
    *
    * Scale shape: ONE codes scan; each row expands only to the queries
    * probing ITS list (an `explode` over a literal cid→query-positions
    * map — candidate rows = Σ_q |probed lists of q|, the defining
    * IVF-PQ candidate mass, not Q × N), the approximate distance is m
    * constant-array lookups, and per-query top-k runs on the two-phase
    * bounded heaps. Corpus vectors never shuffle; only (qid, id,
    * adist) survivors do.
    *
    * Recall relative to flat ADC is bounded by the probe: a true
    * neighbor living in an unprobed list is lost (the IVF trade), so
    * the bench reports this path's recall NEXT TO the flat-ADC canary
    * at the same PQ geometry — the gap IS the probe cost, and it
    * shrinks as nprobe→nlist.
    */
  /** Per-query probe sets, ranked by the same 6-dp-rounded cosine
    * (ties to the smaller cid) as `centroidRanking` — computed on the
    * driver like every other trained constant, nlist × Q cells. ONE
    * implementation shared by the in-session IVF-PQ paths and the
    * persisted [[AnnIndex.queryBatch]] so the probe ranking can never
    * drift between them.
    */
  private[ops] def probeSets(qVecs: Seq[(Long, Seq[Double])],
      cents: Seq[(Any, Seq[Double])], nprobe: Int): Seq[(Long, Seq[Long])] =
    qVecs.map { case (qid, qv) =>
      qid -> cents.map { case (cid, ce) =>
          (1.0 - cos6(qv, ce), cid.asInstanceOf[Number].longValue())
        }.sorted.take(nprobe).map(_._2)
    }

  /** The shared IVF-ADC scoring tail: given the per-list codes frame
    * (`idCol`, `ivf_cid`, `code0..code{m-1}`), the driver-side query
    * batch, each query's probe set, and the frozen quantizer
    * constants, build the literal lookup cube — one table per query,
    * or per (query, probed list) when `residual` (the query residual
    * differs per list: classical IVFADC bookkeeping) — explode each
    * code row into exactly its probing queries, sum the m
    * constant-array lookups, and rank per query on the two-phase
    * bounded heaps. Returns (qid, idCol, adist, rk), rk ≤ kNN.
    *
    * ONE implementation behind [[ivfPqTopKBatch]],
    * [[ivfPqResidualTopKBatch]], and the persisted
    * [[AnnIndex.queryBatch]]: the ADC plan (cube keying, explode
    * shape, rounding, tie order) is the part of these paths that must
    * never drift — the persisted index's whole correctness contract
    * is bit-equality with the in-session build.
    */
  private[ops] def adcProbeScoreTopK(codes: DataFrame,
      qVecs: Seq[(Long, Seq[Double])], probes: Seq[(Long, Seq[Long])],
      books: Seq[Seq[Seq[Double]]], centOf: Map[Long, Seq[Double]],
      residual: Boolean, kNN: Int, idCol: String): DataFrame = {
    val m = books.length
    val k = books.head.length
    val sub = books.head.head.length
    // invert to cid -> positions of the queries probing that list; a
    // codes row explodes into exactly its probing queries
    val cidToQpos: Map[Long, Seq[Int]] = probes.zipWithIndex
      .flatMap { case ((_, cids), qpos) => cids.map(_ -> qpos) }
      .groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2).sorted }
    val qids = typedLit(qVecs.map(_._1): Seq[Long])
    val emptyProbe = typedLit(Seq.empty[Int])
    val exploded = codes.select(
      col(idCol) +: col("ivf_cid").cast("long").as("ivf_cid") +:
        (0 until m).map(s => col(s"code$s")) :+
        explode(coalesce(
          element_at(typedLit(cidToQpos), col("ivf_cid").cast("long")),
          emptyProbe)).as("qpos"): _*)
    val qtab =
      if (residual) {
        // per-(query, probed list) tables, keyed "qpos:cid" —
        // Q × nprobe × m × k cells, still a bounded driver constant
        val cube: Map[String, Seq[Double]] = probes.zipWithIndex.flatMap {
          case ((_, cids), qpos) =>
            val qv = qVecs(qpos)._2
            cids.map { cid =>
              val c = centOf(cid)
              val qr = qv.indices.map(i => qv(i) - c(i))
              s"$qpos:$cid" -> (0 until m).flatMap(s =>
                books(s).map(b => l2r6(qr.slice(s * sub, s * sub + sub), b)))
                .toSeq
            }
        }.toMap
        element_at(typedLit(cube),
          concat(col("qpos").cast("string"), lit(":"),
            col("ivf_cid").cast("string")))
      } else {
        val cubeVals: Seq[Seq[Double]] = qVecs.map { case (_, qv) =>
          (0 until m).flatMap(s =>
            books(s).map(c => l2r6(qv.slice(s * sub, s * sub + sub), c)))
            .toSeq
        }
        element_at(typedLit(cubeVals), col("qpos") + 1)
      }
    val dist = round((0 until m).map(s =>
      element_at(qtab, lit(s * k) + col(s"code$s").cast("int") + 1))
      .reduce(_ + _), 6)
    val scored = exploded
      .withColumn("qid", element_at(qids, col("qpos") + 1))
      .where(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol), dist.as("adist"))
    graft.plans.TopK.topKPerKey(scored, Seq("qid"),
        Seq(col("adist").asc, col(idCol).asc), kNN, rankCol = Some("rk"))
      .select(col("qid"), col(idCol), col("adist"), col("rk"))
  }

  def ivfPqTopKBatch(corpus: DataFrame, queryPred: Column, kNN: Int,
      nlist: Int = 10, nprobe: Int = 2, trainIters: Int = 0,
      m: Int = 4, k: Int = 8, iters: Int = 2,
      maxSample: Int = 10000, sampleMode: String = "prefix",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // ONE training-sample collection feeds both quantizers (see
    // collectTrainingSample) — identical sample rows, identical
    // Lloyd's loops, one fewer full-corpus TakeOrdered pass. (The
    // "identical" claim is vs the default maxSample: the pre-r18 form
    // trained coarse centroids on the 10000 default regardless of the
    // caller's maxSample; forwarding it is the CONTRACT now — it
    // aligns in-session training with AnnIndex, which always
    // forwarded maxSample.) The trainIters == 0 fallback keeps
    // coarseCentroids' corpus-prefix semantics (which differ from the
    // sample prefix under "hash").
    val sample = collectTrainingSample(corpus, maxSample, sampleMode,
      idCol, vecCol)
    val cents =
      if (trainIters > 0) kmeansFrom(sample, nlist, trainIters)
      else coarseCentroids(corpus, nlist, 0, sampleMode, idCol, vecCol)
    val books = pqTrainFrom(sample.map(_._2), m, k, iters)
    // nearest coarse centroid per corpus vector: shuffle-free
    // projection (same expression as ivfTopK), carried through the
    // code projection
    val assigned = corpus.withColumn("ivf_cid",
      element_at(centroidRanking(col(vecCol), cents), 1).getField("cid"))
    val codes = pqCodesWith(assigned, books, idCol = idCol, vecCol = vecCol,
      keep = Seq("ivf_cid"))
    val qVecs = AnnIndex.collectQueryVecs(corpus.where(queryPred),
      idCol, vecCol)
    require(qVecs.nonEmpty, "empty query batch")
    adcProbeScoreTopK(codes, qVecs, probeSets(qVecs, cents, nprobe),
      books, centOf = Map.empty, residual = false, kNN, idCol)
  }

  /** RESIDUAL IVF-PQ (classical IVFADC, Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the PQ
    * codebooks quantize the RESIDUAL `x − centroid(list(x))` instead
    * of the raw vector — residuals concentrate near the origin, so the
    * same m×k codebook budget spends its centroids on a much smaller
    * cell of the space and quantization error drops; this is the
    * variant production vector stores actually run. Differences from
    * [[ivfPqTopKBatch]] (everything else is shared shape):
    *
    *  - PQ training runs on the residuals of the training sample
    *    (driver-side: same rounded-cosine assignment as the engine's
    *    projection, then elementwise subtraction — IEEE doubles, so an
    *    external engine reproduces them bit-for-bit);
    *  - corpus encoding subtracts each row's OWN list centroid (a
    *    `zip_with` against a cid→centroid map literal — still a pure
    *    zero-shuffle projection) before the code assignment;
    *  - the ADC tables are PER (query, probed list): the query's
    *    residual differs per list, so the lookup cube is keyed by
    *    (query position, list id) — nprobe tables per query instead of
    *    one, the classical IVFADC bookkeeping. Still a bounded driver
    *    constant: Q × nprobe × m × k cells.
    */
  def ivfPqResidualTopKBatch(corpus: DataFrame, queryPred: Column, kNN: Int,
      nlist: Int = 10, nprobe: Int = 2, trainIters: Int = 0,
      m: Int = 4, k: Int = 8, iters: Int = 2,
      maxSample: Int = 10000, sampleMode: String = "prefix",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // ONE training-sample collection feeds the coarse trainer AND the
    // residual PQ books (see collectTrainingSample) — one fewer
    // full-corpus TakeOrdered pass, identical math.
    val fullSample = collectTrainingSample(corpus, maxSample, sampleMode,
      idCol, vecCol)
    val cents =
      if (trainIters > 0) kmeansFrom(fullSample, nlist, trainIters)
      else coarseCentroids(corpus, nlist, 0, sampleMode, idCol, vecCol)
    val centOf: Map[Long, Seq[Double]] = cents.map { case (cid, ce) =>
      cid.asInstanceOf[Number].longValue() -> ce
    }.toMap
    def nearestCid(x: Seq[Double]): Long = cents.map { case (cid, ce) =>
      (1.0 - cos6(x, ce), cid.asInstanceOf[Number].longValue())
    }.min._2
    def residOf(x: Seq[Double]): Seq[Double] = {
      val c = centOf(nearestCid(x))
      x.indices.map(i => x(i) - c(i))
    }
    // PQ books trained on the SAMPLE's residuals (assignment by the
    // same rounded-cosine ranking the engine projection uses)
    val sample: Seq[Seq[Double]] = fullSample.map(_._2)
    val books = pqTrainFrom(sample.map(residOf), m, k, iters)
    // engine-side residual: x − centroid(ivf_cid), elementwise — a
    // zip_with against the cid→centroid map literal, zero shuffle
    val centMap = typedLit(centOf)
    val assigned = corpus
      .withColumn("ivf_cid",
        element_at(centroidRanking(col(vecCol), cents), 1).getField("cid")
          .cast("long"))
      .withColumn("rv", zip_with(col(vecCol).cast("array<double>"),
        element_at(centMap, col("ivf_cid")), (a, b) => a - b))
    val codes = pqCodesWith(assigned, books, idCol = idCol, vecCol = "rv",
      keep = Seq("ivf_cid"))
    val qVecs = AnnIndex.collectQueryVecs(corpus.where(queryPred),
      idCol, vecCol)
    require(qVecs.nonEmpty, "empty query batch")
    adcProbeScoreTopK(codes, qVecs, probeSets(qVecs, cents, nprobe),
      books, centOf, residual = true, kNN, idCol)
  }

  /** IVF-style ANN: assign every vector to its nearest of `nlist`
    * coarse centroids, then score queries only against the `nprobe`
    * closest inverted lists. With `trainIters` = 0 the centroids are
    * the first `nlist` corpus vectors (deterministic seed); with
    * `trainIters` > 0 they are k-means-refined from that seed via
    * `kmeansCentroids` — the real quantizer a curation pipeline needs,
    * or recall collapses on clustered embeddings.
    *
    * Scale shape: the coarse centroids are a driver-side constant (like
    * any trained quantizer), so nearest-centroid assignment is a pure
    * PROJECTION over the corpus scan — zero shuffle, stays inside
    * whole-stage codegen. The probe is a bucket equi-join on list id —
    * at 100 TB the inverted lists are the only shuffle key.
    */
  /** The trained (or seeded) coarse quantizer both IVF entry points
    * share — nlist is small by construction: collecting it to the
    * driver is the IVF contract, not a scale hazard.
    */
  private[ops] def coarseCentroids(corpus: DataFrame, nlist: Int,
      trainIters: Int, sampleMode: String, idCol: String,
      vecCol: String, maxSample: Int = 10000): Seq[(Any, Seq[Double])] =
    if (trainIters > 0) kmeansCentroids(corpus, nlist, trainIters,
      maxSample, sampleMode = sampleMode, idCol = idCol, vecCol = vecCol)
    else corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol), col(vecCol)).collect().toSeq
      .map(r => (r.get(0),
        // element type is whatever the embedding column holds
        // (float or double) — don't assume
        r.getSeq[Any](1).map { case n: Number => n.doubleValue() }))

  /** Inverted-list size per coarse centroid, `(cid, n)` — the balance
    * diagnostic for [[ivfTopK]]: probe cost is proportional to the
    * probed lists' sizes, so a skewed assignment (one giant list) is
    * what turns the linear probe-join super-linear long before recall
    * moves. Same training, same assignment projection as the search
    * path.
    */
  def ivfListSizes(corpus: DataFrame, nlist: Int = 10, trainIters: Int = 0,
      sampleMode: String = "prefix",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = coarseCentroids(corpus, nlist, trainIters, sampleMode,
      idCol, vecCol)
    corpus
      .withColumn("cid",
        element_at(centroidRanking(col(vecCol), cents), 1).getField("cid"))
      .groupBy(col("cid")).agg(count(lit(1)).as("n"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 10, nprobe: Int = 2, trainIters: Int = 0,
      sampleMode: String = "prefix",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = coarseCentroids(corpus, nlist, trainIters, sampleMode,
      idCol, vecCol)
    // nearest centroid per corpus vector: shuffle-free projection
    val assigned = corpus.withColumn("cid",
      element_at(centroidRanking(col(vecCol), cents), 1).getField("cid"))
    // nprobe nearest centroids per query: same projection + explode
    val probes = queries
      .withColumn("c",
        explode(slice(centroidRanking(col("qe"), cents), 1, nprobe)))
      .select(col("qid"), col("qe"), col("c.cid").as("cid"))
    topKByCosine(
      assigned.join(broadcast(probes), Seq("cid"))
        .where(col(idCol) =!= col("qid"))
        .withColumn("cosine", round(cosine(col("qe"), col(vecCol)), 6)),
      k, idCol)
  }

  /** Embedding near-duplicate pairs: all (a < b) pairs with cosine ≥
    * threshold, discovered through banded multi-table LSH and verified
    * with the exact cosine. The scale path for "drop semantically
    * duplicate documents by their embeddings".
    *
    * Scale shape: `planes` bits per signature (default 16 → 65,536
    * buckets PER TABLE, growing with the corpus — not a constant-64
    * all-pairs trap), `tables` independent tables for recall
    * (1-(1-p^planes)^T), and buckets larger than `maxBucket` dropped
    * entirely — an over-dense bucket is an uninformative region of the
    * sphere and quadratic to expand, the embedding analogue of
    * stop-shingle removal. Candidate dedup shuffles (a, b) ids only;
    * vectors are re-joined for the exact verify.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double, planes: Int = 16,
      tables: Int = 3, maxBucket: Int = 1000,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val candidates = (0 until tables).map { t =>
      // each table's bucketing feeds the size filter and both join
      // sides — materialize the signatures once per table
      // (localCheckpoint: blocks are GC-reclaimed, unlike persist)
      val bucketed = corpus.select(
          col(idCol).as("id"), lshBucket(col(vecCol), planes, t).as("bucket"))
        .localCheckpoint()
      val smallBuckets = bucketed.groupBy(col("bucket"))
        .agg(count(lit(1)).as("bsz"))
        .where(col("bsz") <= maxBucket)
        .select("bucket")
      val pruned = bucketed.join(smallBuckets, "bucket")
      pruned.select(col("bucket"), col("id").as("a"))
        .join(pruned.select(col("bucket"), col("id").as("b")), "bucket")
        .where(col("a") < col("b"))
        .select(col("a"), col("b"))
    }.reduce(_ unionByName _).distinct()
    val va = corpus.select(col(idCol).as("a"), col(vecCol).as("va"))
    val vb = corpus.select(col(idCol).as("b"), col(vecCol).as("vb"))
    candidates.join(va, "a").join(vb, "b")
      .withColumn("cosine", round(cosine(col("va"), col("vb")), 6))
      .where(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }

  /** LSH-bucketed ANN: score only same-bucket pairs, then top-k.
    * Recall < 1 by construction; increase recall with fewer planes or
    * multiple tables (union of signatures with different seeds).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = corpus.withColumn("bucket", lshBucket(col(vecCol), planes))
    val qb = queries.withColumn("qbucket", lshBucket(col("qe"), planes))
    topKByCosine(
      bucketed.join(broadcast(qb),
          col("bucket") === col("qbucket") && col(idCol) =!= col("qid"))
        .withColumn("cosine", round(cosine(col("qe"), col(vecCol)), 6)),
      k, idCol)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al.,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): cluster the corpus with the
    * shared k-means coarse quantizer, then compare each vector only
    * against its OWN cluster's `maxAnchors` earliest members — a
    * vector is a semantic duplicate iff some smaller-id anchor in its
    * cluster has rounded cosine >= `threshold` ("keep the first
    * occurrence", the same deterministic survivor rule as exact
    * dedup). Anchors themselves can be duplicates of earlier anchors.
    *
    * vs [[cosineNearDupPairs]]: LSH banding prunes by random
    * projection (pairs can straddle buckets, recall < 1 by chance);
    * the partition here is the data's own learned cluster structure,
    * and the output is the per-vector keep/drop verdict a curation
    * pipeline applies, not a pair list.
    *
    * Scale shape: centroids are a trained driver-side constant
    * (bounded sample, [[kmeansCentroids]]); assignment is a zero-
    * shuffle codegen'd projection; the anchor set is `nlist ×
    * maxAnchors` rows selected by the bounded-heap
    * [[graft.plans.TopK.topKPerKey]] pass and BROADCAST back — the corpus
    * itself is never shuffled, and total comparison work is
    * <= n × maxAnchors dots regardless of cluster skew. The anchor cap
    * is the documented approximation (a duplicate of a non-anchor
    * survivor survives); at 100 TB `nlist` grows with the corpus so
    * clusters — and the cap's bite — stay bounded.
    *
    * Output: (id, cid, is_dup) — one row per input vector.
    */
  def semanticDedup(corpus: DataFrame, threshold: Double,
      nlist: Int = 10, trainIters: Int = 3, maxAnchors: Int = 25,
      sampleMode: String = "prefix",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    require(maxAnchors >= 1, "maxAnchors >= 1")
    val cents = coarseCentroids(corpus, nlist, trainIters, sampleMode,
      idCol, vecCol)
    val assigned = corpus.select(col(idCol), col(vecCol))
      .withColumn("cid",
        element_at(centroidRanking(col(vecCol), cents), 1).getField("cid"))
    val anchors = graft.plans.TopK.topKPerKey(
        assigned, Seq("cid"), Seq(col(idCol).asc), maxAnchors)
      .select(col("cid").as("a_cid"), col(idCol).as("a_id"),
        col(vecCol).as("a_vec"))
    // semi + anti against the broadcast anchors, then union: the dup
    // verdict costs two broadcast-join passes over the corpus and ZERO
    // shuffles of it (the dup set is O(n) — re-joining it back on id
    // would shuffle the whole corpus just to attach a boolean)
    val cond = col("cid") === col("a_cid") && col("a_id") < col(idCol) &&
      round(cosine(col(vecCol), col("a_vec")), 6) >= threshold
    val dup = assigned.join(broadcast(anchors), cond, "left_semi")
      .withColumn("is_dup", lit(true))
    val kept = assigned.join(broadcast(anchors), cond, "left_anti")
      .withColumn("is_dup", lit(false))
    dup.unionByName(kept).select(col(idCol), col("cid"), col("is_dup"))
  }

  /** Per-group mean embeddings, flattened: (group, i, v) with `v` the
    * average of dimension `i` over the group's vectors. The element-
    * wise aggregation is one posexplode (linear in corpus × dim) into
    * a map-side-combined groupBy on (group, i) — output is
    * |groups| × dims rows regardless of corpus size, the shape that
    * holds at 100 TB.
    */
  def groupCentroidsFlat(df: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame =
    df.select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy(col("grp"), col("i"))
      .agg(avg(col("v").cast("double")).as("v"))

  /** Pairwise cosine similarity between per-group centroid embeddings —
    * the corpus-composition map (which sources/languages/domains live
    * in the same region of embedding space) that drives mixing
    * decisions like [[Curation.temperatureMix]]. Works on the
    * flattened centroids: a self-join on dimension index i
    * (|groups|² × dims rows — independent of corpus size; 20 sources ×
    * 64 dims is 25 600 rows) then one aggregation per ordered pair.
    * Cosine is rounded to 4 dp: centroid sums are float
    * aggregations whose addition order differs per engine/partition
    * layout, so low decimals carry partition noise, not signal.
    */
  def groupCentroidCosine(df: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame = {
    val cents = groupCentroidsFlat(df, groupCol, vecCol)
    val a = cents.select(col("grp").as("ga"), col("i"), col("v").as("va"))
    val b = cents.select(col("grp").as("gb"), col("i"), col("v").as("vb"))
    a.join(b, "i")
      .where(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(round(sum(col("va") * col("vb")) /
        (sqrt(sum(col("va") * col("va"))) * sqrt(sum(col("vb") * col("vb")))),
        4).as("cosine"))
  }

  /** Binary-quantization ANN — the 1-bit tier BELOW SQ8 (pgvector
    * `bit`, Milvus BINARY, the sign baseline RaBitQ refines): each
    * dimension collapses to its sign bit (v > 0), packed 64 dims per
    * long word, and candidate retrieval ranks by HAMMING distance —
    * one xor + popcount per word, pure integer ALU. Exact cosine
    * re-ranks the `rerank` survivors through the shared
    * [[exactRefineTopK]] tail (the same RFlat discipline as IVF-PQ
    * refine), closing the quantization recall gap at a rerank×Q cost.
    *
    * Scale shape: packing is one codegen'd projection (zero shuffle,
    * 1 bit/dim — a 64-dim vector is ONE long, 1/32nd of float32 scan
    * bytes, the cheapest corpus-sized scan any tier here has); the
    * Hamming pass explodes each code row into the Q query positions
    * and survivors feed the two-phase bounded heaps; refine reads
    * rerank × Q raw vectors — a query-batch constant, never a corpus
    * term. Hamming ties are dense at 1 bit/dim, so the heap order
    * tie-breaks on the id and the oracle mirrors it with the same
    * (hamming, id) window order.
    */
  def binaryHammingRefineTopKBatch(corpus: DataFrame, queryPred: Column,
      kNN: Int, rerank: Int, dims: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(rerank >= kNN, "rerank depth must cover the final top-k")
    val words = (dims + 63) / 64
    val codes = corpus.select(col(idCol),
      packSignBitsCol(col(vecCol), words).as("code"))
    val qVecs = AnnIndex.collectQueryVecs(corpus.where(queryPred),
      idCol, vecCol)
    require(qVecs.nonEmpty, "empty query batch")
    val qcube = typedLit(qVecs.map(q => packSignBits(q._2, words)))
    val qids = typedLit(qVecs.map(_._1): Seq[Long])
    val exploded = codes.select(col(idCol), col("code"),
      posexplode(qids).as(Seq("qpos", "qid")))
    val qc = element_at(qcube, col("qpos") + 1)
    val survivors = graft.plans.TopK.topKPerKey(
        exploded.where(col(idCol) =!= col("qid"))
          .select(col("qid"), col(idCol),
            hammingWords(col("code"), qc, words).as("hamming")),
        Seq("qid"), Seq(col("hamming").asc, col(idCol).asc), rerank)
      .select(col("qid"), col(idCol))
    exactRefineTopK(corpus, survivors, qVecs, kNN, idCol, vecCol)
  }

  /** ONE Hamming expression behind the flat scan and the persisted-
    * index probe ([[bqProbeScoreTopK]]): Σ_w popcount(code_w ^
    * qcode_w) — pure integer ALU, stays in codegen.
    */
  private def hammingWords(code: Column, qc: Column, words: Int): Column =
    (0 until words).map { w =>
      bit_count(element_at(code, w + 1)
        .bitwiseXOR(element_at(qc, w + 1))).cast("long")
    }.reduce(_ + _)

  /** Engine-side sign-bit packing: ONE codegen'd projection, per-word
    * left-to-right fold with the first element in the word's HIGH bit
    * (acc<<1 | bit) — [[packSignBits]] replays the identical fold for
    * driver-side query codes. Shared by the flat scan
    * ([[binaryHammingRefineTopKBatch]]) and the persisted index's bq
    * encode (AnnIndex) — the never-drift discipline every codec here
    * follows.
    */
  private[graft] def packSignBitsCol(vec: Column, words: Int): Column =
    array((0 until words).map { w =>
      aggregate(slice(vec, w * 64 + 1, 64), lit(0L),
        (acc, x) => shiftleft(acc, 1) +
          when(x > lit(0.0f), lit(1L)).otherwise(lit(0L)))
    }: _*)

  /** Driver-side mirror of the engine's sign-bit packing fold. */
  private[ops] def packSignBits(v: Seq[Double], words: Int): Seq[Long] =
    (0 until words).map { w =>
      v.slice(w * 64, w * 64 + 64)
        .foldLeft(0L)((acc, x) => (acc << 1) | (if (x > 0.0) 1L else 0L))
    }

  /** Probed-list Hamming top-k — the binary-quantization counterpart
    * of [[sq8ProbeScoreTopK]]/[[adcProbeScoreTopK]], shared by the
    * persisted index's bq codec: each probed code row explodes only
    * into the queries probing ITS list, distance is the shared
    * [[hammingWords]] popcount, survivors rank on the bounded heaps
    * by (hamming asc, id asc). Returns (qid, idCol, hamming, rk).
    */
  private[graft] def bqProbeScoreTopK(codes: DataFrame,
      qPacked: Seq[(Long, Seq[Long])], probes: Seq[(Long, Seq[Long])],
      kNN: Int, idCol: String, words: Int): DataFrame = {
    val cidToQpos: Map[Long, Seq[Int]] = probes.zipWithIndex
      .flatMap { case ((_, cids), qpos) => cids.map(_ -> qpos) }
      .groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2).sorted }
    val qcube = typedLit(qPacked.map(_._2))
    val qids = typedLit(qPacked.map(_._1): Seq[Long])
    val exploded = codes
      .select(col(idCol), col("code"),
        explode(coalesce(
          element_at(typedLit(cidToQpos), col("ivf_cid").cast("long")),
          typedLit(Seq.empty[Int]))).as("qpos"))
    val qc = element_at(qcube, col("qpos") + 1)
    val scored = exploded
      .withColumn("qid", element_at(qids, col("qpos") + 1))
      .where(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        hammingWords(col("code"), qc, words).as("hamming"))
    graft.plans.TopK.topKPerKey(scored, Seq("qid"),
        Seq(col("hamming").asc, col(idCol).asc), kNN,
        rankCol = Some("rk"))
      .select(col("qid"), col(idCol), col("hamming"), col("rk"))
  }
}
