package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical relevance ranking: BM25 (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework") over whole-token term
  * frequencies — the standard keyword-retrieval score a curation
  * pipeline uses to pull topical subsets out of a web corpus.
  *
  * Shape at scale: term frequencies are computed per document as a
  * fixed set of codegen'd column expressions (one per query term — the
  * query is small by definition), so the corpus is read once with NO
  * explode and NO (doc, term) shuffle. Global statistics (N, Σdl, per-
  * term document frequencies) reduce to a single row that re-enters
  * the plan via a broadcast cross join. The only ordering is the final
  * top-k, which Spark executes as TakeOrderedAndProject (per-partition
  * heaps, no global sort).
  *
  * Determinism: tf, N, df, Σdl are exact integers; the score arithmetic
  * is a fixed left-to-right double expression, identical on any engine;
  * ranks tie-break on the id.
  */
object Ranking {

  /** BM25 top-k: returns (id, score, rk) for the `topK` highest-scoring
    * documents against `terms`.
    *
    * idf = ln(1 + (N - df + 0.5) / (df + 0.5))   [the "+1" variant that
    * keeps scores positive for df > N/2]
    * score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 - b + b·dl/avgdl))
    */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val t = col(textCol)
    val tfCols = terms.indices.map(i =>
      TextAnalysis.tokenOccurrences(t, terms(i)).as(s"tf$i"))
    // the corpus TEXT is scanned once: the narrow (id, dl, tf*) projection
    // is materialized here and reused by both the stats aggregation and
    // the scoring pass (localCheckpoint: blocks GC-reclaimed, no lineage)
    val base = df.select(col(idCol) +: TextAnalysis.tokenCount(t).as("dl") +: tfCols: _*)
      .localCheckpoint()

    val statAggs = count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)

    val scored = base.crossJoin(broadcast(stats))
      .select(col(idCol),
        round(bm25ScoreCol(terms.size, k1, b), 6).as("score"))
    rankTopK(scored, idCol, topK)
  }

  /** The ONE BM25 score expression — shared verbatim by the corpus-scan
    * path above and the persisted-index path ([[Bm25Store.scoreQuery]]),
    * so both produce bit-identical doubles: the inputs (tf*, df*, dl,
    * n_docs, sum_dl) are exact integers and the arithmetic is one fixed
    * left-to-right expression tree. A fork here would be an opaque
    * oracle hash mismatch, never a visible diff. Expects columns
    * `tf0..tf{n-1}`, `df0..df{n-1}`, `dl`, `n_docs`, `sum_dl` in scope.
    */
  private[ops] def bm25ScoreCol(nTerms: Int, k1: Double, b: Double): Column = {
    val n = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / n
    (0 until nTerms).map { i =>
      val tf = col(s"tf$i").cast("double")
      val dfi = col(s"df$i").cast("double")
      val idf = log(lit(1.0) + (n - dfi + 0.5) / (dfi + 0.5))
      idf * tf * lit(k1 + 1) /
        (tf + lit(k1) * (lit(1.0) - b + lit(b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
  }

  /** Top-k by (score desc, id) + rank — TakeOrderedAndProject for the
    * limit (per-partition heaps), then row_number over the k survivors
    * only (the window's single partition is the already-reduced top-k,
    * not the corpus). Shared by both BM25 serving paths.
    */
  private[ops] def rankTopK(scored: DataFrame, idCol: String,
      topK: Int): DataFrame =
    scored.orderBy(col("score").desc, col(idCol))
      .limit(topK)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col(idCol))).cast("long"))

  /** Per-document top-k TF-IDF terms — keyword extraction over the
    * whole corpus (the per-doc counterpart of [[bm25TopK]]'s fixed
    * query): tf from one token explode + (id, term) count, idf from
    * the vocab-bounded document-frequency aggregation, and the top-k
    * selection runs on the custom bounded-heap `TopK.topKPerKey`
    * physical operator — one hash shuffle on the doc id, NO per-doc
    * sort, NO corpus-wide window. Unsmoothed idf = ln(N / df) — no
    * +1 smoothing needed, since df ≥ 1 always holds when terms come
    * from the corpus itself.
    *
    * Determinism: tf/df/N are exact; the tfidf product is one
    * multiply, rounded to 6 dp; ties break on the term string.
    * Output: (id, term, tfidf, rk), rk ≤ topK.
    */
  /** Reciprocal-rank fusion (Cormack et al. 2009) of two ranked
    * retrieval lists — the standard hybrid-search combiner: each doc's
    * fused score is Σ_arms 1/(k + rank_arm), summed over the arms that
    * retrieved it (the union, not the intersection — a doc one arm
    * missed still competes on its other rank). k=60 is the published
    * default; rank-based fusion needs no score normalization across
    * arms, which is the whole point (BM25 scores and cosines are not
    * comparable).
    *
    * Engine portability: 1/(k + rank) is one correctly-rounded double
    * division of exact integers and the fusion is one addition —
    * bit-identical on any engine; rounded 9 dp for the oracle hash.
    *
    * Scale shape: both inputs are top-R lists (bounded by retriever
    * depth, never corpus-sized), so the full-outer fusion join and the
    * final sort are driver-trivial at any corpus size; the heavy
    * lifting lives in the arms (bm25TopK's single-scan heaps, the ANN
    * family's probe-bounded reads).
    *
    * Output: (idCol, rk_lex, rk_sem nullable, rrf, rk), rk ≤ topK.
    */
  /** Multi-query BM25 — the retrieval-eval batch form: Q (qid, terms)
    * queries scored in ONE corpus text scan. The union of all queries'
    * terms becomes one set of codegen'd tf columns (terms are small by
    * definition; the scan cost is the text read, not the per-term
    * arithmetic), the narrow (id, dl, tf*) projection is materialized
    * once, and each query re-reads THAT frame — never the corpus —
    * for its own score expression. Per-query ranking runs on the
    * bounded-heap TopKPerKey operator keyed by qid: no global sort,
    * no per-query corpus pass. Output: (qid, idCol, score, rk).
    */
  def bm25TopKBatch(df: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Long, Seq[String])], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25 batch needs at least one query, each with at least one term")
    val allTerms = queries.flatMap(_._2).distinct
    val t = col(textCol)
    val tfCols = allTerms.zipWithIndex.map { case (term, i) =>
      TextAnalysis.tokenOccurrences(t, term).as(s"tf$i") }
    val base = df.select(col(idCol) +:
        TextAnalysis.tokenCount(t).as("dl") +: tfCols: _*)
      .localCheckpoint()
    val statAggs = count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +:
      allTerms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    // ONE row, materialized: the stats aggregation is referenced from
    // every one of the Q union branches, and whether Spark reuses the
    // exchange across them is the documented AQE coin-flip — without
    // the pin a Q-query batch could run Q aggregation passes over the
    // checkpointed frame
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
      .localCheckpoint()
    val n = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / n
    def scoreOf(terms: Seq[String]) = terms.map { term =>
      val i = allTerms.indexOf(term)
      val tf = col(s"tf$i").cast("double")
      val dfi = col(s"df$i").cast("double")
      val idf = log(lit(1.0) + (n - dfi + 0.5) / (dfi + 0.5))
      idf * tf * lit(k1 + 1) /
        (tf + lit(k1) * (lit(1.0) - b + lit(b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
    // Q narrow projections of the SAME checkpointed frame (blocks are
    // read, never recomputed), stacked and heap-ranked per qid
    val stacked = queries.map { case (qid, terms) =>
      base.crossJoin(broadcast(stats))
        .select(lit(qid).as("qid"), col(idCol),
          round(scoreOf(terms), 6).as("score"))
    }.reduce(_ unionAll _)
    graft.plans.TopK.topKPerKey(stacked, Seq("qid"),
      Seq(col("score").desc, col(idCol).asc), topK, rankCol = Some("rk"))
  }

  /** Multi-query [[rrfFusion]]: the same union-fusion arithmetic with
    * every window PARTITIONED BY qid — Q top-R arms fuse in one plan
    * with no global single-partition sort (the r14 single-query form's
    * global Window.orderBy is correct for one query and a serial
    * bottleneck for a batch). Per-qid row count is ≤ 2R (both arms'
    * depths), so the partitioned window is driver-trivial at any
    * corpus size; the arms carry all scale cost.
    * Output: (qid, idCol, rk_lex, rk_sem, rrf, rk), rk ≤ topK.
    */
  def rrfFusionBatch(lex: DataFrame, sem: DataFrame, idCol: String,
      kRrf: Int = 60, topK: Int = 20): DataFrame = {
    val fused = lex.select(col("qid"), col(idCol), col("rk").as("rk_lex"))
      .join(sem.select(col("qid"), col(idCol), col("rk").as("rk_sem")),
        Seq("qid", idCol), "full_outer")
      .select(col("qid"), col(idCol), col("rk_lex"), col("rk_sem"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("rk_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(kRrf) + col("rk_sem")), lit(0.0)),
          9).as("rrf"))
    fused
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("rrf").desc, col(idCol))).cast("long"))
      .where(col("rk") <= topK)
  }

  def rrfFusion(lex: DataFrame, sem: DataFrame, idCol: String,
      kRrf: Int = 60, topK: Int = 20): DataFrame = {
    val fused = lex.select(col(idCol), col("rk").as("rk_lex"))
      .join(sem.select(col(idCol), col("rk").as("rk_sem")),
        Seq(idCol), "full_outer")
      .select(col(idCol), col("rk_lex"), col("rk_sem"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("rk_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(kRrf) + col("rk_sem")), lit(0.0)),
          9).as("rrf"))
    fused
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rrf").desc, col(idCol))).cast("long"))
      .where(col("rk") <= topK)
  }

  def tfIdfTopTerms(df: DataFrame, textCol: String, idCol: String,
      topK: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(filter(split(col(textCol), " "), t => t =!= "")).as("term"))
    val tf = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val n = df.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf").cast("double") *
          log(col("n_docs") / col("df_t").cast("double")), 6))
    graft.plans.TopK.topKPerKey(
      scored.select(col("id"), col("term"), col("tfidf")),
      Seq("id"), Seq(col("tfidf").desc, col("term").asc), topK,
      rankCol = Some("rk"))
  }

  /** Inverted-index construction — the search-side artifact a
    * retrieval/decontamination pipeline materializes from the corpus:
    * per term its document frequency, collection frequency, and a
    * BOUNDED posting sample (the `postK` smallest doc ids with their
    * tf) via the bounded-heap TopKPerKey physical operator. The bound
    * is what makes the build scale-safe: a stopword's full posting
    * list is O(corpus) and a collect_list-style aggregate would hold
    * it in one buffer, while the heap keeps O(postK) state per term
    * and df/cf stay ordinary map-side-combinable aggregates. (A full
    * posting SINK at 100 TB would instead write the tf table
    * partitioned by term-hash — this operator is the bounded-summary
    * form a pipeline report consumes.)
    * Output: (term, df_t, cf, rk, id, tf), rk ≤ postK, ids ascending.
    */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String,
      postK: Int = 4): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(filter(split(col(textCol), " "), t => t =!= "")).as("term"))
    val tf = toks.groupBy(col("term"), col("id"))
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df_t"), sum(col("tf")).as("cf"))
    val posts = graft.plans.TopK.topKPerKey(
      tf, Seq("term"), Seq(col("id").asc), postK, rankCol = Some("rk"))
    posts.join(stats, "term")
      .select(col("term"), col("df_t"), col("cf"), col("rk"),
        col("id"), col("tf"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) — the diversity pass a retrieval pipeline runs AFTER the
    * similarity arm, so the k results are not k paraphrases of the
    * same document: greedily pick argmax of
    * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` until k are chosen.
    *
    * Scale shape: the RETRIEVAL is the distributed part — the exact
    * brute-force top-n cosine arm here (broadcast query + single
    * corpus scan + bounded heaps; any ANN arm slots in identically).
    * The greedy itself is O(k·n) over the n retrieved candidates — a
    * query constant, never corpus-shaped — so it runs driver-side on
    * the collected candidate rows, exactly like the query-vector
    * batches every ANN leg already collects. rel and all pairwise
    * sims are the engine's round-6 cosines ([[Similarity.cos6]]
    * replays the identical fold), the combined score is one
    * left-to-right double expression rounded to 6, and every argmax
    * tie-breaks on (mmr desc, id asc) — bit-reproducible by an
    * external oracle.
    *
    * Output: (idCol, mmr, rk), rk = 1..k in selection order.
    */
  def mmrRerank(corpus: DataFrame, queryId: Long, n: Int, k: Int,
      lambda: Double, gamma: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(n >= k, "mmr needs n >= k")
    val q = corpus.where(col(idCol) === queryId)
      .select(col(idCol).as("qid"), col(vecCol).as("qe"))
    val top = Similarity.bruteForceTopK(corpus, q, n, idCol, vecCol)
      .select(col(idCol), col("cosine").as("rel"))
    mmrFromArm(corpus, top, k, lambda, gamma, idCol, vecCol)
  }

  /** The greedy diversity pass over an ARBITRARY retrieved arm —
    * `top` is (idCol, rel), bounded by retriever depth by
    * construction, so any retriever (the flat scan above, the
    * persistent ANN index's refined batch) feeds the same MMR core.
    */
  def mmrFromArm(corpus: DataFrame, top: DataFrame, k: Int,
      lambda: Double, gamma: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "mmr needs k >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    // n candidate rows + their vectors — a query-batch constant
    val cand = corpus.join(broadcast(top), idCol)
      .select(col(idCol).cast("long"), col("rel"),
        col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Double](2).toIndexedSeq))
      .sortBy(_._1)
    require(cand.length >= k,
      s"mmr arm returned ${cand.length} candidates for k = $k")
    // cos6 is symmetric — cache on the ordered pair so each pairwise
    // similarity is computed once across all greedy steps
    val sim = scala.collection.mutable.Map.empty[(Long, Long), Double]
    def simOf(a: (Long, Double, IndexedSeq[Double]),
        b: (Long, Double, IndexedSeq[Double])): Double =
      sim.getOrElseUpdate(
        (math.min(a._1, b._1), math.max(a._1, b._1)),
        Similarity.cos6(a._3, b._3))
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, IndexedSeq[Double])]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
    for (rk <- 1 to k) {
      val scoredStep = remaining.map { c =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => simOf(c, s)).max
        (c, Similarity.round6(lambda * c._2 - gamma * maxSim))
      }
      val pick = scoredStep.minBy { case (c, mmr) => (-mmr, c._1) }
      selected += pick._1
      remaining -= pick._1
      out += ((pick._1._1, pick._2, rk.toLong))
    }
    out.toSeq.toDF(idCol, "mmr", "rk")
  }

  /** NDCG@k retrieval evaluation — the eval-harness operator that
    * turns a ranked retrieval run plus relevance labels into the
    * standard quality metric (Järvelin & Kekäläinen 2002). Relevance
    * here is binary label agreement (neighbor's class == query's
    * class); DCG weights 1/log2(rank+1) and the per-count ideal DCG
    * table are driver-side double constants embedded identically in
    * the SQL oracle, and the DCG sum is an EXPLICIT left-to-right
    * k-term expression (per-rank pivot), never an unordered SUM — so
    * the metric is bit-reproducible across engines.
    *
    * Scale shape: the retrieval arm is the distributed cost (here the
    * brute-force exact arm; any ANN arm slots in). The per-query
    * relevant-population count is one broadcast-join aggregation over
    * the label column; the DCG pivot and the ideal lookup act on
    * k·Q rows — query constants.
    *
    * Output: (qid, n_rel, ndcg).
    */
  def ndcgAtK(corpus: DataFrame, queryPred: Column, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = corpus.where(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qe"))
    val top = Similarity.bruteForceTopK(corpus, q, k, idCol, vecCol)
    ndcgFromArm(corpus, top, queryPred, k, idCol, labelCol)
  }

  /** NDCG@k over an ARBITRARY ranked arm — `top` is (qid, idCol, rk),
    * bounded by retriever depth, so any retriever (the exact scan
    * above, the persistent ANN index's refined batch) is scored by
    * the same metric core. This is how an index's RANKING quality
    * (not just recall overlap) gets measured against labels.
    */
  def ndcgFromArm(corpus: DataFrame, top: DataFrame, queryPred: Column,
      k: Int, idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    val q = corpus.where(queryPred)
      .select(col(idCol).as("qid"), col(labelCol).as("qlabel"))
    val gains = top.where(col("rk") <= k)
      .join(corpus.select(col(idCol), col(labelCol).as("nlabel")), idCol)
      .join(broadcast(q.select(col("qid"), col("qlabel"))), "qid")
      .select(col("qid"), col("rk"),
        when(col("nlabel") === col("qlabel"), 1.0).otherwise(0.0).as("g"))
    // per-rank pivot: g1..gk as exact 0/1 columns, then DCG as ONE
    // fixed-order expression Σ g_i · w_i (w_i = 1/log2(i+1) driver
    // doubles — the oracle embeds the same shortest-repr literals)
    val w = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val pivotAggs = (1 to k).map(i =>
      max(when(col("rk") === i, col("g"))).as(s"g$i"))
    val pivoted = gains.groupBy("qid").agg(pivotAggs.head, pivotAggs.tail: _*)
    val dcg = (1 to k).map(i =>
        coalesce(col(s"g$i"), lit(0.0)) * lit(w(i - 1)))
      .reduce(_ + _)
    // ideal DCG depends only on min(k, |relevant|): a k+1-entry
    // driver-side prefix-sum table
    val idcgTable = w.scanLeft(0.0)(_ + _) // idcgTable(c) = Σ_{i<=c} w_i
    val relCnt = corpus.select(col(idCol).as("nid"), col(labelCol))
      .join(broadcast(q.select(col("qid"), col("qlabel"))),
        col(labelCol) === col("qlabel") && col("nid") =!= col("qid"))
      .groupBy("qid").agg(count(lit(1)).as("n_rel"))
    // left join: a query whose label has NO other member must read
    // n_rel = 0 / ndcg = 0, not vanish from the eval report
    val nRel = coalesce(col("n_rel"), lit(0L))
    val idcg = element_at(typedLit(idcgTable),
      least(nRel, lit(k.toLong)).cast("int") + 1)
    pivoted.join(relCnt, Seq("qid"), "left")
      .select(col("qid"), nRel.as("n_rel"),
        when(nRel === 0, 0.0)
          .otherwise(round(dcg / idcg, 6)).as("ndcg"))
  }

  /** MRR + precision@k — the companion eval metrics to [[ndcgAtK]]
    * over the same retrieval arm and binary label-agreement
    * relevance: MRR is 1/rank of the FIRST relevant hit (0 when the
    * top-k has none), P@k the relevant fraction of the k. Both are
    * single correctly-rounded divisions of exact integers — no
    * rounding tolerance needed anywhere, bit-identical on any engine.
    *
    * Output: (qid, first_rel, mrr, p_at_k) — first_rel is 0 when no
    * relevant document ranked.
    */
  def mrrPrecisionAtK(corpus: DataFrame, queryPred: Column, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = corpus.where(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qe"),
        col(labelCol).as("qlabel"))
    val top = Similarity.bruteForceTopK(corpus,
      q.select(col("qid"), col("qe")), k, idCol, vecCol)
    val gains = top
      .join(corpus.select(col(idCol), col(labelCol).as("nlabel")), idCol)
      .join(broadcast(q.select(col("qid"), col("qlabel"))), "qid")
      .select(col("qid"), col("rk"),
        when(col("nlabel") === col("qlabel"), 1L).otherwise(0L).as("g"))
    gains.groupBy("qid")
      .agg(min(when(col("g") === 1L, col("rk"))).as("fr"),
        sum(col("g")).as("nrel_at_k"))
      .select(col("qid"), coalesce(col("fr"), lit(0L)).as("first_rel"),
        coalesce(lit(1.0) / col("fr"), lit(0.0)).as("mrr"),
        (col("nrel_at_k").cast("double") / lit(k.toDouble)).as("p_at_k"))
  }
}
