package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix curation operators: deterministic splits, benchmark
  * decontamination, and embedding quantization — the steps between
  * "deduplicated corpus" and "training shards" in an LLM data
  * pipeline.
  *
  * Everything is pure DataFrame transformation with engine-portable
  * arithmetic (md5 thresholds, floor-based rounding) so an external
  * SQL oracle reproduces results exactly.
  */
object Curation {

  /** Deterministic hash split: a document's bucket in [0, 10000) is the
    * first 4 hex digits of md5(seed:id) — stable across runs, engines,
    * and cluster layouts (no RNG, no ordering dependence), the standard
    * way to carve train/val/test so re-runs and incremental ingests
    * keep every document on its original side. Zero shuffle: one
    * projection.
    */
  def hashBucket(idCol: Column, seed: String = "split"): Column =
    pmod(
      conv(substring(md5(concat(lit(s"$seed:"), idCol.cast("string")).cast("binary")), 1, 4),
        16, 10).cast("long"),
      lit(10000L))

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative integral columns — rows close in BOTH dimensions get
    * close keys, so range-partitioning + sorting parquet by the key
    * keeps multi-column predicates prunable from row-group min/max
    * stats (the standard multi-dimensional layout technique; one
    * dimension alone would leave the other column's stats useless).
    * Pure integer bit arithmetic, identical on any engine.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Rewrite `df` in Z-order on two columns: range-partition by the
    * Morton key, sort within partitions. The write after this is what
    * makes both `aCol` and `bCol` predicates prune at scan time.
    */
  def zOrderBy(df: DataFrame, aCol: String, bCol: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    val z = zValue(col(aCol), col(bCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Bucketed CO-LOCATED join layout: both sides are written as
    * bucketed, bucket-sorted parquet tables on their join key, then
    * joined with NO shuffle (and no per-partition re-sort) on either
    * side — the output partitioning/ordering of the bucketed scans
    * already satisfies the sort-merge join's requirements. This is
    * the pay-once-at-write layout for a fact table that is joined on
    * the same key every day at 100 TB: the repeated join stops paying
    * the dominant exchange (BucketedJoinSpec pins the zero-shuffle
    * plan; broadcast would of course also avoid the shuffle for a
    * small side — the point here is that NEITHER side shuffles at any
    * size). Bucket counts must match (or divide) for co-location.
    *
    * Each side is pre-repartitioned on the key with the bucket count —
    * Spark's bucket id is the same murmur3 pmod as hashpartitioning,
    * so this yields ONE file per bucket. A per-partition Sort still
    * appears above the scans: since SPARK-28595 Spark never trusts
    * bucket-file ordering (legacy `bucketedTableScan.outputOrdering`
    * conf, default off) — the in-memory sort is the cheap part; the
    * exchange it removes is the one that dominates at scale.
    */
  /** Per-JVM nonce appended to every bucketedJoin table name: two
    * concurrent sessions sharing a warehouse dir (a bench overlapping
    * a verify run) get disjoint physical names, so neither can drop or
    * overwrite the other's layout — and a caller-supplied name can no
    * longer collide with a REAL managed table, whose silent
    * destruction was the failure mode of the fixed-name scheme.
    */
  private val bktNonce: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)
  private val bktCreated = scala.collection.mutable.LinkedHashSet.empty[String]

  /** This host's name, recorded in every ownership marker: a pid is
    * only meaningful on the machine that assigned it, so reclaim
    * decisions must never probe /proc for another host's pid (on a
    * shared HDFS/s3a warehouse a foreign live session would read as a
    * dead local pid and its tables would be dropped mid-query).
    *
    * CANONICALIZED (`getCanonicalHostName`): two JVMs on one machine
    * can disagree between short name, FQDN, and container hostname if
    * each reads the raw `getHostName` — a same-host marker then reads
    * as foreign and dead sessions' tables are never reclaimed
    * (fail-safe, but warehouse dirs accumulate silently). The
    * canonical form resolves through DNS/hosts to one stable spelling
    * on both the write and the compare path. If resolution itself
    * drifts between sessions (e.g. a container whose /etc/hosts
    * changed), the mismatch still fails SAFE: the marker reads as
    * foreign and the table is merely retained, never dropped.
    */
  private val bktHost: String =
    try java.net.InetAddress.getLocalHost.getCanonicalHostName
    catch {
      case _: Exception =>
        try java.net.InetAddress.getLocalHost.getHostName
        catch { case _: Exception => "unknown-host" }
    }

  /** Ownership marker body: `pid@host@startMillis`. The host gates the
    * /proc liveness probe to this machine; the start time is forensic
    * (pid-reuse window). Legacy bare-pid markers (pre-r14) parse with
    * an empty host.
    */
  private def ownerMarkerBody(): String =
    s"${java.lang.ProcessHandle.current().pid()}@$bktHost@" +
      s"${System.currentTimeMillis()}"

  /** Whether a marker body releases its table for reclaim: only a
    * SAME-HOST dead pid does. A foreign host's marker never releases
    * (its liveness is unknowable from here); a legacy host-less marker
    * releases only on a local-scheme warehouse (where same-host is
    * implied by construction).
    */
  private def ownerReclaimable(body: String, localFs: Boolean): Boolean = {
    val parts = body.trim.split("@")
    val pid = try parts(0).toLong catch { case _: Exception => -1L }
    val host = if (parts.length > 1) parts(1) else ""
    if (pid <= 0) false
    else if (host.nonEmpty && host != bktHost) false
    else if (host.isEmpty && !localFs) false
    else !java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"/proc/$pid"))
  }

  def bucketedJoin(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      buckets: Int, leftTable: String, rightTable: String): DataFrame = {
    val spark = left.sparkSession
    val lt = s"${leftTable}__g$bktNonce"
    val rt = s"${rightTable}__g$bktNonce"
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val localFs = {
      val s = fs.getUri.getScheme
      s == null || s == "file"
    }
    // the ownership marker is a warehouse-level SIBLING file
    // (`<phys>._graft_owner`), not (only) a file inside the table dir:
    // it must exist BEFORE saveAsTable starts (CTAS refuses a
    // non-empty location, so an in-dir marker can only be written
    // after the data — leaving every in-progress write markerless,
    // exactly the window the mtime fallback then misjudges)
    def siblingMarker(t: String) =
      new org.apache.hadoop.fs.Path(warehouse, s"$t._graft_owner")
    bktCreated.synchronized {
      Seq(lt, rt).foreach { t =>
        // same-session re-run (bench min-of-2) reuses the nonce'd name:
        // dropping OUR OWN managed table (tracked in bktCreated) also
        // removes its location
        if (bktCreated.remove(t)) spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new org.apache.hadoop.fs.Path(warehouse, t)
        if (fs.exists(loc)) {
          // the name embeds THIS JVM's random nonce, so only this
          // helper can have created the location — a surviving dir
          // means the catalog and filesystem went out of sync (a new
          // SparkSession in the same JVM made DROP TABLE a no-op, or a
          // prior saveAsTable failed partway). Reclaim it; refusing
          // here (the old behavior) aborted on a location we own.
          spark.sql(s"DROP TABLE IF EXISTS $t")
          fs.delete(loc, true)
        }
      }
      // stale generations from OTHER JVMs (`<logical>__g<nonce'>`) are
      // unreachable once their JVM exits — their nonce died with it —
      // and the old fixed-name scheme's implicit overwrite no longer
      // clears them, so they would accumulate across runs. Ownership
      // is decided by the `_graft_owner` marker each generation
      // carries (sibling file first — present from before the data
      // write — then the legacy in-dir marker): a LIVE same-host owner
      // pid means a concurrent session's table, never touched
      // regardless of age; a same-host dead pid means reclaimable; a
      // FOREIGN host's marker is never touched (its pid is not ours to
      // probe); a missing marker falls back to an age gate on a LOCAL
      // warehouse only — on a shared warehouse an unmarked dir may be
      // another host's in-progress write, and "refuse, never delete"
      // is the contract there. One warehouse listing covers both
      // logical names.
      val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
      if (fs.exists(warehouse))
        fs.listStatus(warehouse).foreach { st =>
          val n = st.getPath.getName
          val mine = Seq(leftTable, rightTable)
            .exists(l => n.startsWith(s"${l}__g"))
          if (st.isDirectory && mine && n != lt && n != rt) {
            val markers = Seq(siblingMarker(n),
              new org.apache.hadoop.fs.Path(st.getPath, "_graft_owner"))
            val body = markers.collectFirst {
              case m if fs.exists(m) =>
                try scala.io.Source.fromInputStream(
                    fs.open(m), "UTF-8").mkString
                catch { case _: Exception => "" }
            }
            val reclaimable = body match {
              case Some(b) => ownerReclaimable(b, localFs)
              case None => localFs && st.getModificationTime < cutoff
            }
            if (reclaimable) {
              spark.sql(s"DROP TABLE IF EXISTS $n")
              fs.delete(st.getPath, true)
              fs.delete(siblingMarker(n), false)
            }
          }
        }
    }
    // claim BEFORE writing: from here on an observer sees an owned
    // in-progress generation, never a markerless directory
    Seq(lt, rt).foreach { t =>
      val out = fs.create(siblingMarker(t), true)
      try out.write(ownerMarkerBody().getBytes("UTF-8"))
      finally out.close()
    }
    left.repartition(buckets, col(leftKey))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, leftKey).sortBy(leftKey).saveAsTable(lt)
    right.repartition(buckets, col(rightKey))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, rightKey).sortBy(rightKey).saveAsTable(rt)
    // in-dir marker too (underscore-prefixed — parquet readers skip
    // it): survives a sibling-marker loss and keeps the pre-r14
    // reclaim path of older sessions working against our tables
    Seq(lt, rt).foreach { t =>
      val out = fs.create(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(warehouse, t), "_graft_owner"),
        true)
      try out.write(ownerMarkerBody().getBytes("UTF-8"))
      finally out.close()
    }
    bktCreated.synchronized { bktCreated ++= Seq(lt, rt) }
    spark.table(lt)
      .join(spark.table(rt), col(leftKey) === col(rightKey))
  }

  /** Split assignment from per-mille thresholds, e.g.
    * `Seq("train" -> 9800, "val" -> 9900, "test" -> 10000)` (basis
    * points of 10000, ascending, last must be 10000).
    */
  def hashSplit(df: DataFrame, idCol: String,
      thresholds: Seq[(String, Int)], seed: String = "split"): DataFrame = {
    require(thresholds.nonEmpty && thresholds.last._2 == 10000 &&
      thresholds.map(_._2) == thresholds.map(_._2).sorted,
      "thresholds are ascending basis points ending at 10000")
    val bucket = hashBucket(col(idCol), seed)
    val assign = thresholds.init.foldRight(
      lit(thresholds.last._1): Column) { case ((name, hi), rest) =>
      when(bucket < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("bucket", bucket).withColumn("split", assign)
  }

  /** Deterministic stratified sampling — the mixing step that downsamples
    * over-represented strata (language, source, quality band) to target
    * proportions. A document is kept iff its hash bucket (same
    * md5-derived [0, 10000) bucket as [[hashBucket]], independent seed)
    * falls under its stratum's rate in BASIS POINTS of 10000 — integer
    * thresholds, not double rates, so the keep decision is bit-portable
    * across engines (0.1 * 10000 is not 1000 in binary floating point).
    *
    * Zero shuffle: one projection + filter, the same plan shape at 100 TB
    * as at 500 rows. Deterministic by id, so re-runs and incremental
    * ingests keep/drop the same documents, and the sample composes with
    * [[hashSplit]] (different seeds → independent buckets).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      ratesBp: Map[String, Int], defaultBp: Int,
      seed: String = "sample"): DataFrame = {
    require((ratesBp.values ++ Seq(defaultBp)).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0, 10000]")
    val rate = ratesBp.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(defaultBp))) {
        case (acc, (k, bp)) => acc.when(col(stratumCol) === k, lit(bp))
      }.otherwise(lit(defaultBp))
    df.withColumn("bucket", hashBucket(col(idCol), seed))
      .where(col("bucket") < rate)
  }

  /** Score-proportional deterministic sampling: keep each document
    * with probability equal to its OWN quality score — the continuous
    * counterpart of [[stratifiedSample]]'s per-stratum rates, i.e. the
    * classifier-score-weighted downsampling step of modern curation
    * pipelines (keep-probability ∝ model-judged quality). `scoreBp` is
    * any Column yielding the score in BASIS POINTS of 10000 (integer,
    * like every rate here, so the keep decision is bit-portable);
    * a document is kept iff its md5 bucket falls under its score.
    *
    * Zero shuffle — one projection + filter over the corpus, the same
    * plan at 100 TB — and deterministic by id, so re-runs keep the
    * same documents and the sample composes with [[hashSplit]] and
    * [[stratifiedSample]] under independent seeds.
    */
  def weightedSample(df: DataFrame, idCol: String, scoreBp: Column,
      seed: String = "wsample"): DataFrame =
    df.withColumn("score_bp",
        greatest(lit(0L), least(lit(10000L), scoreBp.cast("long"))))
      .withColumn("bucket", hashBucket(col(idCol), seed))
      .where(col("bucket") < col("score_bp"))

  /** 32-bit md5-derived uniform in (0,1): u = (h32 + 0.5) / 2³².
    * h32 parses 8 hex digits (exact in a double: < 2³² « 2⁵³), the
    * +0.5 keeps u strictly positive, and the divisor is a POWER OF
    * TWO, so u is an exact dyadic rational — any engine recomputes it
    * bit-identically from the same md5 hex. The fine-grained
    * counterpart of [[hashBucket]] for operators that need a real
    * uniform, not a basis-point bucket.
    */
  def hashUniform(idCol: Column, seed: String): Column =
    (conv(substring(
        md5(concat(lit(s"$seed:"), idCol.cast("string")).cast("binary")),
        1, 8), 16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007): a
    * fixed-BUDGET weighted sample WITHOUT replacement — each item gets
    * priority w/u (u uniform in (0,1)) and the k highest priorities
    * per stratum are kept, giving weight-proportional inclusion with
    * provably near-optimal subset-sum variance. The weighted
    * counterpart of the uniform [[SparkEntry]] `curation_sample_topk`
    * reservoir and the fixed-RATE [[weightedSample]]: long/heavy
    * documents win slots proportionally to weight, yet no stratum
    * exceeds its budget.
    *
    * Engine portability — deliberately libm-free (the reason this is
    * priority sampling and not exponential-key A-Res, whose
    * -ln(u)/w keys differ across math libraries in the last ulp):
    * u is an exact dyadic from [[hashUniform]], w is an exact
    * integer, and w/u is ONE correctly-rounded IEEE division — the
    * priority is bit-identical on any engine, so the sample needs no
    * rounding tolerance at all.
    *
    * Scale shape: one zero-shuffle projection for the priority, one
    * hash shuffle on the stratum key into the bounded-heap TopKPerKey
    * operator — O(k) state per stratum, no per-stratum sort, skewed
    * strata cost the heap, never a sort of their full posting.
    *
    * Output: (idCol, groupCol, priority, rk), rk ≤ k per stratum.
    */
  def prioritySample(df: DataFrame, groupCol: String, idCol: String,
      weight: Column, k: Int, seed: String = "psample"): DataFrame =
    graft.plans.TopK.topKPerKey(
        df.select(col(idCol), col(groupCol),
          (greatest(weight.cast("double"), lit(1.0)) /
            hashUniform(col(idCol), seed)).as("priority")),
        Seq(groupCol), Seq(col("priority").desc, col(idCol).asc), k,
        rankCol = Some("rk"))
      .select(col(idCol), col(groupCol), col("priority"), col("rk"))

  /** Temperature-scaled source mixing: derive each stratum's keep-rate
    * FROM THE CORPUS so the sampled mix follows p(s) ∝ count(s)^alpha —
    * the multinomial temperature-sampling rule used to rebalance
    * multi-source / multilingual training corpora (alpha = 1 keeps the
    * natural distribution, alpha → 0 approaches uniform over strata).
    * Unlike [[stratifiedSample]] (rates given by the caller), the rates
    * here are data-dependent: sampling documents independently with
    * keep-rate r(s) ∝ count(s)^(alpha-1) gives an expected sampled
    * count ∝ count(s)^alpha; normalizing by the SMALLEST stratum
    * (r = (min_count / count)^(1-alpha)) keeps the rarest source intact
    * and downsamples the rest toward it.
    *
    * Engine portability: the keep decision is `hashBucket < floor(rate
    * × 10000)` — and for the default alpha = 0.5 the rate is
    * sqrt(min/n), computed with IEEE-754 division and sqrt (both
    * correctly rounded, so bit-identical on any engine); other alphas
    * go through pow(), whose last-ulp behavior is library-specific —
    * fine for production, not for an exact external oracle.
    *
    * Scale: one map-side-combined aggregation to |strata| rows, a
    * broadcast join of those rates back onto the corpus, and a
    * projection — no corpus-wide shuffle at any size.
    *
    * Output: input columns + (bucket, rate_bp, keep).
    */
  def temperatureMix(df: DataFrame, stratumCol: String, idCol: String,
      alpha: Double = 0.5, seed: String = "mix"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    val minN = counts.agg(min(col("n")).as("min_n"))
    val ratio = col("min_n").cast("double") / col("n").cast("double")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1 - alpha)
    val rates = counts.crossJoin(minN)
      .select(col(stratumCol), floor(rate * 10000).cast("long").as("rate_bp"))
    df.join(broadcast(rates), stratumCol)
      .withColumn("bucket", hashBucket(col(idCol), seed))
      .withColumn("keep", col("bucket") < col("rate_bp"))
  }

  /** Greedy next-fit sequence packing: assign documents to fixed
    * token-budget packs — the step that turns a filtered corpus into
    * dense training sequences. Documents route to `numLanes`
    * independent packing lanes by id hash; each lane packs in
    * ascending `doc_id` order, opening a new pack when the current one
    * cannot fit the next document (a document longer than the budget
    * gets a pack of its own).
    *
    * Scale: packing is sequential WITHIN a lane but embarrassingly
    * parallel ACROSS lanes — at 100 TB you raise `numLanes` (each lane
    * is one streaming pass). The implementation is repartition-by-lane
    * + sort-within-partitions + a streaming `mapPartitions` whose state
    * is three scalars (lane, pack, used) — O(1) memory per task, a
    * lane is NEVER materialized in memory.
    *
    * Output: (doc_id, lane, tokens, pack) — pack ids are per-lane,
    * dense from 0.
    */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      budget: Long, numLanes: Int = 8, seed: String = "pack"): DataFrame = {
    require(budget > 0 && numLanes > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("doc_id"),
        pmod(hashBucket(col(idCol), seed), lit(numLanes.toLong)).cast("int").as("lane"),
        size(split(col(textCol), " ")).cast("long").as("tokens"))
      // range-partition so the `numLanes` small integer lane ids land in
      // distinct partitions — hash partitioning can collide several lanes
      // into one task and leave others empty, losing lane parallelism
      .repartitionByRange(numLanes, col("lane"))
      .sortWithinPartitions(col("lane"), col("doc_id"))
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        // a hash partition may interleave several lanes' runs — the
        // sort above makes each lane one contiguous run; reset on the
        // lane boundary
        var lane = Int.MinValue
        var pack = -1L
        var used = 0L
        it.map { case (id, ln, n) =>
          if (ln != lane) { lane = ln; pack = -1L; used = 0L }
          if (pack < 0L || used + n > budget) { pack += 1L; used = 0L }
          used += n
          (id, ln, n, pack)
        }
      }
      .toDF("doc_id", "lane", "tokens", "pack")
  }

  /** Benchmark decontamination: flag corpus documents sharing ANY word
    * n-gram with a benchmark/eval set (the standard n-gram-overlap
    * contamination test). The join key is the n-gram itself — shuffle
    * is on shingle hashes, never document pairs; benchmark shingle sets
    * are usually small enough that the join broadcasts.
    *
    * Returns (id, n_hits, first_hit) per CONTAMINATED document only.
    */
  def contaminated(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 8): DataFrame = {
    // every corpus shingle OCCURRENCE, no pre-join distinct: the
    // corpus side must not shuffle at all — the broadcast probe drops
    // everything but benchmark hits, and the post-join aggregation
    // (countDistinct for per-doc dedup) shuffles only those hits
    val corpusShingles = Dedup.wordShinglesAll(corpus, textCol, idCol, n)
    val benchShingles = Dedup.wordShingles(benchmark, textCol, idCol, n)
      .select(col("sh")).distinct()
    // benchmark sets are tiny by definition — broadcast them so the
    // 100 TB corpus shingle stream is probed in place, never
    // shuffle-sorted against the benchmark side
    corpusShingles.join(broadcast(benchShingles), "sh")
      .groupBy(col("id"))
      .agg(countDistinct(col("sh")).as("n_hits"), min(col("sh")).as("first_hit"))
  }

  /** FUZZY benchmark decontamination: corpus documents that are
    * MinHash-LSH near-duplicates of a benchmark document — the
    * contamination an exact n-gram test ([[contaminated]]) misses when
    * the leaked copy was lightly edited (reworded answer, shuffled
    * options, inserted whitespace). Same discovery geometry as the
    * dedup family (word 3-shingles, 8 derived minhashes, 4 bands) with
    * exact-Jaccard verification at `threshold`.
    *
    * Scale shape: the benchmark side is tiny by definition, so its
    * band rows BROADCAST and the corpus band stream is probed in place
    * — no corpus self-join, no corpus shuffle beyond the signature
    * aggregation; the verify re-reads shingles only for candidate
    * documents ([[Dedup.jaccardForCandidates]]'s semi-join
    * restriction).
    *
    * Output: one row per contaminated corpus doc —
    * (doc_id, n_bench_dups, best_jaccard, best_bench), best = the
    * highest-Jaccard benchmark match (ties to the smaller bench id).
    */
  def contaminatedFuzzy(df: DataFrame, textCol: String, idCol: String,
      isBench: Column, threshold: Double = 0.8, k: Int = 3,
      numHashes: Int = 8, bands: Int = 4): DataFrame = {
    // materialized for the multi-consumer reason minhashLsh documents;
    // sig too — bandKeys' per-band union re-derives its input once per
    // band per SIDE here (corpus probe + benchmark build = 8
    // recomputes of the 8-column min aggregation), and a signature row
    // is 9 longs per document, far cheaper to hold than to recompute
    val sh = Dedup.wordShingles(df, textCol, idCol, k).localCheckpoint()
    val sig = Dedup.minhashSignatures(sh, numHashes).localCheckpoint()
    val banded = Dedup.bandKeys(sig, bands, numHashes / bands)
    val benchIds = df.where(isBench).select(col(idCol).as("id"))
    val benchBands = banded.join(broadcast(benchIds), "id")
    val cand = banded.join(broadcast(benchIds), Seq("id"), "left_anti")
      .as("c")
      .join(broadcast(benchBands).as("q"),
        col("c.band") === col("q.band") && col("c.bkey") === col("q.bkey"))
      .select(col("c.id").as("a"), col("q.id").as("b")).distinct()
    val ver = Dedup.jaccardForCandidates(cand, sh)
      .where(col("jaccard") >= threshold)
    ver.groupBy(col("a"))
      .agg(count(lit(1)).as("n_bench_dups"),
        max(col("jaccard")).as("best_jaccard"),
        // highest jaccard, ties to the smaller bench id
        min(struct((-col("jaccard")).as("nj"), col("b").as("bb")))
          .getField("bb").as("best_bench"))
      .select(col("a").as("doc_id"), col("n_bench_dups"),
        col("best_jaccard"), col("best_bench"))
  }

  /** The Gopher stop-word list (Rae et al. 2021 §A1.1 verbatim: a doc
    * must contain stop words from this exact 8-word set). Counted on
    * TOKEN boundaries via [[TextAnalysis.tokenSetOccurrences]] —
    * substring counting would score "there"/"toward"/"offer" as stop
    * words. Shared with the SQL oracle so both sides count identically.
    */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style composite quality FILTER (the rule family of Rae et
    * al. 2021, "Scaling Language Models" §A1.1, public heuristics):
    * token-count bounds, mean-token-length band, minimum stopword
    * ratio, and the repetition caps — combined into one keep/drop
    * decision with the FIRST failing rule named. This is the actual
    * curation decision point downstream of the individual signal
    * operators; every signal uses the same engine-portable arithmetic
    * those operators use (integer length differences, IEEE divisions
    * of exact ints, 6-dp-rounded repetition fractions), so an external
    * oracle reproduces the decision bit-for-bit.
    *
    * One corpus pass for the cheap signals + the repetition features'
    * bounded aggregations; zero additional shuffles beyond them.
    */
  def qualityFilter(df: DataFrame, textCol: String, idCol: String,
      minTokens: Long, maxTokens: Long,
      minMeanTokLen: Double, maxMeanTokLen: Double,
      minStopRatio: Double,
      maxTopBigramFrac: Double, maxDupTrigramFrac: Double): DataFrame = {
    val id = col(idCol)
    val t = col(textCol)
    val nTokens = (length(t) -
      length(regexp_replace(t, lit(" "), lit(""))) + 1).cast("long")
    val nChars = length(regexp_replace(t, lit(" "), lit(""))).cast("double")
    // one alternation pass for the whole set — not one full-text
    // replace per stop word
    val nStop = TextAnalysis.tokenSetOccurrences(t, Stopwords).cast("double")
    val base = df.select(id,
      nTokens.as("n_tokens"),
      (nChars / nTokens.cast("double")).as("mean_tok_len"),
      (nStop / nTokens.cast("double")).as("stop_ratio"))
    val rep = graft.ops.Repetition.repetitionFeatures(df, textCol, idCol)
      .select(id, col("top_bigram_frac"), col("dup_trigram_frac"))
    base.join(rep, Seq(idCol))
      .withColumn("reason", gopherReason(minTokens, maxTokens,
        minMeanTokLen, maxMeanTokLen, minStopRatio,
        maxTopBigramFrac, maxDupTrigramFrac))
      .withColumn("keep", col("reason") === "")
  }

  /** The Gopher rule CASE — ONE definition shared by [[qualityFilter]]
    * and [[qualityEnsemble]] so the tier semantics can never drift.
    * Expects the signal columns (n_tokens, mean_tok_len, stop_ratio,
    * top_bigram_frac, dup_trigram_frac) in scope.
    */
  private def gopherReason(minTokens: Long, maxTokens: Long,
      minMeanTokLen: Double, maxMeanTokLen: Double,
      minStopRatio: Double, maxTopBigramFrac: Double,
      maxDupTrigramFrac: Double): Column =
    when(col("n_tokens") < minTokens, "too_few_tokens")
      .when(col("n_tokens") > maxTokens, "too_many_tokens")
      .when(col("mean_tok_len") < minMeanTokLen ||
        col("mean_tok_len") > maxMeanTokLen, "mean_tok_len")
      .when(col("stop_ratio") < minStopRatio, "low_stopword_ratio")
      .when(col("top_bigram_frac") > maxTopBigramFrac,
        "top_bigram_repetition")
      .when(col("dup_trigram_frac") > maxDupTrigramFrac,
        "dup_trigram_repetition")
      .otherwise("")

  /** The production quality-filter STACK: cheap Gopher rules first,
    * then the corpus-trained perplexity tertile (CCNet), then the
    * Naive-Bayes classifier — the tiered composition modern curation
    * pipelines run (rules → LM filter → classifier filter), with the
    * FIRST failing tier named so drop statistics attribute per tier.
    *
    * Scale shape: the three tier chains all start from the same
    * corpus tokenization, so the shared token/signal frame is
    * materialized ONCE (`localCheckpoint` — the
    * candidateRestrictedShingles discipline for multi-consumer
    * subframes, see Dedup) and every tier explodes from its
    * reference-tracked blocks instead of re-deriving the corpus scan
    * + split per tier; each tier is then the already-gated operator
    * (zero-/vocab-bounded-shuffle respectively) and the composition
    * adds only two equi-joins on the doc id. Tier results are
    * EXPRESSION-IDENTICAL to the standalone operators composed on the
    * raw frame (OpsSpec "quality ensemble = first failing tier of its
    * three components" pins the equality per tier): the
    * materialization changes where the token arrays live, never what
    * they are.
    *
    * Output: (id, gopher_reason, bucket, pred_pos, reason, keep) — one
    * row per document; `reason` is "" when every tier passes.
    */
  def qualityEnsemble(df: DataFrame, textCol: String, idCol: String,
      positive: Column,
      minTokens: Long, maxTokens: Long,
      minMeanTokLen: Double, maxMeanTokLen: Double,
      minStopRatio: Double,
      maxTopBigramFrac: Double, maxDupTrigramFrac: Double): DataFrame = {
    val id = col(idCol)
    val t = col(textCol)
    val nTokens = (length(t) -
      length(regexp_replace(t, lit(" "), lit(""))) + 1).cast("long")
    val nChars = length(regexp_replace(t, lit(" "), lit(""))).cast("double")
    val nStop = TextAnalysis.tokenSetOccurrences(t, Stopwords).cast("double")
    // the shared multi-consumer frame: one corpus scan, one tokenize,
    // the cheap Gopher signals computed in the same projection
    val tok = df.select(id, positive.as("pos"),
        length(t).as("n_chars"),
        nTokens.as("n_tokens"),
        (nChars / nTokens.cast("double")).as("mean_tok_len"),
        (nStop / nTokens.cast("double")).as("stop_ratio"),
        split(t, " ").as("toks"))
      .localCheckpoint()
    // the filtered-token view every LM-ish tier uses (empties dropped
    // — the shared corpus tokenization convention)
    val ts = filter(col("toks"), x => x =!= "")
    val rep = graft.ops.Repetition.repetitionFeaturesFrom(
      tok.select(id, col("n_chars"), col("toks")), idCol)
      .select(id, col("top_bigram_frac"), col("dup_trigram_frac"))
    val gopher = tok
      .select(id, col("n_tokens"), col("mean_tok_len"), col("stop_ratio"))
      .join(rep, Seq(idCol))
      .withColumn("gopher_reason", gopherReason(minTokens, maxTokens,
        minMeanTokLen, maxMeanTokLen, minStopRatio,
        maxTopBigramFrac, maxDupTrigramFrac))
      .select(id, col("gopher_reason"))
    val ppl = LanguageModel.perplexityBucketsFrom(
      tok.select(id.as("id"), ts.as("ts")))
      .select(col("id").as(idCol), col("bucket"))
    val clf = Classifier.logOddsScoreFrom(
      tok.select(id.as("id"), col("pos"), ts.as("ts")))
      .select(col("id").as(idCol), col("pred_pos"))
    gopher.join(ppl, Seq(idCol)).join(clf, Seq(idCol))
      .withColumn("reason",
        when(col("gopher_reason") =!= "",
          concat(lit("gopher:"), col("gopher_reason")))
          .when(col("bucket") === "tail", lit("ppl:tail"))
          .when(!col("pred_pos"), lit("classifier:neg"))
          .otherwise(lit("")))
      .withColumn("keep", col("reason") === "")
  }

  /** DSIR importance weights (Xie et al. 2023, Data Selection via
    * Importance Resampling): score every document by how much more
    * likely its hashed n-gram features are under a TARGET (in-domain)
    * distribution than under the RAW corpus — the data-selection pass
    * a pretraining pipeline runs to tilt a web-scale corpus toward a
    * small high-quality domain before sampling. Features are lowercase
    * word unigrams + bigrams hashed into `buckets` md5 buckets
    * (buckets divides 65536 so the 4-hex-digit derivation is exactly
    * uniform); both distributions are Laplace-smoothed bucket
    * frequencies, and a document's weight is Σ_gram ln p_t(b) / p_r(b).
    *
    * Engine portability: each bucket's log-ratio is ONE ln of an
    * exactly-computed rational — (c_t+1)(R+B) / (c_r+1)(T+B), integer
    * products well under 2^53 so the double quotient is correctly
    * rounded and identical on any engine — and the raw doubles are
    * summed per doc with the final weight rounded to 4 dp, the
    * text_lm_logprob discipline (ln's last-ulp spread and the sum
    * order perturb the total by ~1e-14, six orders below the rounding
    * grid; rounding per-BUCKET instead would manufacture knife-edges
    * exactly ON the grid).
    *
    * Scale shape: one token-mass explode feeding a (doc, bucket)
    * map-side-combined aggregation; the MODEL is that aggregation
    * rolled up to `buckets` rows and collected — the trained-constant
    * discipline every quantizer leg uses (production trains the DSIR
    * model once and scores corpora with it; here both happen in the
    * call, two corpus passes total) — and scoring is a literal-map
    * lookup PROJECTION plus the per-doc sum: no join anywhere in the
    * scoring plan, no shuffle beyond the doc-keyed aggregations.
    * Selection composes downstream: feed `dsir_logw` into
    * [[weightedSample]] / a top-k sampler.
    *
    * Output: (doc_id, n_feats, dsir_logw) — one row per document
    * (a document with no tokens keeps n_feats 0, weight 0).
    */
  def dsirWeights(df: DataFrame, textCol: String, idCol: String,
      targetPred: Column, buckets: Int = 4096,
      seed: String = "dsir"): DataFrame = {
    require(65536 % buckets == 0, "buckets must divide 65536")
    val words = filter(split(lower(col(textCol)), " "), w => w =!= "")
    val bigrams = when(size(words) >= 2,
      zip_with(slice(words, lit(1), size(words) - 1),
        slice(words, lit(2), size(words) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val grams = concat(words, bigrams)
    val bucket = pmod(
      conv(substring(md5(concat(lit(s"$seed:"), col("gram")).cast("binary")),
        1, 4), 16, 10).cast("long"),
      lit(buckets.toLong))
    val feats = df.select(col(idCol).as("doc_id"), targetPred.as("is_t"),
        explode(grams).as("gram"))
      .select(col("doc_id"), col("is_t"), bucket.as("b"))
    val docBuck = feats.groupBy("doc_id", "is_t", "b")
      .agg(count(lit(1)).as("c"))
    // the model: ≤ buckets rows by construction — collect like every
    // trained constant, so the scoring plan re-reads the corpus once
    // (not three times for glob/totals/score) and joins nothing
    val gb = docBuck.groupBy("b").agg(
        sum(col("c")).as("cr"),
        sum(when(col("is_t"), col("c")).otherwise(lit(0L))).as("ct"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rTot = gb.map(_._2).sum
    val tTot = gb.map(_._3).sum
    // single ln of an exact integer rational (see scaladoc)
    val lrMap: Map[Long, Double] = gb.map { case (b, cr, ct) =>
      b -> math.log(((ct + 1) * (rTot + buckets)).toDouble /
        ((cr + 1) * (tTot + buckets)).toDouble)
    }.toMap
    // unseen-bucket smoothing floor — unreachable when scoring the
    // training corpus itself, the contract for NEW documents
    val dflt = math.log((rTot + buckets).toDouble / (tTot + buckets).toDouble)
    val w = docBuck
      .withColumn("lr",
        coalesce(element_at(typedLit(lrMap), col("b")), lit(dflt)))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_feats"),
        round(sum(col("c").cast("double") * col("lr")), 4).as("dsir_logw"))
    df.select(col(idCol).as("doc_id")).join(w, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("dsir_logw"), lit(0.0)).as("dsir_logw"))
  }

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max|x| / 127, codes = floor(x/scale + 0.5) clamped to
    * [-127, 127]. floor(x + 0.5) — not round() — because engines
    * disagree on round-half semantics and this must be bit-portable.
    * One projection; emits the quantization-error profile a pipeline
    * monitors (max abs reconstruction error per vector).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val absMax = aggregate(col(vecCol),
      lit(0.0), (acc, v) => greatest(acc, abs(v.cast("double"))))
    val withScale = df.withColumn("abs_max", absMax)
      .withColumn("scale", col("abs_max") / lit(127.0))
    val codes = transform(col(vecCol), v =>
      greatest(lit(-127.0), least(lit(127.0),
        floor(v.cast("double") / col("scale") + lit(0.5)))).cast("int"))
    withScale
      .withColumn("codes", when(col("abs_max") > 0, codes)
        .otherwise(transform(col(vecCol), _ => lit(0))))
      .withColumn("max_abs_err",
        when(col("abs_max") > 0,
          round(aggregate(
            zip_with(col(vecCol), col("codes"),
              (v, q) => abs(v.cast("double") - q.cast("double") * col("scale"))),
            lit(0.0), (acc, e) => greatest(acc, e)), 9))
          .otherwise(lit(0.0)))
  }
}
