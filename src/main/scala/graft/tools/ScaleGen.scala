package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale replica of a testdata directory, for the scale-proof
  * bench leg: every SF-scaled table is unioned 10 times with re-keyed
  * ids; the fixed-size dimensions (region, nation — constant at any
  * TPC-H SF) are copied as-is.
  *
  * Re-keying adds `replica × 10^12` to every key column of a scaled
  * table — the SAME offset for every key domain, so foreign keys stay
  * consistent across tables (orders replica i references customer
  * replica i).
  *
  * Document TEXT is replica-MUTATED, not copied: replica i > 0
  * prefixes every whitespace token with `r<i>x`. Verbatim replication
  * (rounds ≤7) gave every doc 9 exact duplicates, so the near-dup
  * legs' 10× ratios measured the duplicate factor (cross-replica
  * copies collide in every MinHash/SimHash band — base candidate
  * pairs inflate ~Factor², the r7 driver recorded minhash_lsh at
  * 17.8×), not operator scaling. Appending one token would NOT fix
  * this: for any non-trivial doc one extra shingle leaves Jaccard ≈ 1
  * and the replicas still collide. Token-prefixing destroys
  * cross-replica shingle overlap entirely while mapping intra-replica
  * edits 1:1 — each replica keeps exactly the base corpus's near-dup
  * structure, so a 10× corpus carries 10× the dedup workload and the
  * leg's ratio reads directly as operator scaling. Exact-dup structure
  * moves the same way (replicas are distinct rows now), so the exact
  * tier legs also measure 10× distinct groups. Embeddings still
  * replicate verbatim (vector payloads have no banding-verify stage;
  * over-dense LSH buckets are dropped by construction).
  *
  * The mutation PRESERVES the scoring-token vocabulary: stopwords and
  * language markers ([[PreservedTokens]] — the exact lists
  * `Curation.Stopwords` and `TextAnalysis.LangMarkers` count) keep
  * their surface form, every other token is prefixed, and the FIRST
  * token is prefixed unconditionally (so no two replicas of a doc are
  * ever byte-identical — the exact-dedup legs keep 10× distinct
  * groups). Rounds ≤9 prefixed every token, which zeroed every
  * stopword/langid hit in replicas 1-9: ~90% of the 10× corpus scored
  * stop_ratio 0 / lang 'und', so quality-filter and langid legs ran
  * against base-sized survivor sets and their ratios read as
  * scan-scaling only. With the whitelist, stop_ratio and language
  * scores survive per replica (up to the one first-token hit), so
  * those legs' 10× ratios are survivor-proportional again. The cost:
  * k-grams composed ENTIRELY of whitelist tokens stay shared across
  * replicas — a vanishing slice of the shingle space (the whitelist
  * is ~30 function words; any shingle containing one content token is
  * still mutated), bounded in practice by the ngram maxDf cap and by
  * band verification, and pinned small by ScaleGenSpec. Mutation is
  * CONTENT-keyed (same token maps to the same mutated form everywhere
  * in a replica, position-independent except the first token), so
  * intra-replica shingle equality — the near-dup structure the dedup
  * legs measure — is preserved 1:1.
  *
  * The replica is generated ONCE into a content-addressed cache dir
  * (keyed by source dir name) with a completion marker; a crashed
  * generation is re-done from scratch.
  */
object ScaleGen {

  val Factor = 10
  val KeyOffset = 1000000000000L // > any base key in any domain

  /** bump when the generation logic changes shape (it is part of the
    * cache key — a cached replica from an older generator must not be
    * reused; v2 = replica-mutated document text, v3 = whitelist-
    * preserving mutation)
    */
  val GenVersion = 3

  /** Tokens the replica mutation leaves intact: exactly the lists the
    * quality/langid operators count, so their statistics survive the
    * 10× replication (see the class scaladoc).
    */
  val PreservedTokens: Seq[String] =
    (graft.ops.Curation.Stopwords ++
      graft.ops.TextAnalysis.LangMarkers.flatMap(_._2)).distinct

  /** scaled tables → their key columns (offset per replica) */
  val ScaledKeys: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  val FixedTables: Seq[String] = Seq("region", "nation")

  /** cache key includes a fingerprint of the source listing (names +
    * lengths), so a regenerated source dir gets a fresh replica
    * instead of silently benching stale data
    */
  private[tools] def srcFingerprint(srcDir: String): String = {
    val files = Option(new java.io.File(srcDir).listFiles()).getOrElse(Array())
      .flatMap { f =>
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array())
            .map(g => s"${f.getName}/${g.getName}:${g.length()}")
        else Array(s"${f.getName}:${f.length()}")
      }.sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(files.getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Generate (or reuse) the 10× replica of `srcDir`; returns its path.
    *
    * The session must have `spark.sql.legacy.parquet.nanosAsLong=true`:
    * the driver has shipped events.parquet as TIMESTAMP(NANOS) in some
    * rounds (the raw scan below throws on those without the conf) and
    * TIMESTAMP(MICROS) in others (where the conf is a no-op) — Bench's
    * session always sets it. Columns replicate as whatever physical
    * type the source carries; readers normalize via Tables.events. A
    * generation that dies mid-way leaves no `_COMPLETE` marker and is
    * re-done from scratch.
    */
  def ensure10x(spark: SparkSession, srcDir: String): String = {
    require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .contains("true"),
      "ScaleGen needs spark.sql.legacy.parquet.nanosAsLong=true " +
        "(events.parquet may carry TIMESTAMP(NANOS))")
    val prefix = s"graft-scale${Factor}x-${new java.io.File(srcDir).getName}"
    val dst = s"/tmp/$prefix-v$GenVersion-${srcFingerprint(srcDir)}"
    val marker = java.nio.file.Paths.get(dst, "_COMPLETE")
    if (java.nio.file.Files.exists(marker)) return dst
    // a changed source means the old replica will never be read again —
    // drop stale siblings (same source, other fingerprints) so /tmp
    // holds at most one replica per source across rounds. Only
    // known-superseded siblings (_COMPLETE present) or abandoned ones
    // (no marker AND untouched for an hour) are deleted: a sibling
    // with no marker but a recent mtime may be another process's
    // in-progress generation, and deleting it mid-write would hand
    // that process a corrupt dataset. `.tmp-<pid>` trees are NEVER
    // swept here regardless of age: a directory's mtime only moves
    // when direct children appear, so a concurrent process mid-way
    // through one long table write looks idle for longer than any
    // cutoff — deleting its live tmp tree could let it commit a
    // replica missing earlier tables. Each process deletes only its
    // OWN tmp tree (below); abandoned ones from crashed runs are
    // bounded at one dir per pid and /tmp is wiped on reboot anyway.
    val staleCutoff = System.currentTimeMillis() - 60L * 60 * 1000
    Option(new java.io.File("/tmp").listFiles()).getOrElse(Array())
      .filter(f => (f.getName == prefix || // pre-fingerprint layout
        f.getName.startsWith(prefix + "-")) && f.toString != dst)
      .filter(f => !f.getName.contains(".tmp-"))
      .filter(f => new java.io.File(f, "_COMPLETE").exists() ||
        f.lastModified() < staleCutoff)
      .foreach(delete)
    // generate into a PROCESS-UNIQUE temp sibling, then atomically
    // rename into place: two processes racing ensure10x on the same
    // source (same dst — the likeliest collision) each build their own
    // tree, and whoever renames first wins; the loser's rename fails,
    // it deletes its temp tree and uses the winner's marked replica.
    // Writing into dst directly would let one process delete the
    // other's half-written tree and then commit _COMPLETE over
    // interleaved output — cached forever.
    val tmp = s"$dst.tmp-${java.lang.ProcessHandle.current().pid()}"
    val tmpDir = new java.io.File(tmp)
    if (tmpDir.exists()) delete(tmpDir)
    FixedTables.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.option("compression", "zstd").parquet(s"$tmp/$t.parquet")
    }
    ScaledKeys.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$srcDir/$t.parquet")
      replicate(base, keys, mutateText = MutatedText.get(t))
        .write.option("compression", "zstd").parquet(s"$tmp/$t.parquet")
    }
    java.nio.file.Files.createFile(java.nio.file.Paths.get(tmp, "_COMPLETE"))
    val dstDir = new java.io.File(dst)
    // an unmarked dst here is a pre-rename-era leftover or a crashed
    // direct write — never a live generation (those are under .tmp-*)
    if (dstDir.exists() && !java.nio.file.Files.exists(marker)) delete(dstDir)
    try java.nio.file.Files.move(tmpDir.toPath, dstDir.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileSystemException =>
      // lost the race — a concurrent process renamed its replica in
      delete(tmpDir)
      if (!java.nio.file.Files.exists(marker))
        sys.error(s"replica rename failed and no complete replica at $dst")
    }
    dst
  }

  /** text columns to replica-mutate (see the class scaladoc) */
  val MutatedText: Map[String, String] = Map("documents" -> "text")

  def replicate(base: DataFrame, keys: Seq[String],
      mutateText: Option[String] = None,
      factor: Int = Factor): DataFrame =
    (0 until factor).map { i =>
      val keyed = keys.foldLeft(base)((df, k) =>
        df.withColumn(k, (col(k) + lit(i.toLong * KeyOffset)).cast("long")))
      mutateText match {
        case Some(c) if i > 0 =>
          // prefix every non-whitelisted token with the replica tag
          // (first token unconditionally): kills cross-replica shingle
          // overlap for any shingle containing a content token, while
          // preserving intra-replica near-dup structure token-for-token
          // AND the stopword/langid statistics the quality legs gate on
          keyed.withColumn(c, array_join(
            transform(split(col(c), " "), (t, idx) =>
              when(idx === 0 || !t.isin(PreservedTokens: _*),
                concat(lit(s"r${i}x"), t)).otherwise(t)), " "))
        case _ => keyed
      }
    }.reduce(_ unionByName _)

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
