package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - `bruteForceTopK`: exact cosine top-k. Query side broadcast, one
  *     pass over the corpus, per-query top-k via window. This is the
  *     correctness baseline and is already 100 TB-shaped for small
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

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for the query rows (qid, qe). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.crossJoin(broadcast(queries))
      .where(col(idCol) =!= col("qid"))
      .withColumn("cosine", round(cosine(col("qe"), col(vecCol)), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col(idCol))))
      .where(col("rk") <= k)
      .select(col("qid"), col(idCol), col("cosine"), col("rk").cast("long").as("rk"))

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * +1 if the first hex digit of md5("p:i") is ≥ 8 else -1. Distinct
    * `table` seeds give independent hash tables.
    */
  private def planeWeight(plane: Int, dim: Column, table: Int = 0): Column = {
    val seed = if (table == 0) s"$plane:" else s"t$table:$plane:"
    when(substring(md5(concat(lit(seed), dim.cast("string")).cast("binary")), 1, 1)
      .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1.0).otherwise(-1.0)
  }

  /** `planes`-bit signature of a vector: bit p = sign(Σ_i w(p,i)·v_i). */
  def lshBucket(vecCol: Column, planes: Int, table: Int = 0): Column = {
    val projections = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vecCol, sequence(lit(1), size(vecCol)),
          (v, i) => v.cast("double") * planeWeight(p, i, table)),
        lit(0.0), (acc, v) => acc + v)
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
    candidates
      .withColumn("cosine", round(cosine(col("qe"), col(vecCol)), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col(idCol))))
      .where(col("rk") <= k)
      .select(col("qid"), col(idCol), col("cosine"), col("rk").cast("long").as("rk"))
  }

  /** IVF-style ANN: assign every vector to its nearest of `nlist`
    * fixed coarse centroids (here: the first `nlist` corpus vectors,
    * deterministic — production would k-means them; the assignment/
    * probe shape is identical), then score queries only against the
    * `nprobe` closest inverted lists. The corpus pass is one broadcast
    * join + argmax; the probe turns the cross join into an equi-join
    * on list id — at 100 TB the inverted lists are the shuffle key.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 10, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("ce"))
    // nearest centroid per corpus vector (ties → lowest cid)
    val assigned = corpus.crossJoin(broadcast(cents))
      .withColumn("csim", round(cosine(col("ce"), col(vecCol)), 6))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("cid"))))
      .where(col("crk") === 1)
      .select(col(idCol), col(vecCol), col("cid"))
    // nprobe nearest centroids per query
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("csim", round(cosine(col("ce"), col("qe")), 6))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))))
      .where(col("crk") <= nprobe)
      .select(col("qid"), col("qe"), col("cid"))
    assigned.join(broadcast(probes), Seq("cid"))
      .where(col(idCol) =!= col("qid"))
      .withColumn("cosine", round(cosine(col("qe"), col(vecCol)), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col(idCol))))
      .where(col("rk") <= k)
      .select(col("qid"), col(idCol), col("cosine"), col("rk").cast("long").as("rk"))
  }

  /** Embedding near-duplicate pairs: all (a < b) pairs with cosine ≥
    * threshold, discovered through LSH buckets (same-bucket pairs only,
    * so the quadratic blowup is bounded per bucket) and verified with
    * the exact cosine. The scale path for "drop semantically duplicate
    * documents by their embeddings".
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double, planes: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = corpus
      .select(col(idCol), col(vecCol), lshBucket(col(vecCol), planes).as("bucket"))
    val a = bucketed.select(col(idCol).as("a"), col(vecCol).as("va"), col("bucket"))
    val b = bucketed.select(col(idCol).as("b"), col(vecCol).as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .where(col("a") < col("b"))
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
    bucketed.join(broadcast(qb),
        col("bucket") === col("qbucket") && col(idCol) =!= col("qid"))
      .withColumn("cosine", round(cosine(col("qe"), col(vecCol)), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col(idCol))))
      .where(col("rk") <= k)
      .select(col("qid"), col(idCol), col("cosine"), col("rk").cast("long").as("rk"))
  }
}
