package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded random projection (Johnson-Lindenstrauss / Achlioptas
  * sign matrix): reduce an embedding column from `inDims` to `outDims`
  * with a ±1/√outDims projection matrix derived deterministically from
  * md5 — pairwise distances are preserved in expectation
  * (Achlioptas 2001, "Database-friendly random projections"), which is
  * what the downstream LSH / clustering tiers need from a cheap
  * dimensionality cut.
  *
  * The matrix is a SEED-DERIVED CONSTANT, not data: entry (j, i) is
  * +1 iff the first hex digit of md5("seed:j:i") ≥ '8' (an unbiased
  * coin — the digit's top bit), scaled by 1/√outDims. Any engine can
  * reproduce it from the seed alone, which is how the DuckDB oracle
  * cross-checks the whole derivation. The Spark side folds the matrix
  * in as nested array literals and projects with per-row higher-order
  * functions (zip_with → aggregate): ZERO shuffle at any corpus size,
  * O(inDims × outDims) multiply-adds per row.
  *
  * Float discipline: the fold is ascending-dimension sequential, and
  * each coordinate is rounded to 4 dp (sums of ~inDims terms carry
  * ~1e-14 engine noise — same convention as the LM scores).
  *
  * Output: (id, proj) with proj an `outDims`-long array of 4-dp
  * doubles. A vector whose length ≠ `inDims` poisons its row with
  * nulls (zip_with pads with null) rather than silently truncating.
  */
object Projection {

  private def md5FirstHex(s: String): Char = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    f"${d(0) & 0xff}%02x".charAt(0)
  }

  /** The ±1 sign matrix, outDims rows × inDims cols. */
  def signMatrix(outDims: Int, inDims: Int, seed: String): Seq[Seq[Double]] =
    (0 until outDims).map(j => (0 until inDims).map(i =>
      if (md5FirstHex(s"$seed:$j:$i") >= '8') 1.0 else -1.0))

  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      inDims: Int, outDims: Int, seed: String = "rp"): DataFrame = {
    require(outDims > 0 && inDims > 0, "dims must be positive")
    val signs = signMatrix(outDims, inDims, seed)
    val signLit: Column = array(signs.map(r => array(r.map(lit): _*)): _*)
    val scale = math.sqrt(outDims.toDouble)
    val vec = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("id"),
      transform(signLit, row =>
        round(
          aggregate(zip_with(vec, row, (x, s) => x * s), lit(0.0),
            (acc, x) => acc + x) / lit(scale),
          4)).as("proj"))
  }
}
