package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two tiers:
  *  - `cosineTopK` — brute-force baseline: broadcast the (small) query
  *    set against the corpus; cosine via codegen'd higher-order array
  *    functions (zip_with + aggregate), no UDFs; per-query top-k via a
  *    window rank. Cost O(|q|·|corpus|) — correct for small |q|, the
  *    exact-recall baseline.
  *  - `ivfTopK` — the scale path: corpus pre-partitioned into coarse
  *    buckets (here the `label` column stands in for a trained k-means
  *    centroid assignment); each query searches only its own bucket, so
  *    cost drops to O(|q|·|corpus|/nbuckets) and the bucket join
  *    shuffles on the bucket key. With a real IVF the bucket id would
  *    be argmin-centroid, computed the same way.
  *
  * Cosines are emitted as floor-scaled 4-decimal fixed-point longs
  * (F.scale4) and ranked on the scaled value (ties → vec_id) so results
  * are stable across engines.
  */
object Ann {

  /** Sum of elementwise products in double precision (portable across
    * engines: each float is widened before multiply). */
  private def dotExpr(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  /** queries(qid, qe) × corpus(vec_id, ce) → top-k by cosine. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col("qid"), col("qe")))
    val joined = q.crossJoin(corpus.select(col("vec_id"), col("ce")))
    rankTopK(joined, k)
  }

  /** Bucket-restricted search: queries(qid, qe, bucket) ⋈ corpus(vec_id,
    * ce, bucket) on the bucket key, then per-query top-k. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10): DataFrame = {
    val joined = broadcast(queries.select(col("qid"), col("qe"), col("bucket")))
      .join(corpus.select(col("vec_id"), col("ce"), col("bucket")), Seq("bucket"))
    rankTopK(joined, k)
  }

  private def rankTopK(joined: DataFrame, k: Int): DataFrame = {
    val scored = joined.select(col("qid"), col("vec_id"),
      graft.functions.F.scale4(dotExpr("qe", "ce") /
        sqrt(dotExpr("qe", "qe") * dotExpr("ce", "ce"))).as("cos_x1e4"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cos_x1e4"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
