package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** IVF quality + determinism. The shared `embeddings` fixture is
  * isotropic (no cluster structure — worst case for any partitioned
  * ANN), so the recall gate here uses a separable synthetic corpus:
  * 10 well-separated centers with small noise, the regime real
  * embedding corpora live in. */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val nClusters = 10
  private val perCluster = 50

  /** Deterministic clustered corpus: center c = ±1 pattern per cluster,
    * members = center + N(0, 0.15) noise. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(nClusters, dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val v = centers(c).map(x => x + 0.15f * rnd.nextGaussian().toFloat)
      ((c * perCluster + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "ce")
  }

  test("IVF recall >= 0.9 on clustered embeddings (nprobe=2, 10 buckets)") {
    val corpus = clustered
    val cent = Ann.ivfCentroids(corpus, nClusters, iters = 2).cache()
    val q = corpus.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("ce").as("qe"))
    val ivf = Ann.ivfTopK(q, corpus, cent, k = 10, nprobe = 2)
    val brute = Ann.cosineTopK(q, corpus, k = 10)
    val rec = Ann.recallVsBrute(ivf, brute, k = 10)
      .agg(avg(col("recall_x1e4"))).head().getDouble(0) / 10000.0
    assert(rec >= 0.9, s"avg recall $rec < 0.9")
  }

  test("centroid build is deterministic and buckets partition the corpus") {
    val corpus = clustered
    val c1 = Ann.ivfCentroids(corpus, nClusters, iters = 2).orderBy("cid").collect()
    val c2 = Ann.ivfCentroids(corpus, nClusters, iters = 2).orderBy("cid").collect()
    assert(c1.map(_.toString).toSeq == c2.map(_.toString).toSeq)
    assert(c1.length <= nClusters && c1.nonEmpty)
    val assigned = Ann.assignBuckets(corpus, Ann.ivfCentroids(corpus, nClusters, iters = 2))
    assert(assigned.count() == nClusters.toLong * perCluster) // every vector exactly once
    assert(assigned.select("bucket").distinct().count() > 1)
  }

  test("Lloyd refinement recovers the true clusters (members co-bucketed)") {
    val corpus = clustered
    val cent = Ann.ivfCentroids(corpus, nClusters, iters = 2)
    // purity: fraction of vectors whose bucket equals their true
    // cluster's majority bucket — near 1.0 when Lloyd converged.
    val withTrue = Ann.assignBuckets(corpus, cent)
      .withColumn("truec", (col("vec_id") / perCluster).cast("int"))
    val majority = withTrue.groupBy("truec", "bucket").count()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("truec").orderBy(desc("count"), asc("bucket"))))
      .filter(col("rn") === 1).select(col("truec"), col("bucket").as("mb"))
    val pure = withTrue.join(majority, Seq("truec"))
      .agg(avg(when(col("bucket") === col("mb"), 1.0).otherwise(0.0))).head().getDouble(0)
    assert(pure >= 0.9, s"cluster purity $pure < 0.9")
  }
}
