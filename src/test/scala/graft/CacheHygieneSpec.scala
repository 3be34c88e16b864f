package graft

import org.apache.spark.sql.graftshim.ExprShim

/** Cache-lifecycle gate (VERDICT r14 task 3): no registered query may
  * leave a relation pinned in the session CacheManager after its
  * action completes. Shared intermediates (shingle relations,
  * retrieval pools, contingency tables, fixpoint generations) are
  * legitimate to cache DURING a query's materializing run — the leak
  * this spec kills is the cache that outlives the run, which in a
  * long-lived session accumulates MEMORY_AND_DISK relations nothing
  * can release except a hostile session-wide clearCache().
  *
  * Enforced two ways: behaviorally (run every query whose family uses
  * caching, then assert the CacheManager is empty) and statically (the
  * pack sources must not call persist/cache directly — scoped
  * lifecycles go through core.Materialize or a library with* entry
  * point). */
class CacheHygieneSpec extends SparkSpec {

  /** Every query whose implementation (pack or library) historically
    * persisted a relation: the dedup/LSH family, cluster resolution,
    * embedding near-dup, NB training, MMR, STL anomalies, pointer
    * doubling, PageRank, the t-closeness audit, XML schema sampling,
    * and the streaming moments gate. */
  private val affected = Seq(
    "dedup_minhash", "dedup_clusters", "dedup_apply",
    "dedup_keeper_quality", "dedup_cluster_sizes", "dedup_cross_corpus",
    "dedup_prefix_pairs", "dedup_blocking_metrics",
    "text_ngram_jaccard", "text_ngram_containment",
    "dedup_embedding", "text_nb_classify", "search_mmr_rerank",
    "events_anomaly_stl", "hierarchy_rollup", "curation_domain_authority",
    "llm_pipeline_full", "mask_t_closeness", "xml_autodetect",
    "events_anomaly_stream", "dedup_minhash_recall")

  test("no query leaves relations cached after its action") {
    spark.catalog.clearCache()
    affected.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        fail(s"CacheHygieneSpec: unknown query '$name'"))
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      assert(ExprShim.cacheIsEmpty(spark),
        s"query '$name' left relations in the CacheManager after its action")
    }
  }

  test("pack sources never call cache-persisting APIs directly") {
    val packDir = new java.io.File("src/main/scala/graft/packs")
    assert(packDir.isDirectory, s"missing ${packDir.getAbsolutePath}")
    val offenders = packDir.listFiles().filter(_.getName.endsWith(".scala"))
      .flatMap { f =>
        val src = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        src.linesIterator.zipWithIndex.collect {
          case (line, i) if (line.contains(".persist(") ||
            line.contains(".cache(")) && !line.trim.startsWith("//") =>
            s"${f.getName}:${i + 1}: ${line.trim}"
        }
      }
    assert(offenders.isEmpty,
      "direct persist/cache in packs (use core.Materialize or a " +
        s"library with* entry point):\n${offenders.mkString("\n")}")
  }
}
