package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.packs._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries and oracles are contributed per-module via QueryPack; this
  * object is only the aggregation point. Query name prefixes double as
  * the SURVEY §2 coverage map (compare_ = J1-J4/A1/A5/R1, mask_ =
  * §2.10, pattern_ = F1-F3/A2-A3, dedup_ / ann_ / text_ = the
  * LLM-pipeline extensions).
  */
object SparkEntry {

  val packs: Seq[QueryPack] = Seq(
    ComparePack,
    RelationalPack,
    MaskPack,
    SourcesPack,
    PatternsPack,
    DedupPack,
    LlmPack,
    CurationPack,
    FormatsPack,
    PolicyPack,
    ExtrasPack,
    TpchPack,
    TpchCompletePack,
    TimeSeriesPack,
    InsightsPack,
    CoveragePack,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the Compare engine end-to-end (diff → summary). */
  def entry(spark: SparkSession): DataFrame =
    ComparePack.queries("compare_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
