package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module's contribution to the driver contract: named queries plus
  * (where SQL-expressible) a DuckDB oracle per query.
  *
  * Contract invariants (driver compares after sorting columns by name):
  *  - every query's output column names match the oracle's aliases;
  *  - every query ends in a total ORDER BY mirrored in the oracle, so
  *    hashes are stable regardless of whether the driver sorts rows;
  *  - no raw double arithmetic crosses the engine/oracle boundary —
  *    sums go through decimal casts, floats are rounded.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
