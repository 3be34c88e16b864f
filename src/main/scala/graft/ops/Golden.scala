package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Survivorship — the step after entity-resolution clustering: fuse
  * each cluster's members into one golden record, field by field.
  *
  * Everything is expressed as ordinary aggregate Columns over
  * `groupBy(cluster)`, so a golden-record build is ONE hash aggregate
  * regardless of field count — no per-field joins, no per-cluster
  * iteration, map-side partials for free.
  */
object Golden {

  /** The value of the member with the LOWEST `prio` among members
    * where `value` is non-null: min over (prio, value) structs, nulls
    * excluded. Callers make `prio` unique per member (e.g.
    * source_rank·K + record_id) so ties cannot flap between runs. */
  def pickByPriority(prio: Column, value: Column): Column =
    min(when(value.isNotNull, struct(prio.as("p"), value.as("v"))))
      .getField("v")
}
