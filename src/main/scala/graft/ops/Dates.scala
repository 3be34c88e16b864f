package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Business-calendar arithmetic as CLOSED-FORM integer expressions —
  * no generated calendar table, no UDF, no per-day loop: a weekday
  * count between two dates is O(1) arithmetic on epoch days, stays
  * inside whole-stage codegen, and is trivially mirrored in ANSI SQL
  * for the oracle.
  *
  * Anchor: epoch day 0 = 1970-01-01 = THURSDAY. For r = e mod 7 the
  * first r days of a week starting Thursday contain
  * [0,1,2,2,2,3,4][r] weekdays (Thu,Fri count; Sat,Sun don't; then
  * Mon,Tue add one each — Wed lands at r=7 in the next full week).
  * Valid for e ≥ 0, i.e. any date ≥ 1970-01-01 (all TPC-H dates).
  */
object Dates {

  /** Number of weekdays (Mon–Fri) among epoch days [0, e). Column `/`
    * on longs is DOUBLE division in Spark, so the full-week term casts
    * back to long — exact because (e − r) is a multiple of 7 and
    * 5·e ≪ 2^52 for any representable date. */
  def weekdaysBeforeEpochDay(e: Column): Column = {
    val r = e % 7
    (lit(5L) * (e - r) / lit(7L)).cast("long") +
      element_at(array(lit(0L), lit(1L), lit(2L), lit(2L), lit(2L),
        lit(3L), lit(4L)), (r + 1).cast("int"))
  }

  /** Weekdays in the half-open interval (d1, d2] — "how many business
    * days did the handoff take", exclusive of the start date so a
    * same-day handoff is 0. Negative if d2 < d1 (symmetric). */
  def businessDaysBetween(d1: Column, d2: Column): Column = {
    val epoch = lit("1970-01-01").cast("date")
    val e1 = datediff(d1, epoch).cast("long")
    val e2 = datediff(d2, epoch).cast("long")
    (weekdaysBeforeEpochDay(e2 + 1) - weekdaysBeforeEpochDay(e1 + 1))
      .cast("long")
  }
}
