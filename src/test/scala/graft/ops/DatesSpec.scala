package graft.ops

import java.time.{DayOfWeek, LocalDate}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DatesSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: walk (d1, d2] day by day. */
  private def brute(d1: LocalDate, d2: LocalDate): Long = {
    if (d2.isBefore(d1)) return -brute(d2, d1)
    Iterator.iterate(d1.plusDays(1))(_.plusDays(1))
      .takeWhile(!_.isAfter(d2))
      .count(d => d.getDayOfWeek != DayOfWeek.SATURDAY &&
        d.getDayOfWeek != DayOfWeek.SUNDAY)
      .toLong
  }

  test("businessDaysBetween matches the day-walk on 300 pseudorandom pairs") {
    val rng = new scala.util.Random(42)
    val pairs = (1 to 300).map { _ =>
      val a = LocalDate.of(1970, 1, 1).plusDays(rng.nextInt(25000))
      val b = a.plusDays(rng.nextInt(60) - 10) // includes negative spans
      (a.toString, b.toString)
    }
    val out = pairs.toDF("d1", "d2")
      .select(col("d1"), col("d2"),
        Dates.businessDaysBetween(col("d1").cast("date"), col("d2").cast("date"))
          .as("bd"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    out.foreach { case (a, b, got) =>
      val want = brute(LocalDate.parse(a), LocalDate.parse(b))
      assert(got == want, s"($a, $b]: got $got want $want")
    }
  }

  test("businessDaysBetween anchors: same day 0, Thu→Fri 1, Fri→Mon 1, full week 5") {
    def bd(a: String, b: String): Long =
      Seq((a, b)).toDF("a", "b")
        .select(Dates.businessDaysBetween(col("a").cast("date"),
          col("b").cast("date")))
        .head.getLong(0)
    assert(bd("1970-01-01", "1970-01-01") == 0L) // Thursday, empty interval
    assert(bd("1970-01-01", "1970-01-02") == 1L) // (Thu, Fri]
    assert(bd("1970-01-02", "1970-01-05") == 1L) // (Fri, Mon]: weekend skipped
    assert(bd("1970-01-05", "1970-01-12") == 5L) // (Mon, next Mon]
    assert(bd("1970-01-03", "1970-01-04") == 0L) // (Sat, Sun]
  }
}
