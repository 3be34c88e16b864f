package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("round-trip: d2xy is the exact inverse of xy2d across the full signed domain") {
    val coords = Seq((0, 0), (1, 0), (0, 1), (-1, -1), (Int.MaxValue, Int.MinValue),
      (Int.MinValue, Int.MinValue), (Int.MaxValue, Int.MaxValue)) ++
      Seq.fill(500)((rnd.nextInt(), rnd.nextInt()))
    coords.foreach { case (a, b) =>
      val d = HilbertOps.xy2d(a, b)
      val (x, y) = HilbertOps.d2xy(d)
      val xb = (a ^ Int.MinValue).toLong & 0xffffffffL
      val yb = (b ^ Int.MinValue).toLong & 0xffffffffL
      assert((x, y) == ((xb, yb)), s"($a,$b) d=$d")
    }
  }

  test("continuity: consecutive curve positions are grid neighbors (no diagonal jumps)") {
    // sample random curve positions; step to d+1 and require L1 distance 1
    (1 to 300).foreach { _ =>
      val d = rnd.nextLong()
      if (d != Long.MaxValue) {
        val (x0, y0) = HilbertOps.d2xy(d)
        val (x1, y1) = HilbertOps.d2xy(d + 1)
        assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1L, s"d=$d")
      }
    }
  }

  test("signed sort order: keys order negatives below positives (bias correctness)") {
    val ks = Seq((-2, -2), (-1, -1), (0, 0), (1, 1), (2, 2)).map {
      case (a, b) => HilbertOps.xy2d(a, b)
    }
    // the four corners land in different curve quadrants; the key of
    // (MinValue, MinValue) must sort below (MaxValue, MaxValue)
    assert(HilbertOps.xy2d(Int.MinValue, Int.MinValue) <
      HilbertOps.xy2d(Int.MaxValue, Int.MaxValue))
    assert(ks.distinct.size == ks.size)
  }

  test("locality: a box predicate touches no more key-range chunks than Z-order") {
    // 64x64 grid, 16 equal chunks by key order; count chunks hit by a
    // 12x12 box under each curve — the file-skipping proxy
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    def chunksHit(key: (Int, Int) => Long): Int = {
      val ordered = pts.sortBy { case (x, y) => key(x, y) }
      val chunkSz = ordered.size / 16
      ordered.grouped(chunkSz).zipWithIndex.count { case (chunk, _) =>
        chunk.exists { case (x, y) => x >= 20 && x <= 31 && y >= 20 && y <= 31 }
      }
    }
    val h = chunksHit(HilbertOps.xy2d)
    val z = chunksHit(ZOrderOps.interleave)
    assert(h <= z, s"hilbert=$h zorder=$z")
    assert(h < 16) // the box must actually skip something
  }

  test("HilbertKey expression evaluates under codegen inside a projection") {
    val got = Seq((3, 5), (-7, 11)).toDF("a", "b")
      .select(HilbertKey(col("a"), col("b")).as("k"))
      .as[Long].collect()
    assert(got.toSeq == Seq(HilbertOps.xy2d(3, 5), HilbertOps.xy2d(-7, 11)))
  }
}
