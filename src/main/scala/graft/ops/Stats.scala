package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed statistics with ORACLE-EXACT semantics. The trap with
  * naive float aggregation is summation order: a double Σxy differs
  * run to run under shuffle, so closed-form regression over float sums
  * is not reproducible, let alone oracle-matchable. Here every SUM
  * runs over DECIMAL(18,2)-cast inputs — exact, order-independent —
  * and floats only appear AFTER aggregation, in a fixed expression
  * tree both engines evaluate identically (the same IEEE ops in the
  * same order on the same exact inputs). */
object Stats {

  /** Group-wise simple linear regression y = a·x + b via the closed
    * form over exact decimal moments. Output per group:
    * (group, n, slope_x1e6, intercept_x1e6) — fixed-point ×1e6 through
    * the floor(+0.5) convention shared with scale4. Groups with zero
    * x-variance (the denominator of the closed form = 0) emit null
    * slope/intercept rather than ±Inf. One aggregate pass: five
    * map-side-combined moments per group, nothing else. */
  def linregGroups(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val m = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
    // exact decimals → double ONCE, then a fixed IEEE expression tree
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val slope = when(den === 0.0, lit(null)).otherwise(num / den)
    val icept = when(den === 0.0, lit(null)).otherwise(
      (col("sy").cast("double") - (num / den) * col("sx").cast("double")) /
        col("n").cast("double"))
    m.select(col(groupCol), col("n"),
      floor(slope * lit(1000000d) + lit(0.5d)).cast("long").as("slope_x1e6"),
      floor(icept * lit(1000000d) + lit(0.5d)).cast("long").as("intercept_x1e6"))
  }

  /** Group-wise Pearson correlation via the same exact-moment recipe
    * as [[linregGroups]]: five DECIMAL-exact sums per group, then
    * r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)·(n·Σy² − Σy²)) in a
    * fixed IEEE tree, crossed as a ×1e6 fixed point. Zero variance on
    * either side → null (not NaN). One aggregate pass, map-side
    * combined — the built-in `corr` aggregates FLOATS and is
    * shuffle-order dependent; this is the reproducible form. */
  def corrGroups(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val m = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val n = col("n").cast("double")
    val num = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = n * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val r = when(vx <= 0.0 || vy <= 0.0, lit(null))
      .otherwise(num / sqrt(vx * vy))
    m.select(col(groupCol), col("n"),
      floor(r * lit(1000000d) + lit(0.5d)).cast("long").as("corr_x1e6"))
  }

  /** Chi-square test of independence between two categorical columns,
    * reproducible across engines: each cell's term
    *   (o·N − r·c)² / (r·c·N) · 1e4
    * is evaluated in doubles whose INPUTS are exact (all products of
    * counts stay under 2⁵³ for any realistic N), floored to a long
    * PER CELL, then integer-summed — the sum over cells is where
    * float order-dependence would creep in, and integers close that
    * door. Output: one row (n, dof, chi2_x1e4). Shape: one cell
    * aggregate + two broadcast marginal joins over the ≤|A|·|B|-row
    * cell table — the input scans once. */
  def chi2Independence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("a").agg(sum(col("o")).as("r"))
    val cb = cells.groupBy("b").agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("ka"), countDistinct(col("b")).as("kb"))
    val t = cells.join(broadcast(ra), Seq("a")).join(broadcast(cb), Seq("b"))
      .join(broadcast(n))
    val oN = col("o").cast("double") * col("n").cast("double")
    val rc = col("r").cast("double") * col("c").cast("double")
    val term = floor((oN - rc) * (oN - rc) * lit(10000d) /
      (rc * col("n").cast("double"))).cast("long")
    t.select(col("n"), col("ka"), col("kb"), term.as("term"))
      .groupBy("n", "ka", "kb")
      .agg(sum(col("term")).as("chi2_x1e4"))
      .select(col("n"), ((col("ka") - 1) * (col("kb") - 1)).as("dof"),
        col("chi2_x1e4"))
  }

  /** Group-wise median absolute deviation — the robust spread measure
    * (outlier-resistant where stddev is not). Two aggregate passes:
    * the group median, then the median of |x − median| with the tiny
    * per-group table broadcast back. The intermediate median is
    * FIXED-POINTED (scale4) before the deviations are computed — both
    * engines then derive deviations from the identical double
    * (med_x1e4 / 1e4), so the second interpolated percentile sees
    * bit-identical inputs and its own ulp wiggle is absorbed by the
    * final scale4, the same contract as `agg_percentiles`. */
  def madGroups(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    import graft.functions.F.scale4
    val med = df.groupBy(col(groupCol))
      .agg(scale4(expr(s"percentile($xCol, 0.5D)")).as("med_x1e4"))
    df.join(broadcast(med), Seq(groupCol))
      .withColumn("dev",
        abs(col(xCol) - col("med_x1e4").cast("double") / lit(10000d)))
      .groupBy(col(groupCol))
      .agg(first(col("med_x1e4")).as("med_x1e4"),
        scale4(expr("percentile(dev, 0.5D)")).as("mad_x1e4"))
  }

  /** Group-wise z-score outlier scoring. Moments (n, Σx, Σx²) are
    * DECIMAL-exact per group; the per-row score is the algebraically
    * cleared form z = (n·x − Σx) / sqrt(n·Σx² − (Σx)²) evaluated in
    * doubles AFTER aggregation — a fixed IEEE tree over exact inputs,
    * so both engines produce bit-identical doubles and the scale4
    * fixed point never knife-edges. The tiny per-group moment table
    * broadcasts back onto the rows (3–6 groups here; at 100 TB the
    * group count is what it is — a dimension-sized broadcast), so
    * scoring adds ZERO shuffles beyond the one aggregate.
    * Zero-variance groups emit null z rather than ±Inf.
    * `is_outlier` derives from the integer fixed point (|z|·1e4 >
    * threshold·1e4) — an integer compare, no float boundary. */
  def outlierScores(df: DataFrame, groupCol: String, xCol: String,
      thresholdX1e4: Long): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val m = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(x * x).as("sxx"))
    val joined = df.join(broadcast(m), Seq(groupCol))
    val num = col("n").cast("double") * col(xCol).cast("double") -
      col("sx").cast("double")
    // gate on the RADICAND, not the sqrt: a rounding-negative argument
    // must yield null in both engines, never sqrt(neg) = NaN
    val arg = col("n").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val z4 = when(arg <= 0.0, lit(null))
      .otherwise(floor(num / sqrt(arg) * lit(10000d) + lit(0.5d)).cast("long"))
    joined.withColumn("z_x1e4", z4)
      .withColumn("is_outlier",
        when(col("z_x1e4").isNull, lit(0))
          .otherwise((abs(col("z_x1e4")) > thresholdX1e4).cast("int")))
  }

  /** Equi-count bucket profile — SQL `ntile(k)` semantics (first
    * N mod k buckets get the extra row) WITHOUT the single-task global
    * window: the total order comes from [[Rank.globalRowNumber]]
    * (range-partitioned sort + zipWithIndex), the bucket id from the
    * ntile closed form over (rn, N), then one map-side-combined
    * aggregate per bucket. `tieCols` must complete a total order over
    * `xCol` or bucket boundaries are partition-order dependent.
    *
    * Output per bucket: row count, min/max of x (exact decimals), and
    * the exact decimal sum — the distribution profile a monitoring
    * pipeline wants from a 100 TB column without ever sorting it
    * through one executor. */
  def ntileProfile(df: DataFrame, xCol: String, tieCols: Seq[String],
      k: Int): DataFrame =
    ntileAssign(df, xCol, tieCols, k)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol).cast("decimal(18,2)")).as("x_min"),
        max(col(xCol).cast("decimal(18,2)")).as("x_max"),
        sum(col(xCol).cast("decimal(18,2)")).as("x_sum"))

  /** Per-row SQL-ntile bucket assignment with the same scale story:
    * range-partitioned rank, closed-form bucket id. Returns the input
    * columns (xCol + tieCols only) plus `bucket`. */
  def ntileAssign(df: DataFrame, xCol: String, tieCols: Seq[String],
      k: Int): DataFrame = {
    require(k > 0, s"ntileAssign: k must be positive, got $k")
    val ordered = Rank.globalRowNumber(
      df.select((xCol +: tieCols).map(col): _*),
      (xCol +: tieCols).map(col(_).asc), rankCol = "rn")
    val n = df.count()
    val base = n / k
    val rem = n % k
    // SQL ntile: bucket b ∈ [1, rem] spans (base+1) rows, the rest
    // base. Integer `div`, never `/` (long / long is DOUBLE division
    // in Spark). The when() guard keeps the base=0 (n<k) case out of
    // the zero-divisor branch.
    val bucket = when(lit(base == 0L) ||
        col("rn") <= lit(rem * (base + 1L)),
        expr(s"(rn - 1L) div ${base + 1L}L + 1L"))
      .otherwise(expr(s"${rem}L + (rn - 1L - ${rem * (base + 1L)}L) div ${base}L + 1L"))
    ordered.withColumn("bucket", bucket.cast("int")).drop("rn")
  }

  /** RFM segmentation off an already-aggregated per-entity table:
    * quartile-code each of the three metrics independently (SQL-ntile
    * semantics via [[ntileAssign]] — recency ascending so 1 = most
    * recent, frequency/monetary DESCENDING-by-negation so 1 = best),
    * then count entities per 3-digit cell. The three rank passes run
    * over the |entities| aggregate, never the fact table. */
  def rfmSegments(perEntity: DataFrame, idCol: String, recencyCol: String,
      freqCol: String, monetaryCol: String, k: Int = 4): DataFrame = {
    def assign(src: DataFrame, m: String, flip: Boolean, out: String) = {
      val base = if (flip) src.withColumn("_m", -col(m)) else
        src.withColumn("_m", col(m))
      ntileAssign(base.select(col(idCol), col("_m")), "_m", Seq(idCol), k)
        .select(col(idCol), col("bucket").as(out))
    }
    val r = assign(perEntity, recencyCol, flip = false, "r_q")
    val f = assign(perEntity, freqCol, flip = true, "f_q")
    val m = assign(perEntity, monetaryCol, flip = true, "m_q")
    r.join(f, idCol).join(m, idCol)
      .groupBy((col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
        .cast("int").as("rfm_code"))
      .agg(count(lit(1)).as("n_entities"))
  }

  /** ABC (Pareto) classification over an aggregated (entity, value)
    * table: descending cumulative share of the total (×1e4 integer),
    * A ≤ aX1e4, B ≤ bX1e4, C above. The running sum is a partitionless
    * window on the ALREADY-AGGREGATED entity table — dimension-sized,
    * orders below the fact table it summarizes (the same contract as
    * the cumulative-users gate); a truly fact-sized entity set would
    * swap in a two-phase per-partition prefix sum. valueCol must be an
    * integer fixed point so the shares divide exactly. */
  def abcClassify(perEntity: DataFrame, idCol: String, valueCol: String,
      aX1e4: Long = 8000L, bX1e4: Long = 9500L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(valueCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = perEntity.agg(sum(col(valueCol)).as("tot"))
    // Class membership is the RATIONAL comparison cum/tot ≤ a/10000,
    // cross-multiplied with the fraction REDUCED by gcd(a, 10000):
    // the original cum*10000 div tot formulation overflows INT64 once
    // the cumulative total passes ~9.2e14 — the sf1 standing gate
    // caught exactly that (DuckDB raised; a non-ANSI engine would
    // wrap silently and misclassify). With the default thresholds the
    // products are cum*5 and cum*20, good to totals ~4.6e17; the
    // overflow margin scales with 10000/gcd for custom thresholds.
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    def below(x1e4: Long) = {
      val g = gcd(x1e4, 10000L)
      col("cum") * lit(10000L / g) <= col("tot") * lit(x1e4 / g)
    }
    perEntity.join(broadcast(tot))
      .withColumn("cum", sum(col(valueCol)).over(w))
      .withColumn("abc_class",
        when(below(aX1e4), "A")
          .when(below(bX1e4), "B").otherwise("C"))
      .drop("cum", "tot")
  }
}
