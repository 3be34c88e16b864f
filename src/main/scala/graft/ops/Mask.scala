package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** The masking pipeline composite (SURVEY §2.10; reference
  * `buildMaskedSheets`, app/(contents)/random/page.tsx:350-401).
  *
  * A sheet-level rule map compiles to one `select` of Column
  * expressions — a single narrow pass, no shuffle. The recovery sidecar
  * (`ANON__KEY_{sheet}`) is a projection of the same input, so a cached
  * input is scanned once at most twice; both outputs are pure column
  * transforms and stay inside whole-stage codegen.
  *
  * Departure from the reference (documented in F's scaladoc): all
  * "random" values are keyed-deterministic functions of
  * (row key, seed, field tag) — idempotent under task retries at 100 TB
  * and exactly reproducible by the DuckDB oracle.
  */
object Mask {

  /** Fill alphabets (reference fillByKind, random/page.tsx:59-87). */
  sealed trait FillKind
  case object Alnum extends FillKind
  case object Letters extends FillKind
  case object Digits extends FillKind

  /** Per-field masking rules (reference FieldRule, random/page.tsx:35-53). */
  sealed trait MaskRule
  /** F14: value → ''. */
  case object Blank extends MaskRule
  /** F9/F16: fixedPart + pseudo-random fill to target length
    * (strLen, else the source value's length, else 8). */
  case class RandomString(fixedPart: String = "", strLen: Option[Int] = None,
      fill: FillKind = Alnum) extends MaskRule
  /** F8: uniform integer in [min, max]. */
  case class RandomInt(min: Long, max: Long) extends MaskRule
  /** F15: digit-width mode — fixed digits + random digits to the target
    * width (strLen, else source length). */
  case class RandomDigits(fixedPart: String = "", strLen: Option[Int] = None)
      extends MaskRule
  /** F13: uniform date in [start, end]; fixedPart `YYYY` or `YYYY-MM`
    * narrows the range (reference random/page.tsx:216-235). */
  case class RandomDate(start: String, end: String, fixedPart: String = "")
      extends MaskRule
  /** F10-F12, F6. */
  case object FakeName extends MaskRule
  case class FakeEmail(fixedPart: String = "", fillLen: Int = 6) extends MaskRule
  case class FakePhone(fixedPart: String = "") extends MaskRule
  case object Sha256 extends MaskRule

  val AnonRowId = "ANON_ROW_ID"

  /** Resolve RandomDate's fixedPart narrowing to a concrete range. */
  def dateRange(r: RandomDate): (String, String) = r.fixedPart match {
    case y if y.matches("""\d{4}""") => (s"$y-01-01", s"$y-12-31")
    case ym if ym.matches("""\d{4}-\d{2}""") =>
      val first = java.time.LocalDate.parse(s"$ym-01")
      (first.toString, first.withDayOfMonth(first.lengthOfMonth).toString)
    case _ => (r.start, r.end)
  }

  /** Compile one rule into the masked Column for `field`. */
  def compile(rule: MaskRule, key: Column, seed: String, field: String,
      src: Column): Column = rule match {
    case Blank => lit("")
    case RandomString(fixed, strLen, fill) =>
      val target = strLen.map(n => lit(n).cast("int"))
        .getOrElse(coalesce(length(src), lit(8)))
      val fillLen = greatest(target - lit(fixed.length), lit(0))
      val stream = fill match {
        case Alnum => F.maskAlnum(key, seed, field, 64)
        case Letters => F.maskLetters(key, seed, field, 64)
        case Digits => F.maskDigits(key, seed, field, 64)
      }
      concat(lit(fixed), stream.substr(lit(1), fillLen))
    case RandomInt(min, max) => F.maskInt(key, seed, field, min, max)
    case RandomDigits(fixed, strLen) =>
      val fixedDigits = fixed.filter(_.isDigit)
      val target = strLen.map(n => lit(n).cast("int"))
        .getOrElse(coalesce(length(src), lit(8)))
      val fillLen = greatest(target - lit(fixedDigits.length), lit(0))
      concat(lit(fixedDigits), F.maskDigits(key, seed, field, 64).substr(lit(1), fillLen))
    case rd: RandomDate =>
      val (s0, e0) = dateRange(rd)
      F.maskDate(key, seed, field, s0, e0)
    case FakeName => F.fakeName(key, seed)
    case FakeEmail(fixed, n) => F.fakeEmail(key, seed, fixed, n)
    case FakePhone(fixed) => F.fakePhone(key, seed, fixed)
    case Sha256 => F.sha256Hex(src)
  }

  /** Masked sheet + recovery sidecar. */
  case class MaskedSheet(masked: DataFrame, keys: DataFrame)

  /** Apply a rule map to one sheet.
    *
    * `masked`: every ruled field replaced by its mask; `ANON_ROW_ID`
    * appended when ≥1 rule exists (the reference allocates it only for
    * rows where a rule fired — with a non-empty rule map that is every
    * row, since rules fire unconditionally per ruled field).
    * `keys`: `ANON_ROW_ID` + the original values of every ruled field
    * (reference random/page.tsx:375-396). */
  def apply(df: DataFrame, keyField: String, seed: String,
      rules: Seq[(String, MaskRule)]): MaskedSheet = {
    val key = col(keyField)
    val ruled = rules.map(_._1)
    val maskedCols = df.columns.toSeq.map { c =>
      rules.find(_._1 == c) match {
        case Some((_, r)) => compile(r, key, seed, c, col(c)).as(c)
        case None => col(c)
      }
    }
    val anonId = F.maskUuid(key, seed).as(AnonRowId)
    val masked =
      if (rules.isEmpty) df
      else df.select(maskedCols :+ anonId: _*)
    val keys =
      if (rules.isEmpty) df.sparkSession.emptyDataFrame
      else df.select(F.maskUuid(key, seed).as(AnonRowId) +: ruled.map(col): _*)
    MaskedSheet(masked, keys)
  }

  /** k-anonymity audit — the check that belongs NEXT TO masking: after
    * direct identifiers are masked, quasi-identifier combinations can
    * still single people out. One hash aggregate over the quasi
    * columns; each combination reports its group size and whether it
    * violates the `k` floor. The release decision (suppress/
    * generalize violating groups) is the caller's — this is the audit,
    * not the fix. Map-side partial aggregation collapses the heavy
    * combinations, so the shuffle carries one row per distinct
    * combination, not per person. */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymity: at least one quasi-identifier column")
    require(k >= 2, s"kAnonymity: k=$k must be >= 2")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(quasi.map(col) :+ col("n") :+ (col("n") < k).as("violates"): _*)
  }

  /** l-diversity audit — k-anonymity's required companion: a group can
    * be k-large yet still leak when every member shares one sensitive
    * value (the homogeneity attack). Per quasi-identifier combination,
    * count distinct sensitive values and flag groups below the `l`
    * floor. Same one-aggregate shape as [[kAnonymity]]: the shuffle
    * carries one row per distinct (quasi, sensitive) combination (the
    * distinct count collapses map-side first), never per person. */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String,
      l: Long): DataFrame = {
    require(quasi.nonEmpty, "lDiversity: at least one quasi-identifier column")
    require(!quasi.contains(sensitive),
      s"lDiversity: sensitive column '$sensitive' cannot also be a quasi-identifier")
    require(l >= 2, s"lDiversity: l=$l must be >= 2")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("n_sensitive"))
      .select(quasi.map(col) ++ Seq(col("n"), col("n_sensitive"),
        (col("n_sensitive") < l).as("violates")): _*)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third leg of the release-audit trio: l-diversity still leaks when a
    * group's sensitive values are diverse but SKEWED relative to the
    * whole table (everyone in the cohort is "poor" vs a mixed corpus).
    * For an ORDERED sensitive attribute the distance is the Earth
    * Mover's / Kantorovich distance, which on ordered bins reduces to
    * the mean absolute difference of cumulative distributions:
    * t = (1/(m-1)) * Σ_j |P_cum(j) − Q_cum(j)|.
    *
    * All arithmetic is exact-integer: with group size n, table size N,
    * and cumulative COUNTS A_j (group) and G_j (global),
    * |A_j/n − G_j/N| = |A_j·N − G_j·n| / (n·N), so
    * t_x1e6 = Σ_j |A_j·N − G_j·n| · 1e6 div (n·N·(m−1)) — no doubles
    * cross the oracle boundary. Long headroom: the numerator is bounded
    * by (m−1)·n·N ≤ 20·rows², fine through sf1; a petabyte deployment
    * swaps the products to DECIMAL(38,0), same plan.
    *
    * Plan shape: ONE scan of `df` into ONE (quasi, bin) hash aggregate;
    * the global marginal and the group totals are second-stage
    * aggregates of that (bin-level, tiny); the dense group×bin grid is
    * a broadcast of the m-row bin list; cumulatives are a window over m
    * rows per group off the same quasi-key exchange. Nothing after the
    * first aggregate is proportional to people — only to distinct
    * (quasi, bin) combinations. */
  def tCloseness(df: DataFrame, quasi: Seq[String], sensitive: String,
      tX1e6: Long): DataFrame = {
    require(quasi.nonEmpty, "tCloseness: at least one quasi-identifier column")
    require(!quasi.contains(sensitive),
      s"tCloseness: sensitive column '$sensitive' cannot also be a quasi-identifier")
    val qc = quasi.map(col)
    // One pass over people; everything below works on this contingency
    // table. The table feeds THREE consumers (group totals, global
    // marginal, dense grid) — persist it so the person-level scan runs
    // once, not three times (plan-audited: one base scan).
    val gb = df.groupBy(qc :+ col(sensitive): _*).agg(count(lit(1)).as("a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = gb.groupBy(qc: _*).agg(sum(col("a")).as("n"))
    // Global ordered marginal with cumulative counts; m bins, broadcast.
    val globW = org.apache.spark.sql.expressions.Window
      .orderBy(sensitive).rowsBetween(Long.MinValue, 0)
    val glob = gb.groupBy(col(sensitive)).agg(sum(col("a")).as("g"))
      .withColumn("g_cum", sum(col("g")).over(globW))
      .withColumn("n_total", sum(col("g")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("m_bins", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    // Dense grid: every group × every bin (absent bins count 0).
    val grid = groups.crossJoin(broadcast(glob))
      .join(gb, quasi :+ sensitive, "left").na.fill(0L, Seq("a"))
    val grpW = org.apache.spark.sql.expressions.Window
      .partitionBy(qc: _*).orderBy(sensitive).rowsBetween(Long.MinValue, 0)
    val scored = grid.withColumn("a_cum", sum(col("a")).over(grpW))
      .groupBy(qc :+ col("n") :+ col("n_total") :+ col("m_bins"): _*)
      .agg(sum(abs(col("a_cum") * col("n_total") - col("g_cum") * col("n")))
        .as("emd_num"))
      .select(qc ++ Seq(col("n"),
        // m_bins=1 ⇒ numerator is structurally 0; greatest() avoids div-0.
        expr("emd_num * 1000000L div (n * n_total * greatest(m_bins - 1, 1L))")
          .as("t_x1e6")): _*)
      .withColumn("violates", col("t_x1e6") > tX1e6)
    // group-sized audit result: materialize once, release the
    // contingency-table cache with it (nothing stays pinned after)
    graft.core.Materialize.drained(scored, gb)
  }

  /** Exact integer CDF of the two-sided geometric distribution with
    * α = 1/2, truncated at ±bound: unnormalized weights 2^(bound−|k|)
    * (so P(k) ∝ (1/2)^|k| — the ε = ln 2 geometric mechanism of
    * Ghosh-Roughgarden-Sundararajan 2009), returned as ascending
    * (k, cumulative weight) with total weight 3·2^bound − 2. The
    * truncation discards 2^(1−bound)/3 of the mass (~1e-5 at the
    * default 16) — the standard bounded-noise variant. */
  def geometricCdf(bound: Int): (Seq[(Int, Long)], Long) = {
    // bound <= 29 keeps every Long product in dpNoisyCounts exact:
    // u < 2^32 and m = 3*2^bound - 2, so u*m < 3*2^(32+bound) needs
    // bound <= 29 to stay under 2^63; likewise cum <= m < 2^31 keeps
    // cum*2^32 < 2^63. At 30 both silently wrap and corrupt the CDF.
    require(bound >= 1 && bound <= 29, s"geometricCdf: bound=$bound")
    var cum = 0L
    val steps = (-bound to bound).map { k =>
      cum += 1L << (bound - math.abs(k)); k -> cum
    }
    (steps, 3L * (1L << bound) - 2)
  }

  /** Differentially-private noisy counts — the release sibling of the
    * three audits above: instead of flagging a risky aggregate, perturb
    * it. Per-group counts get two-sided geometric noise (the DISCRETE
    * mechanism — integer noise for integer counts, utility-optimal for
    * counting queries per Ghosh et al. 2009) at ε = ln 2, truncated at
    * ±`bound`.
    *
    * Like every "random" value in this masking module (see F's
    * scaladoc) the noise is KEYED-DETERMINISTIC: u = hash32(group key,
    * seed) and the inverse CDF is evaluated by exact integer
    * cross-multiplication (u·M < C_k·2³²) — idempotent under task
    * retries, reproducible by the oracle bit-for-bit, never two
    * different releases from one seed. One hash aggregate; the CASE
    * chain is a literal, so the noise costs nothing at any scale. */
  def dpNoisyCounts(df: DataFrame, groups: Seq[String], seed: String,
      bound: Int = 16): DataFrame = {
    require(groups.nonEmpty, "dpNoisyCounts: at least one group column")
    val (steps, m) = geometricCdf(bound)
    val u = graft.functions.F.hash32(
      concat_ws("|", groups.map(c => col(c).cast("string")): _*), seed, "dp")
    val big = 1L << 32
    val noise = steps.init.foldRight(lit(steps.last._1.toLong)) {
      case ((k, cum), acc) => when(u * m < cum * big, lit(k.toLong)).otherwise(acc)
    }
    df.groupBy(groups.map(col): _*).agg(count(lit(1)).as("n"))
      .withColumn("noise", noise)
      .withColumn("n_noisy", greatest(col("n") + col("noise"), lit(0L)))
  }
}
