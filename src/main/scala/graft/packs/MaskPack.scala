package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.core.Tables
import graft.functions.F
import graft.ops.Mask
import graft.ops.Mask._

/** Oracle-checked queries for the masking pipeline (SURVEY §2.10 +
  * F6-F16/F19).
  *
  * `MaskSql` mirrors graft.functions.F in DuckDB SQL, construction by
  * construction (md5 → hex-parse → modulo), so the oracle reproduces
  * every masked value bit-for-bit — including the documented
  * maskDigits translate bias.
  */
object MaskPack extends QueryPack {

  private val seed = "s42"

  /** DuckDB mirror of graft.functions.F. `k` is a SQL expression for the
    * string image of the row key. */
  object MaskSql {
    def hash32(k: String, tag: String): String =
      s"CAST(CONCAT('0x', substr(md5($k || ':$seed:$tag'), 1, 8)) AS BIGINT)"
    /** First hex-stream block (n ≤ 32 uses only block 0). */
    def hexStream(k: String, tag: String, n: Int): String = {
      require(n <= 64, "hexStream mirror supports ≤ 64 chars")
      val blocks = (0 to (n - 1) / 32)
        .map(i => s"md5($k || ':$seed:$tag:$i')").mkString(" || ")
      s"substr($blocks, 1, $n)"
    }
    def digits(k: String, tag: String, n: Int): String =
      s"translate(${hexStream(k, tag, n)}, 'abcdef', '012345')"
    def letters(k: String, tag: String, n: Int): String =
      s"translate(${hexStream(k, tag, n)}, '0123456789abcdef', 'abcdefghijklmnop')"
    def maskInt(k: String, tag: String, min: Long, max: Long): String =
      s"${hash32(k, tag)} % ${max - min + 1} + $min"
    def uuid(k: String): String = {
      val h = s"md5($k || ':$seed:uuid')"
      s"concat_ws('-', substr($h,1,8), substr($h,9,4), substr($h,13,4), substr($h,17,4), substr($h,21,12))"
    }
    def pick(k: String, tag: String, items: Seq[String]): String =
      s"CASE ${hash32(k, tag)} % ${items.size} " +
        items.zipWithIndex.map { case (v, i) => s"WHEN $i THEN '$v'" }.mkString(" ") + " END"
    def fakeName(k: String): String =
      s"${pick(k, "fn_s", F.surnames)} || ' ' || ${pick(k, "fn_g", F.givenNames)}"
    def fakeEmail(k: String, fixed: String, n: Int): String =
      s"'$fixed' || ${letters(k, "em", n)} || '@' || ${pick(k, "em_d", F.emailDomains)}"
    def fakePhone(k: String, fixed: String): String = {
      val fd = fixed.filter(_.isDigit).take(8)
      val tail = s"'$fd' || ${digits(k, "ph", 8 - fd.length)}"
      s"'010-' || substr($tail, 1, 4) || '-' || substr($tail, 5, 4)"
    }
    def maskDate(k: String, tag: String, start: String, end: String): String = {
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(start), java.time.LocalDate.parse(end)) + 1
      s"strftime(DATE '$start' + CAST(${hash32(k, tag)} % $span AS INT), '%Y-%m-%d')"
    }
    def uniqueId(k: String, kstDate: String): String = {
      val h = s"md5($k || ':$seed:uid')"
      val tok = (0 until 6)
        .map(i => s"substr('${F.tokenAlphabet}', CAST(CAST(CONCAT('0x', substr($h, ${i * 4 + 1}, 4)) AS BIGINT) % 36 AS INT) + 1, 1)")
        .mkString(" || ")
      s"'CV$kstDate" + "_' || " + tok
    }
  }

  private val k = "CAST(c_custkey AS VARCHAR)"

  /** DuckDB mirror of Fuzzy.soundex, step for step (the 'g' flags are
    * the one dialect difference: DuckDB regexp_replace is first-match
    * by default where Spark's is global). */
  private def soundexSql(e: String): String = {
    val up = s"regexp_replace(upper($e), '[^A-Z]', '', 'g')"
    val coded = s"translate($up, 'BFPVCGJKQSXZDTLMNRAEIOUYHW', " +
      "'11112222222233455600000000')"
    val collapsed = (0 to 6).foldLeft(coded)((acc, d) =>
      s"regexp_replace($acc, '$d{2,}', '$d', 'g')")
    val rest = s"regexp_replace(substring($collapsed, 2, 128), '0', '', 'g')"
    s"CASE WHEN length($up) = 0 THEN '' " +
      s"ELSE rpad(substring($up, 1, 1) || substring($rest, 1, 3), 4, '0') END"
  }

  /** The sheet fixture: a 4-column projection of customer. */
  private def sheet(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_custkey"), col("c_name").as("name"),
      col("c_mktsegment").as("segment"), col("c_nationkey").as("nation"))

  private val rules: Seq[(String, MaskRule)] = Seq(
    "name" -> RandomString(fixedPart = "U_", strLen = Some(10), fill = Alnum),
    "segment" -> Sha256,
    "nation" -> RandomInt(1, 25))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.10 masked sheet: ruled fields replaced, ANON_ROW_ID appended.
    "mask_sheet_masked" -> ((s, dir) =>
      Mask(sheet(s, dir), "c_custkey", seed, rules).masked.orderBy("c_custkey")),
    // §2.10 recovery sidecar: ANON_ROW_ID + original ruled values.
    "mask_sheet_keys" -> ((s, dir) =>
      Mask(sheet(s, dir), "c_custkey", seed, rules).keys.orderBy(AnonRowId)),
    // k-anonymity audit (Mask.kAnonymity): quasi-identifier =
    // (c_mktsegment, c_custkey % 25) — ~12-person cells at sf0.001
    // scaling with sf — with k=10 splitting the cells into passes and
    // violations. The audit that belongs next to the masking pipeline:
    // masked direct identifiers do not prevent quasi-identifier
    // re-identification.
    "mask_k_anonymity" -> ((s, dir) =>
      Mask.kAnonymity(
          Tables.load(s, dir, "customer")
            .select(col("c_mktsegment"), (col("c_custkey") % 25).as("cohort")),
          Seq("c_mktsegment", "cohort"), k = 10)
        .orderBy("c_mktsegment", "cohort")),
    // l-diversity: k-anonymity's homogeneity-attack companion. The
    // nation cohort is the quasi-identifier, the market segment the
    // sensitive value — a cohort whose members all share one segment
    // leaks it even at k-size.
    "mask_l_diversity" -> ((s, dir) =>
      Mask.lDiversity(
          Tables.load(s, dir, "customer")
            .select((col("c_custkey") % 40).as("cohort"), col("c_nationkey"),
              col("c_mktsegment")),
          Seq("cohort", "c_nationkey"), "c_mktsegment", l = 3)
        .orderBy("cohort", "c_nationkey")),
    // t-closeness audit (Mask.tCloseness) — the trio's third leg: the
    // cohort's account-balance BAND distribution must track the global
    // one (ordered EMD ≤ t), else diverse-but-skewed cohorts still leak
    // "this cohort is poor/rich". Bands via floor(acctbal/2000) — IEEE
    // division + floor are bit-identical in both engines; EMD crosses
    // the boundary as exact-integer x1e6.
    "mask_t_closeness" -> ((s, dir) =>
      Mask.tCloseness(
          Tables.load(s, dir, "customer")
            .select(col("c_mktsegment"), (col("c_custkey") % 20).as("cohort"),
              floor(col("c_acctbal") / 2000).cast("long").as("bal_band")),
          Seq("c_mktsegment", "cohort"), "bal_band", tX1e6 = 200000L)
        .orderBy("c_mktsegment", "cohort")),
    // DP noisy counts (Mask.dpNoisyCounts): the RELEASE leg next to
    // the three audits — per-(nation, segment) counts perturbed by the
    // eps=ln2 discrete geometric mechanism, keyed-deterministic like
    // every masked value in this module, clamped at zero.
    "mask_dp_counts" -> ((s, dir) =>
      Mask.dpNoisyCounts(
          Tables.load(s, dir, "customer")
            .select(col("c_nationkey"), col("c_mktsegment")),
          Seq("c_nationkey", "c_mktsegment"), seed)
        .orderBy("c_nationkey", "c_mktsegment")),
    // Soundex phonetic blocking (Fuzzy.soundex) over the deterministic
    // fake-name generator: sound-alike names land in one block with no
    // pairwise comparison — the phonetic leg of the ER blocking
    // toolkit next to the deletion-variant (typographic) one.
    "er_soundex_blocks" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .select(F.fakeName(col("c_custkey"), seed).as("name"))
        .groupBy(graft.ops.Fuzzy.soundex(col("name")).as("sx"))
        .agg(count(lit(1)).as("n"), countDistinct(col("name")).as("n_names"))
        .orderBy("sx")),
    // F10-F13, F19 scalar generators, one column each.
    "mask_fakes" -> ((s, dir) => {
      val key = col("c_custkey")
      Tables.load(s, dir, "customer").select(
        col("c_custkey"),
        F.fakeName(key, seed).as("fname"),
        F.fakeEmail(key, seed, "user", 6).as("femail"),
        F.fakePhone(key, seed, "010").as("fphone"),
        F.maskDate(key, seed, "dt", "2020-01-01", "2021-12-31").as("fdate"),
        F.uniqueId(key, seed, lit("2026-01-15 00:00:00").cast("timestamp")).as("uid"))
        .orderBy("c_custkey")
    }),
    // F16: randomString length default — no strLen ⇒ target length =
    // the source value's own length.
    "mask_len_default" -> ((s, dir) => {
      val df = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name").as("name"))
      Mask(df, "c_custkey", seed, Seq(
        "name" -> RandomString(fixedPart = "", strLen = None, fill = Alnum)))
        .masked
        .select(col("c_custkey"), col("name"), length(col("name")).as("n"))
        .orderBy("c_custkey")
    }),
    // F15 digit-width mode + F14 blank + F9 letters fill, dynamic width.
    "mask_widths" -> ((s, dir) => {
      val df = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name").as("acct"), col("c_mktsegment").as("note"))
      Mask(df, "c_custkey", seed, Seq(
        "acct" -> RandomDigits(fixedPart = "99", strLen = None),
        "note" -> Blank)).masked.orderBy("c_custkey")
    }),
  )

  private val maskedNameSql = s"'U_' || ${MaskSql.hexStream(k, "name", 8)}"
  private val maskedNationSql = MaskSql.maskInt(k, "nation", 1, 25)

  val oracleSql: Map[String, String] = Map(
    "mask_k_anonymity" ->
      """SELECT c_mktsegment, c_custkey % 25 AS cohort,
        |  count(*) AS n, count(*) < 10 AS violates
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mask_l_diversity" ->
      """SELECT c_custkey % 40 AS cohort, c_nationkey, count(*) AS n,
        |  count(DISTINCT c_mktsegment) AS n_sensitive,
        |  count(DISTINCT c_mktsegment) < 3 AS violates
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "er_soundex_blocks" ->
      s"""WITH nm AS (SELECT ${MaskSql.fakeName(k)} AS name FROM customer)
         |SELECT ${soundexSql("name")} AS sx, count(*) AS n,
         |  count(DISTINCT name) AS n_names
         |FROM nm GROUP BY 1 ORDER BY sx""".stripMargin,
    "mask_dp_counts" -> {
      // Same exact-integer inverse CDF as Mask.dpNoisyCounts: u·M
      // cross-multiplied against the cumulative weights of the
      // truncated two-sided geometric, built from the SAME
      // geometricCdf constants.
      val (steps, m) = Mask.geometricCdf(16)
      val big = 1L << 32
      val uu = "CAST(CONCAT('0x', substr(md5(CAST(c_nationkey AS VARCHAR) " +
        s"|| '|' || c_mktsegment || ':$seed:dp'), 1, 8)) AS BIGINT)"
      val arms = steps.init.map { case (k, cum) =>
        s"WHEN uu * $m < ${cum * big} THEN CAST($k AS BIGINT)" }.mkString("\n    ")
      s"""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
         |  FROM customer GROUP BY 1, 2),
         |h AS (SELECT *, $uu AS uu FROM g),
         |z AS (SELECT c_nationkey, c_mktsegment, n,
         |    CASE $arms ELSE CAST(${steps.last._1} AS BIGINT) END AS noise
         |  FROM h)
         |SELECT c_nationkey, c_mktsegment, n, noise,
         |  GREATEST(n + noise, 0) AS n_noisy
         |FROM z ORDER BY c_nationkey, c_mktsegment""".stripMargin
    },
    "mask_t_closeness" ->
      """WITH base AS (SELECT c_mktsegment, c_custkey % 20 AS cohort,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band FROM customer),
        |gb AS (SELECT c_mktsegment, cohort, bal_band, count(*) AS a
        |  FROM base GROUP BY 1, 2, 3),
        |grp AS (SELECT c_mktsegment, cohort, CAST(sum(a) AS BIGINT) AS n
        |  FROM gb GROUP BY 1, 2),
        |gmarg AS (SELECT bal_band, CAST(sum(a) AS BIGINT) AS g FROM gb GROUP BY 1),
        |gmarg2 AS (SELECT bal_band,
        |    CAST(sum(g) OVER (ORDER BY bal_band) AS BIGINT) AS g_cum,
        |    CAST(sum(g) OVER () AS BIGINT) AS n_total,
        |    count(*) OVER () AS m_bins FROM gmarg),
        |grid AS (SELECT gr.c_mktsegment, gr.cohort, gr.n, g2.bal_band,
        |    g2.g_cum, g2.n_total, g2.m_bins, COALESCE(gb.a, 0) AS a
        |  FROM grp gr CROSS JOIN gmarg2 g2
        |  LEFT JOIN gb ON gb.c_mktsegment = gr.c_mktsegment
        |    AND gb.cohort = gr.cohort AND gb.bal_band = g2.bal_band),
        |cum AS (SELECT *, CAST(sum(a) OVER (
        |    PARTITION BY c_mktsegment, cohort ORDER BY bal_band) AS BIGINT) AS a_cum
        |  FROM grid),
        |e AS (SELECT c_mktsegment, cohort, n, n_total, m_bins,
        |    CAST(sum(abs(a_cum * n_total - g_cum * n)) AS BIGINT) AS emd_num
        |  FROM cum GROUP BY 1, 2, 3, 4, 5)
        |SELECT c_mktsegment, cohort, n,
        |  emd_num * 1000000 // (n * n_total * GREATEST(m_bins - 1, 1)) AS t_x1e6,
        |  emd_num * 1000000 // (n * n_total * GREATEST(m_bins - 1, 1)) > 200000 AS violates
        |FROM e ORDER BY c_mktsegment, cohort""".stripMargin,
    "mask_sheet_masked" ->
      s"""SELECT c_custkey, $maskedNameSql AS name, sha256(c_mktsegment) AS segment,
         |  $maskedNationSql AS nation, ${MaskSql.uuid(k)} AS ANON_ROW_ID
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "mask_sheet_keys" ->
      s"""SELECT ${MaskSql.uuid(k)} AS ANON_ROW_ID, c_name AS name,
         |  c_mktsegment AS segment, c_nationkey AS nation
         |FROM customer ORDER BY ANON_ROW_ID""".stripMargin,
    "mask_fakes" ->
      s"""SELECT c_custkey,
         |  ${MaskSql.fakeName(k)} AS fname,
         |  ${MaskSql.fakeEmail(k, "user", 6)} AS femail,
         |  ${MaskSql.fakePhone(k, "010")} AS fphone,
         |  ${MaskSql.maskDate(k, "dt", "2020-01-01", "2021-12-31")} AS fdate,
         |  ${MaskSql.uniqueId(k, "20260115")} AS uid
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "mask_len_default" ->
      s"""SELECT c_custkey,
         |  substr(${MaskSql.hexStream(k, "name", 64)}, 1, length(c_name)) AS name,
         |  CAST(length(c_name) AS INT) AS n
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "mask_widths" ->
      s"""SELECT c_custkey,
         |  '99' || substr(${MaskSql.digits(k, "acct", 64)}, 1, GREATEST(length(c_name) - 2, 0)) AS acct,
         |  '' AS note, ${MaskSql.uuid(k)} AS ANON_ROW_ID
         |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
