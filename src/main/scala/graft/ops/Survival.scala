package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958) — the
  * time-to-event family (conversion lag, churn, time-to-failure) with
  * RIGHT CENSORING done properly: users who never converted are not
  * dropped (that biases survival down) and not treated as converted
  * (that biases it up) — they stay in the risk set until their
  * observation window ends.
  *
  * Everything heavy is relational: one per-user aggregate (the
  * caller's — any event/censor definition plugs in), one (group, t)
  * aggregate, one cumulative window for the risk sets. The survival
  * curve itself is a product over EVENT TIMES, which are bounded by
  * the duration grid (days in the observation window), so the
  * sequential part is the same bounded per-group `aggregate()` fold as
  * Holt/CUSUM — ×1e6 integer state, one truncating division per step,
  * bit-identical to the oracle's recursive CTE.
  *
  * Input `obs`: one row per subject — (groupCol, tCol = observed time
  * in integer units, evCol = 1 event / 0 censored). Output: one row
  * per (group, event time): n_risk, n_events, surv_x1e6 — the KM
  * curve S(t) = Π_{u ≤ t} (n(u) − d(u)) / n(u). */
object Survival {

  /** Shared (group, t) risk relation: who leaves at t, how many event,
    * and the risk-set size (everyone still under observation at t). */
  private def riskSets(obs: DataFrame, groupCol: String, tCol: String,
      evCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byT = obs
      .select(col(groupCol).as("g"), col(tCol).cast("long").as("t"),
        col(evCol).cast("long").as("ev"))
      .groupBy("g", "t")
      .agg(count(lit(1)).as("leave"), sum(col("ev")).as("d"))
    val whole = Window.partitionBy("g")
    val before = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    byT
      .withColumn("n_risk", sum(col("leave")).over(whole) -
        coalesce(sum(col("leave")).over(before), lit(0L)))
      .filter(col("d") > 0)
  }

  def kaplanMeier(obs: DataFrame, groupCol: String, tCol: String,
      evCol: String): DataFrame = {
    val risk = riskSets(obs, groupCol, tCol, evCol)
    // The product emits every prefix, so the fold carries (s, out):
    // the running survival and the curve rows so far. Event times per
    // group are bounded by the time grid — a ≤grid-length array.
    val fold =
      """aggregate(steps,
        |  struct(CAST(1000000 AS BIGINT) AS s,
        |    CAST(array() AS array<struct<t:bigint,n:bigint,d:bigint,sv:bigint>>) AS o),
        |  (acc, x) -> struct(
        |    acc.s * (x.n_risk - x.d) div x.n_risk AS s,
        |    concat(acc.o, array(struct(x.t AS t, x.n_risk AS n, x.d AS d,
        |      acc.s * (x.n_risk - x.d) div x.n_risk AS sv))) AS o)).o""".stripMargin
    risk
      .groupBy("g")
      .agg(sort_array(collect_list(
        struct(col("t"), col("n_risk"), col("d")))).as("steps"))
      .select(col("g"), explode(expr(fold)).as("st"))
      .select(col("g").as(groupCol), col("st.t").as("t"),
        col("st.n").as("n_risk"), col("st.d").as("n_events"),
        col("st.sv").as("surv_x1e6"))
  }

  /** Restricted mean survival time (RMST) — the AREA under the KM
    * curve up to the horizon `tau`: the single-number summary
    * clinicians and churn analysts quote ("average days survived in
    * the first τ days"), robust where median survival is undefined
    * (curves that never cross 0.5). Computed exactly from the
    * [[kaplanMeier]] step function: Σ over steps of S(prev) · (t −
    * prev), with the curve flat at S=1e6 before the first event and
    * flat at its last value through τ. A per-group window lag + one
    * aggregate over the (bounded) event-time rows — units are
    * time·×1e6, so rmst_x1e6 div 1e6 is whole time units. */
  def rmst(obs: DataFrame, groupCol: String, tCol: String, evCol: String,
      tau: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val km = kaplanMeier(obs, groupCol, tCol, evCol)
      .select(col(groupCol).as("g"), col("t"), col("surv_x1e6"))
      .filter(col("t") <= tau)
    val w = Window.partitionBy("g").orderBy("t")
    val withSteps = km
      .withColumn("prev_t", coalesce(lag(col("t"), 1).over(w), lit(0L)))
      .withColumn("prev_s", coalesce(lag(col("surv_x1e6"), 1).over(w),
        lit(1000000L)))
      .groupBy(col("g"))
      .agg(sum(expr("prev_s * (t - prev_t)")).as("area_pre"),
        max(struct(col("t"), col("surv_x1e6"))).as("_last"))
      .select(col("g"),
        (col("area_pre") +
          col("_last.surv_x1e6") * (lit(tau) - col("_last.t")))
          .as("rmst_in"))
    // A group whose first event falls AFTER tau has no KM step in the
    // horizon, so its curve is flat at S=1e6 throughout: rmst = tau*1e6.
    // The filter above drops such groups; join back to the full group
    // list so they are reported, not silently omitted.
    obs.select(col(groupCol).as("g")).distinct()
      .join(withSteps, Seq("g"), "left")
      .select(col("g").as(groupCol),
        coalesce(col("rmst_in"), lit(tau * 1000000L)).as("rmst_x1e6"))
  }

  /** Nelson–Aalen cumulative hazard — KM's additive sibling:
    * H(t) = Σ_{u ≤ t} d(u)/n(u). The per-time term truncates to ×1e6
    * integer BEFORE the cumulative sum, so (unlike KM's product) the
    * whole curve is one window cumsum over the risk relation — no fold
    * at all, and order of addition is irrelevant for integers. */
  def nelsonAalen(obs: DataFrame, groupCol: String, tCol: String,
      evCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    riskSets(obs, groupCol, tCol, evCol)
      .withColumn("term", expr("d * 1000000L div n_risk"))
      .withColumn("hazard_x1e6", sum(col("term")).over(w))
      .select(col("g").as(groupCol), col("t"),
        col("n_risk"), col("d").as("n_events"), col("hazard_x1e6"))
  }
}
