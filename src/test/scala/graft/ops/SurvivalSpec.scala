package graft.ops

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook curve — censored subjects stay at risk, never convert") {
    // A converts at 1, B at 2, C censored at 2, D converts at 4,
    // E censored at 5:
    //   S(1) = 4/5 = 0.8; S(2) = 0.8 * 3/4 = 0.6; S(4) = 0.6 * 1/2 = 0.3
    // (C leaves the risk set after t=2 without an event; E never events.)
    val obs = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 2L, 0L),
      ("g", 4L, 1L), ("g", 5L, 0L)).toDF("grp", "t", "ev")
    val got = Survival.kaplanMeier(obs, "grp", "t", "ev")
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, 5L, 1L, 800000L), (2L, 4L, 1L, 600000L),
      (4L, 2L, 1L, 300000L)))
  }

  test("kaplanMeier: dropping vs censoring — the bias the estimator exists to avoid") {
    // Same events, but pretend the censored subjects were DROPPED:
    // survival at t=2 would read 1/3 lower. The censored run must sit
    // strictly ABOVE the dropped run at every shared time.
    val withCens = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 2L, 0L),
      ("g", 4L, 1L), ("g", 5L, 0L)).toDF("grp", "t", "ev")
    val dropped = withCens.filter($"ev" === 1L)
    def curve(df: org.apache.spark.sql.DataFrame) =
      Survival.kaplanMeier(df, "grp", "t", "ev").orderBy("t")
        .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    val a = curve(withCens); val b = curve(dropped)
    assert(b.keySet == a.keySet)
    assert(a.keySet.forall(t => a(t) > b(t)),
      s"censored curve must dominate: $a vs $b")
  }

  test("nelsonAalen: cumulative hazard adds truncated terms over the same risk sets") {
    // Same textbook fixture: terms 1e6/5, 1e6/4, 1e6/2 -> cumulative
    // 200000, 450000, 950000.
    val obs = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 2L, 0L),
      ("g", 4L, 1L), ("g", 5L, 0L)).toDF("grp", "t", "ev")
    val got = Survival.nelsonAalen(obs, "grp", "t", "ev")
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(4))).toSeq
    assert(got == Seq((1L, 200000L), (2L, 450000L), (4L, 950000L)))
  }

  test("rmst: exact area under the KM step function, flat tail to the horizon") {
    // KM steps (1, .8), (2, .6), (4, .3); tau = 5:
    // 1*1e6 + 1*8e5 + 2*6e5 + 1*3e5 = 3.3e6 (avg 3.3 of 5 days "alive")
    val obs = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 2L, 0L),
      ("g", 4L, 1L), ("g", 5L, 0L)).toDF("grp", "t", "ev")
    val got = Survival.rmst(obs, "grp", "t", "ev", tau = 5L).collect()
    assert(got.length == 1 && got(0).getAs[Long]("rmst_x1e6") == 3300000L)
    // Horizon inside the curve: tau = 2 -> 1*1e6 + 1*8e5 + 0 = 1.8e6
    val short = Survival.rmst(obs, "grp", "t", "ev", tau = 2L).collect()
    assert(short(0).getAs[Long]("rmst_x1e6") == 1800000L)
  }

  test("rmst: a group with no event inside the horizon reports tau*1e6") {
    // h's first (and only) event is at t=9 > tau=5: its curve is flat
    // at S=1 through the whole horizon, so rmst = 5e6 — the group must
    // appear in the output, not be silently dropped.
    val obs = Seq(("g", 1L, 1L), ("g", 4L, 1L),
      ("h", 9L, 1L), ("h", 9L, 0L)).toDF("grp", "t", "ev")
    val got = Survival.rmst(obs, "grp", "t", "ev", tau = 5L)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getAs[Long]("rmst_x1e6"))).toSeq
    // g: S(1)=.5, S(4)=0 -> 1*1e6 + 3*5e5 + 0 = 2.5e6
    assert(got == Seq(("g", 2500000L), ("h", 5000000L)))
  }

  test("kaplanMeier: groups fold independently; everyone-events hits zero") {
    val obs = Seq(("x", 1L, 1L), ("x", 1L, 1L), ("y", 3L, 1L), ("y", 7L, 1L))
      .toDF("grp", "t", "ev")
    val got = Survival.kaplanMeier(obs, "grp", "t", "ev")
      .orderBy("grp", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    // x: both event at t=1 -> S = 0; y: S(3) = 1/2, S(7) = 0
    assert(got == Seq(("x", 1L, 0L), ("y", 3L, 500000L), ("y", 7L, 0L)))
  }
}
