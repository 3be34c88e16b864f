package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Markov-chain (removal-effect) attribution — the DATA-DRIVEN member
  * of the attribution family (first-touch / linear / time-decay live in
  * InsightsPack as window compositions): model user journeys as a
  * first-order Markov chain over channels with absorbing CONV/NULL
  * states, and credit each channel by how much total conversion
  * probability disappears when it is removed (Anderl et al. 2014).
  *
  * Scale split: building the TRANSITION COUNTS is the corpus-scale work
  * (one window pass per user over the events feed — the caller's job,
  * so any journey definition plugs in); the chain itself is
  * METADATA-sized (states = channels, a catalog not a dataset), so like
  * the IVF centroid table it collects to the driver and the absorption
  * fixpoint runs there in exact integer arithmetic.
  *
  * All integers, so the oracle reproduces every iterate bit for bit:
  * values are ×1e9 longs; one sweep is
  *   p'(s) = (cnt(s,CONV)·1e9 + Σ_{t transient} cnt(s,t)·val(t)) div out(s)
  * with val(removed) ≡ 0, NULL ≡ 0; `iters` fixed sweeps (the iterate
  * is monotone non-decreasing from 0 and bounded, so a fixed cutoff is
  * deterministic on both engines rather than a float-epsilon test).
  * Sum order is irrelevant for integer addition — no IEEE hazard.
  */
object Attribution {

  /** `transitions`: (s, t, c) counts where s ∈ {START} ∪ channels and
    * t ∈ channels ∪ {CONV, NULL}. Output one row per channel:
    * (channel, p_full_x1e9, p_removed_x1e9, removal_x1e6, share_x1e6),
    * where removal = (P − P₋c)/P and share normalizes removals to 1.
    * P is the absorption probability from START. */
  def markovRemovalEffects(transitions: DataFrame, iters: Int = 40,
      maxStates: Int = 10000): DataFrame = {
    val spark = transitions.sparkSession
    val trans = transitions.select(
      col("s").cast("string"), col("t").cast("string"), col("c").cast("long"))
    // Size-check BEFORE collect(): a limit(maxStates+1) probe costs one
    // cheap scan but means an oversized chain fails with this message
    // instead of OOMing the driver inside the collect it guards.
    val probe = trans.limit(maxStates + 1).count()
    require(probe <= maxStates,
      s"markovRemovalEffects: more than maxStates=$maxStates transition " +
        "rows — the chain must stay metadata-sized")
    val rows = trans
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val cnt = rows.toMap
    val out = rows.groupBy(_._1._1).map { case (s, es) => s -> es.map(_._2).sum }
    val transient = out.keySet // every state with outgoing edges
    val channels = (rows.map(_._1._1) ++ rows.map(_._1._2)).distinct
      .filterNot(Set("START", "CONV", "NULL")).sorted
    val Scale = 1000000000L

    def solve(removed: Option[String]): Long = {
      var p = transient.map(_ -> 0L).toMap
      for (_ <- 1 to iters) {
        p = transient.map { s =>
          val num = rows.collect { case ((`s`, t), c) =>
            val v = t match {
              case "CONV" => Scale
              case "NULL" => 0L
              case ch if removed.contains(ch) => 0L
              case ch => p.getOrElse(ch, 0L)
            }
            c * v
          }.sum
          s -> num / out(s)
        }.toMap
      }
      p.getOrElse("START", 0L)
    }

    val pFull = solve(None)
    val effects = channels.map { ch =>
      val pr = solve(Some(ch))
      (ch, pFull, pr, if (pFull == 0) 0L else (pFull - pr) * 1000000L / pFull)
    }
    val totalRe = effects.map(_._4).sum
    val result = effects.map { case (ch, pf, pr, re) =>
      (ch, pf, pr, re, if (totalRe == 0) 0L else re * 1000000L / totalRe)
    }
    import spark.implicits._
    result.toSeq.toDF("channel", "p_full_x1e9", "p_removed_x1e9",
      "removal_x1e6", "share_x1e6")
  }

  /** The standard journey → transition-count builder over an events
    * feed: per user, events ordered by (ts, id), truncated at the
    * FIRST conversion event; START → first channel → … → CONV (user
    * converted) / NULL (never). Users whose first event converts
    * contribute START → CONV. One window pass on the user key plus two
    * small aggregates — this is the corpus-scale half. */
  def journeyTransitions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(idCol).as("eid"), col(typeCol).as("et"))
    val firstConv = ev.filter(col("et") === convType)
      .groupBy("u").agg(min(struct(col("ts"), col("eid"))).as("fc"))
    val pre = ev.join(firstConv, Seq("u"), "left")
      .filter(col("et") =!= convType &&
        (col("fc").isNull || struct(col("ts"), col("eid")) < col("fc")))
    val w = Window.partitionBy("u").orderBy("ts", "eid")
    val steps = pre
      .select(col("u"), lag(col("et"), 1, "START").over(w).as("s"),
        col("et").as("t"))
      .select("s", "t")
    val lastCh = pre.groupBy("u")
      .agg(max(struct(col("ts"), col("eid"), col("et"))).as("last"))
      .select(col("u"), col("last.et").as("lastc"))
    val users = ev.groupBy("u")
      .agg(max(when(col("et") === convType, 1).otherwise(0)).as("conv"))
    val term = users.join(lastCh, Seq("u"), "left")
      .select(coalesce(col("lastc"), lit("START")).as("s"),
        when(col("conv") === 1, "CONV").otherwise("NULL").as("t"))
    steps.unionByName(term).groupBy("s", "t").agg(count(lit(1)).as("c"))
  }
}
