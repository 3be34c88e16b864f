package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RankSpec extends SparkSpec {

  test("globalRowNumber matches the global-window rank on a total order") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .withColumn("h", md5(col("k").cast("string")))
      .repartition(7)
    val viaRank = Rank.globalRowNumber(df, Seq(col("h"), col("k")))
      .select("k", "rn").as[(Long, Int)].collect().toMap
    val w = Window.orderBy(col("h"), col("k"))
    val viaWindow = df.select(col("k"), row_number().over(w).as("rn"))
      .as[(Long, Int)].collect().toMap
    assert(viaRank === viaWindow)
  }

  test("globalRowNumber sort stage is range-partitioned, not single-partition") {
    import spark.implicits._
    val df = (1 to 5000).map(_.toLong).toDF("k")
      .withColumn("h", md5(col("k").cast("string")))
    // The sorted stage must plan a range-partitioned exchange (every
    // partition sorts its key range in parallel), never the window
    // variant's SinglePartition funnel. AQE may still coalesce tiny
    // shuffles at test scale — the plan shape is what survives 100×.
    val plan = df.orderBy(col("h"), col("k")).queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
    // and ranks are still the dense 1..N sequence
    val ranks = Rank.globalRowNumber(df, Seq(col("h"), col("k")))
      .select("rn").as[Int].collect().sorted
    assert(ranks.toSeq === (1 to 5000))
  }
}
