package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain equi-join on a skewed key distribution") {
    // 5000 rows of one hot key + a uniform tail
    val left = ((1 to 5000).map(i => (1, s"hot$i")) ++
      (2 to 200).map(k => (k, s"cold$k"))).toDF("k", "v")
    val right = (1 to 200).map(k => (k, s"dim$k")).toDF("k", "d")
    val plain = left.join(right, Seq("k")).select("k", "v", "d")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "k", salt = 8).select("k", "v", "d")
      .collect().map(_.toSeq).toSet
    assert(salted == plain && salted.size == 5000 + 199)
  }

  test("salted shuffle spreads the hot key over multiple partitions") {
    val left = (1 to 4000).map(i => (1, i)).toDF("k", "v") // single key
    val right = Seq((1, "d")).toDF("k", "d")
    val salted = Skew.saltedJoin(left, right, "k", salt = 4)
    // group by the salt the join uses (pure row-content hash): the
    // distribution must not collapse into 1 bucket
    val spread = left.withColumn("s",
      pmod(hash(col("k"), col("v")), lit(4)))
      .groupBy("s").count().collect()
    assert(spread.length > 1, spread.toSeq.toString)
    assert(salted.count() == 4000)
  }

  test("retry-idempotence is structural: the salt is a pure function of row content") {
    // Recomputing the salt column over a REPARTITIONED copy of the same
    // data yields identical per-row salts — the property a lost-task
    // retry needs, and the one a positional or partition-id salt lacks.
    val left = (1 to 2000).map(i => (i % 7, s"v$i")).toDF("k", "v")
    def salts(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("s", pmod(hash(col("k"), col("v")), lit(8)))
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(salts(left) == salts(left.repartition(13)))
  }

  test("saltedJoin and AQE skew-join don't fight: same rows with skewJoin on and off") {
    // The salted join must stay correct whether or not AQE's own skew
    // mitigation also fires on the same shuffle (both ways plan as a
    // sort-merge join once broadcast is off, the shape AQE skew-join
    // targets).
    val left = ((1 to 5000).map(i => (1, s"hot$i")) ++
      (2 to 300).map(k => (k, s"cold$k"))).toDF("k", "v")
    val right = (1 to 300).map(k => (k, s"dim$k")).toDF("k", "d")
    def run(): (Set[Seq[Any]], String) = {
      val df = Skew.saltedJoin(left, right, "k", salt = 8).select("k", "v", "d")
      (df.collect().map(_.toSeq).toSet, df.queryExecution.executedPlan.toString)
    }
    val oldSkew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val (on, planOn) = run()
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (off, planOff) = run()
      assert(planOn.contains("SortMergeJoin") && planOff.contains("SortMergeJoin"),
        s"expected SMJ shape under both configs:\n$planOn\n$planOff")
      assert(on == off && on.size == 5000 + 299)
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", oldSkew)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }

  test("saltedJoin rejects right/full outer (would duplicate unmatched right rows)") {
    val l = Seq((1, "a")).toDF("k", "v")
    val r = Seq((2, "b")).toDF("k", "d")
    intercept[IllegalArgumentException](Skew.saltedJoin(l, r, "k", 4, "right_outer"))
    intercept[IllegalArgumentException](Skew.saltedJoin(l, r, "k", 4, "full_outer"))
    // left_anti is safe: right carries every salt for each key
    val anti = Skew.saltedJoin(l, r, "k", 4, "left_anti").collect()
    assert(anti.map(_.getString(1)).toSeq == Seq("a"))
  }

  test("property: saltedJoin equals the plain join on random data, inner/left/semi/anti, any salt") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val keyG = Gen.chooseNum(1, 6)
    val leftG = Gen.listOfN(20, Gen.zip(keyG, Gen.alphaNumStr.map(_.take(4))))
    val rightG = Gen.listOfN(8, Gen.zip(keyG, Gen.alphaNumStr.map(_.take(4)))).map(_.distinctBy(_._1))
    val saltG = Gen.oneOf(1, 3, 8)
    val typeG = Gen.oneOf("inner", "left_outer", "left_semi", "left_anti")
    val prop = Prop.forAll(leftG, rightG, saltG, typeG) { (ls, rs, salt, jt) =>
      val l = ls.toDF("k", "v"); val r = rs.toDF("k", "d")
      val cols = if (jt == "left_semi" || jt == "left_anti") Seq("k", "v") else Seq("k", "v", "d")
      def img(df: org.apache.spark.sql.DataFrame) =
        df.select(cols.map(col): _*).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      img(Skew.saltedJoin(l, r, "k", salt, jt)) == img(l.join(r, Seq("k"), jt))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("keyHistogram and suggestSalt diagnose the hot key") {
    val df = ((1 to 900).map(_ => 7) ++ (1 to 30)).toDF("k")
    val top = Skew.keyHistogram(df, "k", 1).head()
    assert(top.getInt(0) == 7 && top.getLong(1) == 901L) // 900 + the value 7 from the tail
    assert(Skew.suggestSalt(hotKeyRows = 1000000, rowsPerTask = 100000) == 10)
    assert(Skew.suggestSalt(hotKeyRows = 100, rowsPerTask = 100000) == 1)
    assert(Skew.suggestSalt(hotKeyRows = Long.MaxValue, rowsPerTask = 1) == 64)
  }
}
