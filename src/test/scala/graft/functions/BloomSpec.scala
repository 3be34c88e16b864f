package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def build(keys: Seq[Long], bits: Int = 1 << 12, hashes: Int = 5): Array[Byte] = {
    val w = BloomOps.emptyWords(bits)
    keys.foreach(BloomOps.add(w, bits, hashes, _))
    BloomOps.serialize(w, bits, hashes)
  }

  test("no false negatives, bounded false positives") {
    val members = (0L until 500L).map(_ * 7919L)
    val ser = build(members)
    assert(members.forall(BloomOps.mightContain(ser, _)), "false negative")
    // m=4096, k=5, n=500 → theoretical fp ≈ (1-e^(-kn/m))^k ≈ 2.2%
    val probes = (1L to 10000L).map(_ * 104729L + 3L).filterNot(members.contains)
    val fp = probes.count(BloomOps.mightContain(ser, _)).toDouble / probes.size
    assert(fp < 0.06, s"fp rate $fp")
  }

  test("merge (bitwise OR) ≡ building from the union") {
    val bits = 1 << 10; val k = 4
    val a = (0L until 100L).map(_ * 31L)
    val b = (0L until 100L).map(_ * 97L + 5L)
    val wa = BloomOps.emptyWords(bits); a.foreach(BloomOps.add(wa, bits, k, _))
    val wb = BloomOps.emptyWords(bits); b.foreach(BloomOps.add(wb, bits, k, _))
    val merged = wa.zip(wb).map { case (x, y) => x | y }
    val direct = BloomOps.emptyWords(bits); (a ++ b).foreach(BloomOps.add(direct, bits, k, _))
    assert(merged.toSeq === direct.toSeq)
  }

  test("serialize/deserialize round-trips words and params") {
    val ser = build((1L to 50L).toSeq, bits = 256, hashes = 3)
    val (words, bits, hashes) = BloomOps.deserializeWords(ser)
    assert(bits === 256 && hashes === 3)
    assert(BloomOps.serialize(words, bits, hashes).toSeq === ser.toSeq)
  }

  test("aggregate + probe end-to-end in a query: prefilter passes a superset, exact join exact") {
    val keys = spark.range(1000).select(col("id"))
    val hot = keys.filter(col("id") % 37 === 0)
    val bf = Bloom.buildFilter(hot, "id", numBits = 1 << 12, numHashes = 5)
    val pre = keys.filter(Bloom.mightContain(bf, col("id")))
    val preIds = pre.as[Long].collect().toSet
    val hotIds = hot.as[Long].collect().toSet
    assert(hotIds.subsetOf(preIds), "prefilter dropped a real member")
    val exact = pre.join(hot.withColumnRenamed("id", "hid"),
        col("id") === col("hid"), "left_semi")
      .as[Long].collect().toSet
    assert(exact === hotIds)
  }

  test("parameter validation fails loud") {
    intercept[IllegalArgumentException] { BloomBuild(F.toExpr(lit(1L)), 32, 5) }
    intercept[IllegalArgumentException] { BloomBuild(F.toExpr(lit(1L)), 1 << 10, 0) }
  }

  test("non-Long key column is an analysis-time error, not a runtime ClassCastException") {
    // ExpectsInputTypes(LongType): an Int key must fail resolution —
    // before the fix it ClassCastException'd mid-job from asInstanceOf.
    val intKeys = spark.range(10).select(col("id").cast("int").as("id"))
    val buildErr = intercept[org.apache.spark.sql.AnalysisException] {
      Bloom.buildFilter(intKeys, "id", numBits = 1 << 10, numHashes = 5)
    }
    assert(buildErr.getMessage.toLowerCase.contains("type"))
    val bf = Bloom.buildFilter(spark.range(10).toDF("id"), "id", 1 << 10, 5)
    val probeErr = intercept[org.apache.spark.sql.AnalysisException] {
      intKeys.filter(Bloom.mightContain(bf, col("id"))).collect()
    }
    assert(probeErr.getMessage.toLowerCase.contains("type"))
  }
}
