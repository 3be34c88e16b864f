package graft.ops

import graft.SparkSpec

class KeyedUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def existing = Seq((1, "a", "s1"), (2, "b", "s2")).toDF("k", "v", "w")

  test("upsert replaces matched rows wholesale and appends new keys (K8)") {
    val updates = Seq((2, "B", null.asInstanceOf[String]), (3, "c", "s3")).toDF("k", "v", "w")
    val out = KeyedUpsert.upsert(existing, updates, "k").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq((1, "a", "s1"), (2, "B", null), (3, "c", "s3")))
  }

  test("upsertMerge keeps existing values where update is null (setDoc merge)") {
    val updates = Seq((2, "B", null.asInstanceOf[String])).toDF("k", "v", "w")
    val out = KeyedUpsert.upsertMerge(existing, updates, "k").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq((1, "a", "s1"), (2, "B", "s2")))
  }

  test("delete is an anti-join on the key set") {
    val out = KeyedUpsert.delete(existing, Seq(1).toDF("k"), "k")
      .collect().map(_.getInt(0))
    assert(out.toSeq == Seq(2))
  }
}
