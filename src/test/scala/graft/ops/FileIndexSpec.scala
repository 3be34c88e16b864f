package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class FileIndexSpec extends SparkSpec {
  import spark.implicits._

  private def indexed(n: Int, parts: Int): String = {
    val dir = Files.createTempDirectory("fidx").resolve("t").toString
    val df = spark.range(n).select(col("id"), (col("id") % 7).as("v"))
    FileIndex.writeIndexed(df.toDF("id", "v"), dir, "id", parts)
    dir
  }

  test("manifest prunes files: a narrow range touches few of many files") {
    val dir = indexed(10000, 10)
    assert(FileIndex.indexedFileCount(spark, dir) == 10)
    // a span of ~1/10 of the key range survives in 1-2 files
    val surv = FileIndex.survivingFiles(spark, dir, lit(2000L), lit(2500L))
    assert(surv.nonEmpty && surv.size <= 2, s"expected <=2 files, got ${surv.size}")
    // pruned read + residual filter equals the full-scan answer
    val pruned = FileIndex.readPruned(spark, dir, lit(2000L), lit(2500L))
      .filter(col("id").between(2000L, 2500L))
    assert(pruned.count() == 501L)
    assert(pruned.agg(sum("id")).head().getLong(0) ==
      (2000L to 2500L).sum)
  }

  test("range outside all files prunes to an empty scan with the data schema") {
    val dir = indexed(1000, 4)
    val out = FileIndex.readPruned(spark, dir, lit(50000L), lit(60000L))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "v"))
  }

  test("boundary spans keep the file whose lo/hi touches the bound") {
    val dir = indexed(1000, 4)
    // [hi of file 0, lo of file 1] must keep both touching files
    val all = spark.read.parquet(s"$dir/_index")
      .orderBy("lo").collect()
    val edge = all(0).getAs[Long]("hi")
    val surv = FileIndex.survivingFiles(spark, dir, lit(edge), lit(edge + 1))
    assert(surv.size == 2, s"expected the two adjacent files, got ${surv.size}")
  }

  test("the _index dir is invisible to a plain parquet read of the data") {
    val dir = indexed(500, 2)
    assert(spark.read.parquet(dir).count() == 500L)
  }

  test("manifest agrees with the bytes on disk (recomputed post-write)") {
    val dir = indexed(3000, 6)
    val m = spark.read.parquet(s"$dir/_index")
    assert(m.agg(sum("rows")).head().getLong(0) == 3000L)
    // per-file spans are disjoint under range clustering
    val spans = m.select("lo", "hi").orderBy("lo")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    spans.sliding(2).foreach {
      case Array((_, h1), (l2, _)) => assert(h1 < l2, s"overlap: $h1 >= $l2")
      case _ =>
    }
  }
}
