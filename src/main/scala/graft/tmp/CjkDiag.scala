package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Dev scratch: find the OOMing stage of dedup_minhash_cjk at sf1. */
object CjkDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/testdata_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val pA = " 대규모 말뭉치 데이터정제파이프라인"
    val pB = " 한국어 토크나이저 중복제거엔진"
    val extra = "갑"
    val ko = when(col("doc_id") % 2 === 0, lit(pA)).otherwise(lit(pB))
    val corpus = d.select(col("doc_id").as("id"), concat(col("text"), ko).as("text"))
      .unionAll(d.select((col("doc_id") + 1000000).as("id"),
        concat(col("text"), ko,
          when(col("doc_id") % 50 === 0, lit(""))
            .otherwise(lit(" " + extra))).as("text")))
    val sh = Dedup.shinglesCjk(corpus, "id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("shingle rows") { println("  n=" + sh.count()) }
    val sigs = Dedup.minhashSignatures(sh, 8)
    t("signatures") { println("  n=" + sigs.count()) }
    val bands = Dedup.lshBands(sigs, 8, 4)
    val bcount = bands.select(col("id"), xxhash64(col("bk")).as("bk"))
      .groupBy("bk").agg(count(lit(1)).as("bn"))
    t("bucket histogram") {
      bcount.select(sum(col("bn")).as("rows"),
        sum(col("bn") * col("bn")).as("sum_sq"), max(col("bn")).as("max_b"),
        sum(when(col("bn") > 10000L, col("bn") * col("bn")).otherwise(0L)).as("capped_sq"))
        .show(false)
    }
    val cand = Dedup.lshCandidates(bands, 10000L)
    t("candidate count") { println("  cand=" + cand.count()) }
    spark.stop()
  }
}
