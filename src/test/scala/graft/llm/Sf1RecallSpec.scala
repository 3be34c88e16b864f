package graft.llm

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Measured-recall gates AT SF1 (VERDICT r15 task 7): the sf0.01
  * oracle rows pin recall on a bounded fixture, but band/bucket
  * statistics only bite at volume — a hot band capped away, an IVF
  * bucket mis-probed. These tests run the SAME production pipelines
  * over the 10× rehearsal corpus (`tools/gen_sf1.py` →
  * /tmp/testdata_sf1) and assert the quality floor as a hard number.
  * Cancelled (not failed) when the rehearsal fixture is absent —
  * regenerate it with the tool to run them. */
class Sf1RecallSpec extends SparkSpec {

  private val sf1 = "/tmp/testdata_sf1"
  private def have = Files.isDirectory(Paths.get(sf1))

  test("sf1 MinHash-LSH recall vs exact truth >= 0.90 on a 3000-doc sub-corpus") {
    assume(have, s"$sf1 absent — run tools/gen_sf1.py")
    val d = spark.read.parquet(s"$sf1/documents.parquet")
      .filter(col("doc_id") < 1500)
    // same corpus construction as the dedup_minhash_recall gate:
    // every doc reappears shifted one token, every 50th verbatim
    val c = d.select(col("doc_id").as("id"), col("text"))
      .unionAll(d.select((col("doc_id") + 10000000L).as("id"),
        when(col("doc_id") % 50 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zzz9"))).as("text")))
    val row = graft.core.Materialize.withCached(
      Dedup.shingles(c, "id", "text")) { sh =>
      val truth = Dedup.jaccard(
        sh.as("x").join(sh.as("y"),
            col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
          .select(col("x.id").as("a"), col("y.id").as("b")).distinct(), sh)
        .filter(col("jacc_x1e4") >= 5000)
      val found = Dedup.jaccard(
        Dedup.lshCandidates(
          Dedup.lshBands(Dedup.minhashSignatures(sh, 8), 8, 4)), sh)
        .filter(col("jacc_x1e4") >= 5000)
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(found.agg(count(lit(1)).as("n_found")))
        .select(col("n_true"), col("n_found"),
          expr("n_found * 10000L div n_true").as("recall_x1e4"))
    }.head()
    val (nTrue, recall) = (row.getLong(0), row.getLong(2))
    info(s"sf1 LSH recall: n_true=$nTrue n_found=${row.getLong(1)} recall_x1e4=$recall")
    assert(nTrue >= 1500L, s"degenerate truth set ($nTrue) — fixture broken")
    assert(recall >= 9000L, s"sf1 banded recall $recall < 9000 (x1e4)")
  }

  test("sf1 MinHash-LSH CJK recall >= 0.90 on a Korean-seasoned 3000-doc sub-corpus") {
    assume(have, s"$sf1 absent — run tools/gen_sf1.py")
    // same construction as the dedup_minhash_cjk gate at volume:
    // every doc gains a spaceless Korean phrase, every copy appends
    // one Hangul syllable (one extra TOKEN only under the cjkAware
    // codepoint pre-spacing) except every 50th (verbatim). Recall is
    // measured over the CJK shingle relation — band/bucket statistics
    // with Korean grams participating only bite at volume.
    val d = spark.read.parquet(s"$sf1/documents.parquet")
      .filter(col("doc_id") < 1500)
    val ko = when(col("doc_id") % 2 === 0, lit(" 대규모 말뭉치 데이터정제파이프라인"))
      .otherwise(lit(" 한국어 토크나이저 중복제거엔진"))
    val c = d.select(col("doc_id").as("id"), concat(col("text"), ko).as("text"))
      .unionAll(d.select((col("doc_id") + 10000000L).as("id"),
        when(col("doc_id") % 50 === 0, concat(col("text"), ko))
          .otherwise(concat(col("text"), ko, lit(" 갑"))).as("text")))
    val row = graft.core.Materialize.withCached(
      Dedup.shinglesCjk(c, "id", "text")) { sh =>
      val truth = Dedup.jaccard(
        sh.as("x").join(sh.as("y"),
            col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
          .select(col("x.id").as("a"), col("y.id").as("b")).distinct(), sh)
        .filter(col("jacc_x1e4") >= 5000)
      val found = Dedup.jaccard(
        Dedup.lshCandidates(
          Dedup.lshBands(Dedup.minhashSignatures(sh, 8), 8, 4)), sh)
        .filter(col("jacc_x1e4") >= 5000)
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(found.agg(count(lit(1)).as("n_found")))
        .select(col("n_true"), col("n_found"),
          expr("n_found * 10000L div n_true").as("recall_x1e4"))
    }.head()
    val (nTrue, recall) = (row.getLong(0), row.getLong(2))
    info(s"sf1 CJK LSH recall: n_true=$nTrue n_found=${row.getLong(1)} recall_x1e4=$recall")
    assert(nTrue >= 1500L, s"degenerate truth set ($nTrue) — fixture broken")
    assert(recall >= 9000L, s"sf1 CJK banded recall $recall < 9000 (x1e4)")
  }

  test("sf1 aHash banded near-dup recall vs exact Hamming >= 0.90 over 3000 images") {
    assume(have, s"$sf1 absent — run tools/gen_sf1.py")
    import spark.implicits._
    // 1500 base images whose 8x8 black/white pattern is the xxhash of
    // an sf1 document, each with a one-pixel-flipped copy (exactly one
    // aHash bit apart: lumas are 0/255, far from any mean shift), run
    // through the PRODUCTION pipeline (PNG encode -> decode -> aHash ->
    // banded Hamming join) and measured against exact-Hamming truth —
    // the third member of the measured-recall family (LSH, IVF, aHash).
    val ids = spark.read.parquet(s"$sf1/documents.parquet")
      .filter(col("doc_id") < 1500)
      .select(col("doc_id"), xxhash64(col("text")).as("pat"))
      .as[(Long, Long)].collect() // fixture-sized (1500 rows)
    def img(pat: Long, flip: Boolean): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 64).foreach { i =>
        val bit = (((pat >>> i) & 1L) == 1L) != (i == 0 && flip)
        b.setRGB(i % 8, i / 8, if (bit) 0xFFFFFF else 0x000000)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", out)
      out.toByteArray
    }
    val media = ids.toSeq.flatMap { case (id, pat) =>
      Seq((id, img(pat, flip = false)), (id + 10000000L, img(pat, flip = true)))
    }.toDF("media_id", "content")
    val sigs = media.as[(Long, Array[Byte])]
      .flatMap { case (id, c) => Multimodal.aHashBytes(c).map(h => (id, h)) }
      .toDF("id", "sig").cache()
    try {
      val truth = sigs.as("x").crossJoin(sigs.as("y"))
        .filter(col("x.id") < col("y.id") &&
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))) <= 3)
        .count()
      val found = Multimodal.ahashNearDupPairs(media).count()
      info(s"sf1 aHash recall: n_true=$truth n_found=$found")
      assert(truth >= 1500L, s"degenerate truth set ($truth) — fixture broken")
      assert(found * 10000L / truth >= 9000L,
        s"sf1 banded aHash recall ${found * 10000L / truth} < 9000 (x1e4)")
    } finally { sigs.unpersist(); () }
  }

  test("sf1 pHash banded near-dup recall vs exact Hamming >= 0.90 over 3000 images") {
    assume(have, s"$sf1 absent — run tools/gen_sf1.py")
    import spark.implicits._
    // 1500 base 32x32 gradient images parameterized by an sf1 document
    // hash, each with a +40-brightness copy (the proven pHash property:
    // a global shift flips at most the DC bit — a true near-dup), run
    // through the PRODUCTION pipeline (PNG encode -> decode -> DCT
    // pHash -> banded Hamming join) and measured against exact-Hamming
    // truth — the fourth member of the measured-recall family.
    val ids = spark.read.parquet(s"$sf1/documents.parquet")
      .filter(col("doc_id") < 1500)
      .select(col("doc_id"), xxhash64(col("text")).as("pat"))
      .as[(Long, Long)].collect() // fixture-sized (1500 rows)
    def img(pat: Long, shift: Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 32).foreach(x => (0 until 32).foreach { y =>
        // lumas in [40, 200): +40 never clips (the brightness
        // invariance precondition); the pattern varies per document
        val m = ((pat >>> ((x + y) % 8 * 8)) & 0xFF).toInt
        val v = 40 + (x * 131 + y * 37 + x * y * 13 + m * 7) % 160 + shift
        b.setRGB(x, y, v << 16 | v << 8 | v)
      })
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", out)
      out.toByteArray
    }
    val media = ids.toSeq.flatMap { case (id, pat) =>
      Seq((id, img(pat, 0)), (id + 10000000L, img(pat, 40)))
    }.toDF("media_id", "content")
    val sigs = media.as[(Long, Array[Byte])]
      .flatMap { case (id, c) => Multimodal.phashBytes(c).map(h => (id, h)) }
      .toDF("id", "sig").cache()
    try {
      val truth = sigs.as("x").crossJoin(sigs.as("y"))
        .filter(col("x.id") < col("y.id") &&
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))) <= 3)
        .count()
      val found = Multimodal.phashNearDupPairs(media).count()
      info(s"sf1 pHash recall: n_true=$truth n_found=$found")
      assert(truth >= 1500L, s"degenerate truth set ($truth) — fixture broken")
      assert(found * 10000L / truth >= 9000L,
        s"sf1 banded pHash recall ${found * 10000L / truth} < 9000 (x1e4)")
    } finally { sigs.unpersist(); () }
  }

  test("sf1 RHP embedding near-dup recall vs exact signature Hamming >= 0.90 over 3000 vectors") {
    assume(have, s"$sf1 absent — run tools/gen_sf1.py")
    // 1500 sf1 embeddings, each with a scaled-and-shifted copy
    // (x -> 1.25x + 0.01): signs flip only where a plane's dot sits
    // near zero, so copies land a few Hamming bits away — the
    // realistic near-dup regime where banding statistics (hot-band
    // caps) bite at volume. Truth = brute-force signature pairs at
    // <= 3 bits; found = the banded production kernel. The fifth
    // member of the measured-recall family.
    val e = spark.read.parquet(s"$sf1/embeddings.parquet")
      .filter(col("vec_id") < 1500)
    val corpus = e.select(col("vec_id"), col("embedding").as("ce"))
      .unionAll(e.select((col("vec_id") + 10000000L).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * 1.25d + 0.01d AS float))").as("ce")))
    val sigs = Ann.rhpSimhash(corpus).cache()
    try {
      val truth = sigs.as("x").crossJoin(sigs.as("y"))
        .filter(col("x.id") < col("y.id") &&
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))) <= 3)
        .count()
      val found = Ann.rhpNearDupPairs(corpus).count()
      info(s"sf1 RHP recall: n_true=$truth n_found=$found")
      // most copies land <= 3 bits out; the ~3% whose perturbation
      // crossed more planes fall outside BOTH sets by construction
      assert(truth >= 1000L, s"degenerate truth set ($truth) — fixture broken")
      assert(found * 10000L / truth >= 9000L,
        s"sf1 banded RHP recall ${found * 10000L / truth} < 9000 (x1e4)")
    } finally { sigs.unpersist(); () }
  }

  test("sf1 IVF recall vs brute-force >= 0.90 mean over 20 queries (nprobe=2/10)") {
    assume(have, s"$sf1 absent — run tools/gen_sf1.py")
    val e = spark.read.parquet(s"$sf1/embeddings.parquet")
    val c = e.select(col("vec_id"), col("embedding").as("ce"))
    val cent = Ann.ivfCentroids(c, 10, 2)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val rec = Ann.ivfRecall(q, c, cent, 10, 2)
      .agg(avg(col("recall_x1e4"))).head().getDouble(0)
    info(s"sf1 IVF mean recall_x1e4: $rec")
    assert(rec >= 9000.0, s"sf1 IVF mean recall $rec < 9000 (x1e4)")
  }
}
