package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time via
  * mapPartitions (the JVM analogue of arrow-batched pandas UDFs).
  *
  * The decode step is STUBBED (no media libraries in this build): the
  * "decoder" derives deterministic fake metadata from the bytes. The
  * Spark-side contract — schema, binary column handling, per-partition
  * batching, frame sampling by byte ranges — is real and tested; swap
  * `fakeDecode` for a real codec binding at deployment.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("kind", StringType, nullable = true)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sig", StringType, nullable = false)))

  /** Wrap a string column as a media table (test harness for the
    * binary path; real ingestion uses spark.read.format("binaryFile")). */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("content"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video").as("kind"))

  /** STUB decoder: deterministic fake metadata from the raw bytes.
    * A real build replaces the body with a codec call; the partition
    * iteration, null handling and output schema stay identical. */
  def fakeDecode(content: Array[Byte]): (Int, Int, Int, String) = {
    val n = content.length
    val digest = java.security.MessageDigest.getInstance("MD5").digest(content)
    val hex = digest.map("%02x".format(_)).mkString
    (n, 16 + math.floorMod(n, 640), 16 + math.floorMod(n * 31, 480), hex)
  }

  /** Batch "decode" over partitions — the mapInPandas-shaped hot path.
    * No driver collect; each task decodes its partition's rows. */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content", "kind").rdd.mapPartitions(_.map { r =>
      val bytes = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.emptyByteArray)
      val (n, w, h, sig) = fakeDecode(bytes)
      Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), n, w, h, sig)
    })
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Frame sampling by byte range: every `stride`-th window of `len`
    * bytes (a real video pipeline samples frames; the byte-window shape
    * and the explode-per-frame plan are the same). */
  def sampleFrames(media: DataFrame, stride: Int = 64, len: Int = 16): DataFrame =
    media.select(col("media_id"),
      posexplode(expr(
        s"transform(sequence(1, greatest(int(octet_length(content)) div $stride, 1)), " +
          s"i -> substring(content, (i - 1) * $stride + 1, $len))")).as(Seq("frame_no", "frame")))
}
