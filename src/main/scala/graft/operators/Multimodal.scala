package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side shape is real — schema, partition sizing, batched
  * per-partition execution, column pruning — but the DECODE KERNELS ARE
  * STUBS: this container has no image/audio codecs, so decode is a
  * clearly-marked deterministic fake (byte-histogram features, stride
  * slicing). Swapping in a real codec touches only the marked functions;
  * the distributed plumbing is unchanged.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", LongType))))))

  /** Manufacture a media table from any source table (deterministic fake
    * payloads so the pipeline is runnable/testable offline): media bytes =
    * UTF-8 of a text column; meta derived from its length. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(
        lit("fake/raw").as("format"),
        pmod(length(col(textCol)), lit(640)).cast("int").as("width"),
        pmod(length(col(textCol)), lit(480)).cast("int").as("height"),
        length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** ===== STUB ===== byte-histogram "features" standing in for a real
    * image/audio embedding model. Executes per-partition over the binary
    * column in fixed-size batches — exactly the call shape a real
    * vectorized decoder (or model server) needs. */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val featurize = udf { (bytes: Array[Byte]) =>
      // STUB: deterministic fake. Real impl: decode + model forward pass.
      if (bytes == null) null
      else {
        val h = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) { h((bytes(i) & 0xff) % dim) += 1f; i += 1 }
        val n = math.max(bytes.length, 1)
        h.map(_ / n)
      }
    }
    df.withColumn("features", featurize(col("media")))
  }

  /** ===== STUB ===== "frame sampling": slice the binary payload at a
    * byte stride, standing in for video frame extraction. Pure builtin
    * expressions (substring works on binary). */
  def frameSample(df: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    df.select(col("media_id"), col("meta"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, greatest(int(floor((length(media) - 1) / ${frameBytes * everyN})), 0)),
             |  i -> substring(media, i * ${frameBytes * everyN} + 1, $frameBytes))"""
            .stripMargin)).as(Seq("frame_no", "frame")))
      .where(length(col("frame")) > 0)

  /** Resize metadata transform (real): recompute meta after a decode
    * stage would rescale — demonstrates typed-struct column surgery. */
  def withResizedMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", col("meta")
      .withField("width", lit(w))
      .withField("height", lit(h)))
}
