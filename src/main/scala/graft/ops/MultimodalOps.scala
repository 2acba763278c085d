package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video ride through the pipeline as opaque `binary`
 * columns with a typed metadata struct alongside. The Spark-side machinery — schema, batch
 * iteration via `mapPartitions`, partition sizing — is real; the actual media decode is a
 * clearly-marked deterministic STUB (no image/audio codecs in this environment). Swapping the
 * stub for a real decoder (JNI/ffmpeg/ImageIO) changes only the body of [[decodeStub]].
 */
object MultimodalOps {

  /** Metadata schema attached to every media blob. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("content_md5", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  /**
   * Column-algebra metadata extraction (no decode needed): content hash + size + mime guess.
   * Codegen'd built-ins only, so it rides inside the scan's WholeStageCodegen span.
   */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      md5(col(binCol)).as("content_md5"),
      length(col(binCol)).cast("long").as("n_bytes"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(IntegerType).as("n_frames")))

  /**
   * STUB decode: derives fake-but-deterministic dimensions from the byte length.
   * A real implementation decodes `bytes` with an image/video library here; everything
   * around it (batched partition iteration, output schema, null handling) is production-shaped.
   */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    // ??? real codec goes here — deterministic fake keeps plumbing testable offline:
    val n = bytes.length
    (n % 640 + 1, n % 480 + 1, n % 30 + 1)
  }

  /**
   * "Decode" every blob partition-by-partition — the distributed pattern for per-item media
   * work (one task per partition, no driver collect, arbitrary native-lib init amortized per
   * partition via the iterator wrapper).
   */
  /**
   * Frame sampling for "video" blobs: one output row per sampled frame, with the frame
   * payload sliced out of the blob. Row-expansion via `mapPartitions` (explode-shaped;
   * partition-local, no driver involvement). The frame boundaries come from [[decodeStub]]
   * — a real codec would return actual frame offsets; the Spark plumbing (schema,
   * iterator expansion, partition sizing) is the production shape.
   */
  def sampleFrames(df: DataFrame, binCol: String, idCol: String, everyN: Int = 1): DataFrame = {
    require(everyN >= 1)
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (_, _, nFrames) = decodeStub(bytes)
        val frameLen = math.max(1, bytes.length / math.max(1, nFrames))
        (0 until nFrames by everyN).iterator.map { i =>
          val from = math.min(i * frameLen, bytes.length)
          val until = math.min(from + frameLen, bytes.length)
          Row(r.get(idIdx), i, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  def decodeMedia(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition init for a native decoder would go here
      rows.map { r =>
        val (w, h, f) = decodeStub(r.getAs[Array[Byte]](binIdx))
        Row(r.get(idIdx), w, h, f)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
