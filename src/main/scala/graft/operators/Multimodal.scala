package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §2.10 L11): media as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches — the Spark-side plumbing (schema, partitioning, batch shape)
  * is real; the actual media decode is pluggable and STUBBED here with a
  * deterministic byte-level featurizer, because no image/audio codec
  * libraries exist in this environment.
  *
  * At scale this is the pattern for GPU/native decoders too: a
  * `mapPartitions` boundary gives the decoder a whole batch, keeps the
  * object loaded once per partition (not per row), and the narrow
  * dependency preserves upstream partitioning.
  */
object Multimodal {

  /** Decoder contract: bytes -> fixed-width feature vector. */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in for a real image/audio decoder: byte
    * histogram moments. Replace with a JNI/codec-backed decoder in a
    * real deployment — the plumbing around it does not change. */
  class ByteStatsDecoder(val featureDim: Int = 4) extends MediaDecoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      var sum = 0L; var mx = Int.MinValue; var mn = Int.MaxValue
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b; if (b > mx) mx = b; if (b < mn) mn = b; i += 1
      }
      val n = math.max(bytes.length, 1)
      Array(bytes.length.toFloat, sum.toFloat / n, mn.toFloat, mx.toFloat)
    }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Attach decoded features to a DataFrame holding a binary column.
    * One decoder instance per partition; rows stream through in batches
    * (Iterator semantics — no materialisation of the whole partition).
    */
  def withMediaFeatures(
      df: DataFrame,
      binaryCol: String,
      decoder: MediaDecoder = new ByteStatsDecoder()): DataFrame = {
    val outSchema = df.schema
      .add("media_features", ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      // decoder initialised once per partition — the expensive part for
      // real codecs; the stub keeps the same lifecycle
      rows.map { r =>
        val bytes = r.get(idx) match {
          case null => Array.empty[Byte]
          case b: Array[Byte] => b
        }
        Row.fromSeq(r.toSeq :+ decoder.decode(bytes).toSeq)
      }
    }(enc)
  }

  /** Frame-sample stand-in: pick every `stride`-th fixed-size block of a
    * binary payload (the batch/offset arithmetic a video frame sampler
    * needs, minus the codec). */
  def sampleBlocks(df: DataFrame, binaryCol: String, blockSize: Int, stride: Int): DataFrame =
    df.withColumn("sampled_blocks", expr(
      s"transform(sequence(0, greatest(cast(octet_length($binaryCol) / ($blockSize * $stride) as int) - 1, -1)), " +
      s"i -> substring($binaryCol, i * $blockSize * $stride + 1, $blockSize))"))
}
