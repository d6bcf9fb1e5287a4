package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions._

/** Multimodal column plumbing: media (image/audio/video) travels as an
  * opaque `binary` payload column plus a typed metadata struct. The
  * Spark-side machinery — schema, batch iteration, partition-local
  * decode, derived-feature columns — is real; the actual byte decoding is
  * STUBBED with a deterministic fake (no image/audio codecs in this
  * container). Swapping `decodeStub` for a real codec keeps every plan
  * shape identical.
  *
  * Scale notes: payloads stay columnar (parquet binary) end-to-end; the
  * decode pass is `mapPartitions` (one JVM-side loop per partition, no
  * per-row driver involvement); derived features are plain columns so
  * Catalyst prunes untouched payload bytes out of scans that don't need
  * them.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("byte_len", LongType),
    StructField("header_hex", StringType)))

  /** Wrap a source column as a media payload: binary bytes + metadata
    * struct (content kind, byte length, first-8-bytes hex header).
    */
  def pack(df: DataFrame, idCol: String, srcCol: String, kind: String): DataFrame = {
    val payload = col(srcCol).cast(BinaryType)
    df.select(
      col(idCol),
      payload.as("payload"),
      struct(
        lit(kind).as("kind"),
        octet_length(payload).cast(LongType).as("byte_len"),
        lower(hex(substring(payload, 1, 8))).as("header_hex")).as("meta"))
  }

  /** STUB image decode: derives deterministic fake (width, height,
    * channels) from the payload hash — stands in for a real codec while
    * exercising the exact partition-wise batch path a real decoder uses.
    */
  def decodeImageStub(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType)))
    val payloadIdx = df.schema.fieldIndex("payload")
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        // ??? real decode goes here; the fake reads "dimensions" from a
        // stable byte hash so results are deterministic and testable.
        val h = java.util.Arrays.hashCode(bytes)
        val w = 256 + math.floorMod(h, 1024)
        val ht = 256 + math.floorMod(h / 1024, 1024)
        Row.fromSeq(r.toSeq ++ Seq(w, ht, 3))
      }
    }(enc)
  }

  /** Expression-level fake feature extraction (oracle-reproducible):
    * same contract as [[decodeImageStub]] but derived from the md5-based
    * portable hash so a SQL oracle can verify the plumbing end-to-end.
    */
  def fakeDimensions(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(srcCol).cast(BinaryType)).cast(LongType).as("byte_len"),
      hex(substring(col(srcCol), 1, 8).cast(BinaryType)).as("header_hex"),
      (lit(256) + hash60(col(srcCol)) % 1024).cast(IntegerType).as("width"),
      (lit(256) + hash60(reverse(col(srcCol))) % 1024).cast(IntegerType).as("height"))

  /** Deterministic frame sampling for a (fake) video payload: emit every
    * `stride`-th frame index below `nFrames` — the plumbing for
    * frame-level fan-out (posexplode), independent of any real codec.
    */
  def sampleFrames(df: DataFrame, idCol: String, nFrames: Int, stride: Int): DataFrame =
    df.select(col(idCol),
      posexplode(sequence(lit(0), lit(nFrames - 1), lit(stride))))
      .withColumnRenamed("pos", "sample_idx")
      .withColumnRenamed("col", "frame_idx")
}
