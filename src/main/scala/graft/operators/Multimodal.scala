package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, partition-wise decode, and frame sampling.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment) with a deterministic fake derived from the bytes — the
  * Spark-side contract is real: binary columns, explicit output
  * schema, `mapPartitions` batch shape (the Scala analog of
  * `mapInPandas`), lazy per-partition iteration so a 100 TB blob
  * column streams through executors without materializing a partition
  * in memory.
  */
object Multimodal {

  /** Wrap a text column as an opaque blob + surface-level metadata
    * (what a real pipeline stores next to s3 pointers). Narrow. */
  def asBlob(docs: DataFrame, payloadCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      col(payloadCol).cast("binary").as("blob"),
      octet_length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol).cast("binary")).as("digest"))

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))

  /** STUB decoder: stands in for an image/audio decode
    * (`ImageIO.read` / ffmpeg / soundfile would slot in here). The
    * fake dims are a deterministic function of the payload bytes so
    * tests can assert plumbing end-to-end. Signature and batch shape
    * (Iterator→Iterator per partition, constant memory) are the real
    * contract. */
  def decodeStub(blobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    blobs.select(col("doc_id"), col("blob")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // ??? real decoder goes here — deterministic fake below
        val w = 64 + (if (bytes.nonEmpty) (bytes(0) & 0x3f) else 0)
        val h = 64 + (if (bytes.length > 1) (bytes(1) & 0x3f) else 0)
        val mean = if (bytes.isEmpty) 0.0 else bytes.map(_ & 0xff).sum.toDouble / bytes.length
        Row(id, w, h, 3, mean)
      }
    }(enc)
  }

  /** Byte-histogram featurization: a fixed-length numeric feature
    * vector (16 buckets over byte values) per blob — the stand-in for
    * an embedding/feature-extraction stage (CLIP features, mel
    * spectrogram stats, …), with the real contract: binary in,
    * `array<double>` out, constant-memory per-partition iteration.
    * Deterministic, so downstream similarity search over the features
    * is testable; plugs straight into [[Similarity]] (vec_dot works on
    * any array<double>). */
  def featurize(blobs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    blobs.select(col("doc_id"), col("blob")).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Double](16)
        bytes.foreach(b => hist((b & 0xff) >> 4) += 1.0)
        val n = math.max(bytes.length, 1).toDouble
        Row(r.getLong(0), hist.map(_ / n).toSeq)
      }
    }(enc)
  }

  /** Scene-change detection over sampled frames: a frame is a "cut"
    * when its content hash differs from the previous frame's (or it is
    * the first frame). The video-segmentation shape — one window
    * shuffle keyed on the doc, cuts numbered per doc so downstream can
    * group frames into scenes. */
  def sceneChanges(frames: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val wRun = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    frames
      .withColumn("__prev", lag(col("frame_md5"), 1).over(w))
      .withColumn("is_cut",
        (col("__prev").isNull || col("__prev") =!= col("frame_md5")).cast("int").cast("long"))
      .withColumn("scene_id", sum(col("is_cut")).over(wRun) - 1)
      .drop("__prev")
  }

  /** Frame sampling: cut the payload into fixed-size frames, keep the
    * first `maxFrames`, hash each — the shape of video frame-sample /
    * audio-chunk features. Narrow (sequence + substring per row). */
  def frames(docs: DataFrame, frameSize: Int = 32, maxFrames: Int = 4,
             payloadCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), col(payloadCol).as("p"),
        explode(sequence(lit(0L), lit(maxFrames - 1L))).as("frame_idx"))
      .filter(col("frame_idx") * frameSize < length(col("p")))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(p, frame_idx * $frameSize + 1, $frameSize)").cast("binary")).as("frame_md5"))
}
