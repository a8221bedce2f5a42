package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * processed per-partition in batches. The Spark-side shape (schema,
  * partitioning, batch iteration, typed Encoders) is real and tested; the
  * actual media decode is a clearly-marked deterministic STUB because no
  * image/audio codecs ship in this environment — swap `decodeStub` for a
  * real decoder (JNI/FFI or vectorized batch call) without touching the
  * pipeline around it.
  */
object Multimodal {

  /** An opaque media payload with typed metadata. */
  final case class MediaRecord(
      doc_id: Long, content: Array[Byte], width: Int, height: Int, fmt: String)

  /** Extracted features (what a real decoder would emit per record). */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, feat_sum: Long)

  /** STUB decoder: deterministic byte-sum "feature". A real implementation
    * would decode `content` (JPEG/WAV/...) and emit embeddings or frames;
    * the signature and batch shape are what matter here.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var s = 0L
    var i = 0
    while (i < r.content.length) { s += (r.content(i) & 0xff); i += 1 }
    MediaFeatures(r.doc_id, r.content.length.toLong, r.width, r.height, s % 1000003L)
  }

  /** documents → media records: text bytes stand in for media payloads;
    * metadata derives deterministically from doc properties.
    */
  def mediaRecords(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      (pmod(col("n_chars"), lit(640)) + 1).cast("int").as("width"),
      (pmod(col("n_chars") * 3, lit(480)) + 1).cast("int").as("height"),
      element_at(array(lit("jpeg"), lit("png"), lit("wav")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"))
      .as[MediaRecord]
  }

  /** Batch decode: the Arrow/pandas-UDF shape — a BATCH of records in, a
    * batch of features out. A real decoder amortizes codec/model init and
    * vectorizes over the batch; the stub applies [[decodeStub]] per
    * element but the call boundary is the batch, so swapping in a
    * vectorized decoder touches only this function.
    */
  def decodeBatchStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map(decodeStub)

  /** The batch-decode pipeline: co-locate by doc_id, then decode each
    * partition as a stream of fixed-size batches
    * (`Iterator[Batch] → Iterator[Features]`) — the mapPartitions shape a
    * Pandas-UDF/Arrow batch decoder uses, with bounded memory per batch.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame, partitions: Int = 8,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    mediaRecords(spark, docs)
      .repartition(partitions, col("doc_id"))
      .mapPartitions(_.grouped(batchSize).flatMap(decodeBatchStub))
      .toDF()
  }

  /** STUB resize: stride-downsample the payload to the byte budget the
    * target dimensions imply (dstArea/srcArea of the source bytes, ≥ 1),
    * metadata rewritten to the target. Stands in for a pixel resample —
    * a real implementation swaps the body, keeps the signature. Upscaling
    * keeps all bytes (no interpolation to invent).
    */
  def resizeStub(r: MediaRecord, targetW: Int, targetH: Int): MediaRecord = {
    val n = r.content.length
    val srcArea = r.width.toLong * r.height
    val dstArea = targetW.toLong * targetH
    val keep =
      if (n == 0 || dstArea >= srcArea) n
      else math.max(1L, (n * dstArea) / srcArea).toInt
    val out = new Array[Byte](keep)
    var i = 0
    while (i < keep) { out(i) = r.content(((i.toLong * n) / math.max(1, keep)).toInt); i += 1 }
    MediaRecord(r.doc_id, out, targetW, targetH, r.fmt)
  }

  /** One sampled frame: fixed-size byte window + rolling checksum (what a
    * real frame grab would hand to a downstream encoder).
    */
  final case class FrameRecord(doc_id: Long, frame_idx: Int, n_bytes: Long, checksum: Long)

  val FrameBytes: Int = 64

  /** STUB frame sampling: treat the payload as consecutive [[FrameBytes]]
    * windows and keep every `everyN`-th — the video-keyframe-sampling
    * shape (one record in, k frame records out).
    */
  def sampleFramesStub(r: MediaRecord, everyN: Int): Seq[FrameRecord] =
    r.content.grouped(FrameBytes).zipWithIndex.collect {
      case (f, idx) if idx % everyN == 0 =>
        var s = 0L
        f.foreach(b => s = (s * 131 + (b & 0xff)) % 1000000007L)
        FrameRecord(r.doc_id, idx, f.length.toLong, s)
    }.toSeq

  /** Full multimodal pipeline: decode-batch → resize → frame-sample →
    * per-doc summary, all inside ONE mapPartitions pass (one batch
    * boundary, no per-record calls across it) + one aggregation shuffle.
    * This is the end-to-end shape a real media pipeline runs at scale:
    * the expensive stages stay co-partitioned and batched; only the
    * O(docs) summary shuffles.
    */
  def framePipeline(spark: SparkSession, docs: DataFrame, targetW: Int = 64,
      targetH: Int = 64, everyN: Int = 2, partitions: Int = 8,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    mediaRecords(spark, docs)
      .repartition(partitions, col("doc_id"))
      .mapPartitions(_.grouped(batchSize).flatMap(batch =>
        batch.flatMap(r => sampleFramesStub(resizeStub(r, targetW, targetH), everyN))))
      .toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum("n_bytes").as("bytes_kept"),
        sum("checksum").as("checksum_sum"))
  }
}
