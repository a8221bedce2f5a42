package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * processed per-partition in batches.
  *
  * The payloads are REAL images: binary PPM (P6), an uncompressed format
  * with a pure-JVM codec below — header parse, pixel decode and
  * nearest-neighbor resize are actual image operations, not stand-ins.
  * Compressed formats (JPEG/WAV/...) have no codecs in this environment,
  * so records whose `fmt` isn't "ppm" fall back to the clearly-marked
  * deterministic byte-sum STUB path (`decodeStub`/`resizeStub`); a real
  * deployment swaps that branch for a JNI/FFI or vectorized batch codec
  * without touching the pipeline around it.
  */
object Multimodal {

  /** An opaque media payload with typed metadata. */
  final case class MediaRecord(
      doc_id: Long, content: Array[Byte], width: Int, height: Int, fmt: String)

  /** Extracted features (per decoded record): payload size in PIXEL bytes,
    * the dimensions parsed FROM the payload (not trusted metadata), and a
    * bounded checksum feature over the decoded pixels.
    */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, feat_sum: Long)

  // ---- PPM (P6) codec: pure JVM, no external libraries -------------------

  /** A decoded image: dimensions + packed RGB pixels (3 bytes/pixel). */
  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte])

  /** Encode an RGB grid as binary PPM. `seed` bytes cycle through the
    * pixel buffer (deterministic synthetic imagery for the testdata docs).
    */
  def encodePpm(w: Int, h: Int, seed: Array[Byte]): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val n = 3 * w * h
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) {
      out(header.length + i) = if (seed.isEmpty) i.toByte else seed(i % seed.length)
      i += 1
    }
    out
  }

  /** Parse binary PPM: magic, ASCII dimensions and maxval tokens
    * (whitespace-delimited, '#' comments skipped), a single whitespace,
    * then 3·w·h raw pixel bytes.
    */
  def decodePpm(b: Array[Byte]): PpmImage = {
    var p = 0
    def isWs(c: Byte): Boolean = c == '\n' || c == ' ' || c == '\t' || c == '\r'
    def token(): String = {
      while (p < b.length && (isWs(b(p)) || b(p) == '#')) {
        if (b(p) == '#') { while (p < b.length && b(p) != '\n') p += 1 }
        else p += 1
      }
      val s = p
      while (p < b.length && !isWs(b(p))) p += 1
      new String(b, s, p - s, "US-ASCII")
    }
    require(token() == "P6", "not a binary PPM payload")
    val w = token().toInt
    val h = token().toInt
    require(token().toInt == 255, "unsupported maxval")
    p += 1 // the single whitespace separating the header from pixel data
    val n = 3 * w * h
    require(b.length - p >= n, s"truncated PPM: need $n pixel bytes, have ${b.length - p}")
    PpmImage(w, h, java.util.Arrays.copyOfRange(b, p, p + n))
  }

  /** Nearest-neighbor resample to (tw, th) — a real pixel-space resize. */
  def resizePpm(img: PpmImage, tw: Int, th: Int): PpmImage = {
    val out = new Array[Byte](3 * tw * th)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.width / tw).toInt
        var c = 0
        while (c < 3) {
          out((y * tw + x) * 3 + c) = img.pixels((sy * img.width + sx) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PpmImage(tw, th, out)
  }

  // ---- record-level ops (PPM-real, stub fallback for other formats) ------

  /** STUB decoder for formats with no codec here: deterministic byte-sum
    * "feature" over the raw payload, metadata passed through.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var s = 0L
    var i = 0
    while (i < r.content.length) { s += (r.content(i) & 0xff); i += 1 }
    MediaFeatures(r.doc_id, r.content.length.toLong, r.width, r.height, s % 1000003L)
  }

  /** Decode one record: PPM payloads are actually parsed (dimensions come
    * from the HEADER; feat_sum is a checksum of the decoded pixels), other
    * formats take the stub path.
    */
  def decode(r: MediaRecord): MediaFeatures =
    if (r.fmt == "ppm") {
      val img = decodePpm(r.content)
      var s = 0L
      var i = 0
      while (i < img.pixels.length) { s += (img.pixels(i) & 0xff); i += 1 }
      MediaFeatures(r.doc_id, img.pixels.length.toLong, img.width, img.height,
        s % 1000003L)
    } else decodeStub(r)

  /** STUB resize for codec-less formats: stride-downsample the payload to
    * the byte budget the target dimensions imply (≥ 1), metadata rewritten
    * to the target. Upscaling keeps all bytes (no interpolation to invent).
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

  /** Resize one record: PPM payloads get a true nearest-neighbor resample
    * (decode → resample → re-encode), other formats the stub.
    */
  def resize(r: MediaRecord, targetW: Int, targetH: Int): MediaRecord =
    if (r.fmt == "ppm") {
      val img = resizePpm(decodePpm(r.content), targetW, targetH)
      MediaRecord(r.doc_id, encodePpm(img.width, img.height, img.pixels),
        targetW, targetH, r.fmt)
    } else resizeStub(r, targetW, targetH)

  /** documents → media records: each doc becomes a small real PPM image
    * whose pixels cycle the doc's text bytes; dimensions derive
    * deterministically from doc properties (bounded so the synthetic
    * corpus stays MB-scale at every SF).
    */
  def mediaRecords(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        // Cross-engine pixel-parity pin: the DuckDB oracles replay the
        // pixel bytes as ascii(substr(text, i % len + 1, 1)), which
        // equals text.getBytes("UTF-8")(i % len) ONLY for non-empty
        // ASCII text (a multi-byte codepoint desyncs the byte index; an
        // empty text makes % len NULL in SQL while encodePpm falls back
        // to its i.toByte ramp). Fail loudly at the codec boundary
        // rather than silently diverge the two engines' signatures.
        require(text.nonEmpty && text.forall(_ < 128),
          s"documents.text must be non-empty ASCII for oracle pixel parity (doc_id=$id)")
        val w = (n % 16 + 1).toInt
        val h = (n * 3 % 12 + 1).toInt
        MediaRecord(id, encodePpm(w, h, text.getBytes("UTF-8")), w, h, "ppm")
      }
  }

  /** Batch decode: the Arrow/pandas-UDF shape — a BATCH of records in, a
    * batch of features out. A real compressed-format decoder amortizes
    * codec/model init over the batch; the call boundary is the batch, so
    * swapping in a vectorized decoder touches only this function.
    */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map(decode)

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
      .mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
      .toDF()
  }

  /** One sampled frame: fixed-size byte window + rolling checksum (what a
    * real frame grab would hand to a downstream encoder).
    */
  final case class FrameRecord(doc_id: Long, frame_idx: Int, n_bytes: Long, checksum: Long)

  val FrameBytes: Int = 64

  /** Frame sampling: treat the payload as consecutive [[FrameBytes]]
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

  /** Full multimodal pipeline: decode-batch → resize (real, for PPM) →
    * frame-sample → per-doc summary, all inside ONE mapPartitions pass
    * (one batch boundary, no per-record calls across it) + one
    * aggregation shuffle. This is the end-to-end shape a real media
    * pipeline runs at scale: the expensive stages stay co-partitioned and
    * batched; only the O(docs) summary shuffles.
    */
  def framePipeline(spark: SparkSession, docs: DataFrame, targetW: Int = 64,
      targetH: Int = 64, everyN: Int = 2, partitions: Int = 8,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    mediaRecords(spark, docs)
      .repartition(partitions, col("doc_id"))
      .mapPartitions(_.grouped(batchSize).flatMap(batch =>
        batch.flatMap(r => sampleFramesStub(resize(r, targetW, targetH), everyN))))
      .toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum("n_bytes").as("bytes_kept"),
        sum("checksum").as("checksum_sum"))
  }
}
