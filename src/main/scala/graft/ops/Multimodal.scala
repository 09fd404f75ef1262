package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata structs. The actual codec calls
 * are STUBBED with a deterministic fake (this container has no image or
 * audio libraries) — the Spark-side contract is real: schemas,
 * iterator-to-iterator partition processing (the Scala analogue of
 * `mapInPandas`: batched, no per-row JVM↔driver traffic), and
 * partitioning guidance for 100 TB media corpora (partition by content
 * hash; keep `spark.sql.files.maxPartitionBytes` small because rows are
 * fat; never collect payloads to the driver).
 */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  final case class MediaMeta(media_id: Long, byte_len: Long, format: String,
                             width: Int, height: Int, n_frames: Int,
                             content_hash: String)

  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /**
   * Header-level decode. PNG and JPEG dimensions are parsed for real
   * from the byte stream (magic + IHDR / SOF marker walk — no codec
   * library needed); anything else falls back to a DETERMINISTIC FAKE
   * that stands in for a full codec (this container has no media
   * libraries). A real deployment swaps only the fallback for a
   * JNI/codec call; the partition-iterator pipeline around it is final.
   */
  private[ops] def fakeDecode(payload: Array[Byte]): (String, Int, Int, Int) = {
    def be32(i: Int): Int =
      ((payload(i) & 0xff) << 24) | ((payload(i + 1) & 0xff) << 16) |
        ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
    def be16(i: Int): Int = ((payload(i) & 0xff) << 8) | (payload(i + 1) & 0xff)

    val isPng = payload.length >= 24 &&
      (payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
      payload(2) == 'N' && payload(3) == 'G'
    val isJpeg = payload.length >= 4 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8

    if (isPng) {
      // IHDR is the first chunk: length(4) type(4) at offset 8; w/h at 16/20
      ("png", be32(16), be32(20), 1)
    } else if (isJpeg) {
      // walk markers to the first SOF0-SOF15 (except DHT/DAC/RST);
      // fill bytes and length-less markers (TEM, RSTn) advance without
      // reading a bogus length field
      var i = 2
      var dims: Option[(Int, Int)] = None
      while (dims.isEmpty && i + 9 < payload.length &&
             (payload(i) & 0xff) == 0xff) {
        val marker = payload(i + 1) & 0xff
        if (marker == 0xff) {
          i += 1 // fill byte: next 0xff starts the real marker
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // TEM / RSTn: standalone, no length segment
        } else if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          dims = Some((be16(i + 7), be16(i + 5))) // (width, height)
        } else {
          i += 2 + be16(i + 2)
        }
      }
      val (w, h) = dims.getOrElse((0, 0))
      ("jpeg", w, h, 1)
    } else {
      // deterministic fake for formats needing a real codec (video etc.)
      val h = payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff))
      val fmt = if (math.floorMod(h, 2L) == 0L) "mp4" else "bin"
      val w = 64 + math.floorMod(h >> 8, 1024L).toInt
      val ht = 64 + math.floorMod(h >> 18, 1024L).toInt
      val frames = if (fmt == "mp4") 1 + math.floorMod(h >> 28, 240L).toInt else 1
      (fmt, w, ht, frames)
    }
  }

  /**
   * Decode + feature-extract metadata over a binary media column.
   * Iterator-to-iterator `mapPartitions`: a codec context could be
   * opened once per partition (the `it.map` body is the batch loop).
   */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init: one digest instance, reset per row; hex via
      // lookup table (no per-byte format/boxing on the hot loop)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hexDigits = "0123456789abcdef".toCharArray
      it.map { row =>
        val (fmt, w, h, frames) = fakeDecode(row.payload)
        md.reset()
        val d = md.digest(row.payload)
        val hex = new Array[Char](d.length * 2)
        var i = 0
        while (i < d.length) {
          hex(i * 2) = hexDigits((d(i) >> 4) & 0xf)
          hex(i * 2 + 1) = hexDigits(d(i) & 0xf)
          i += 1
        }
        MediaMeta(row.media_id, row.payload.length.toLong, fmt, w, h, frames,
          new String(hex))
      }
    }
  }

  /**
   * Frame sampling: every `stride`-th frame of each video payload as its
   * own row (fake frames = deterministic byte slices). The output
   * explodes row counts — repartition by media_id first so one fat video
   * doesn't pin a single task.
   */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        val (fmt, _, _, frames) = fakeDecode(row.payload)
        if (fmt != "mp4") Iterator.empty
        else (0 until frames by stride).iterator.map { f =>
          val start = math.floorMod(f * 7, math.max(row.payload.length, 1))
          val len = math.min(16, row.payload.length - start)
          FrameRow(row.media_id, f, row.payload.slice(start, start + len))
        }
      }
    }
  }

  /**
   * Column-level content hash + size audit for a binary column — pure
   * built-ins (sha2 is codegen'd), used for exact payload dedup at scale
   * (group on the 32-byte digest, not the payload).
   */
  def payloadAudit(df: DataFrame, binCol: String, idCol: String): DataFrame =
    df.select(col(idCol), length(col(binCol)).cast(LongType).as("byte_len"),
      sha2(col(binCol), 256).as("content_hash"))

  /**
   * Decode-batch plan: assign each payload to a decode batch of roughly
   * `maxBatchBytes` within its group, by the running-byte-offset scheme
   * [[Pipeline.packTokenBins]] uses for tokens — batch = the bin where
   * the payload STARTS, so a batch may overrun by at most one payload
   * (the decoder's working-set guarantee is maxBatchBytes + one item,
   * which is what a codec/GPU staging buffer actually needs to plan
   * for). Deterministic given the (group, id) order; the plan is
   * metadata-only — payload bytes are read for their length, nothing
   * is decoded or moved.
   *
   * Scale: one shuffle on the group key, then a ROWS-frame running sum
   * inside the ordered group — O(items per group), no re-scan. Groups
   * are the parallelism unit: shard media by content-hash prefix (or
   * source) so no single group serializes a corpus.
   */
  def decodeBatchPlan(df: DataFrame, binCol: String, idCol: String,
                      groupCol: String, maxBatchBytes: Long): DataFrame = {
    require(maxBatchBytes > 0, s"maxBatchBytes must be positive: $maxBatchBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("byte_len", length(col(binCol)).cast(LongType))
      .withColumn("__cum", sum(col("byte_len")).over(w))
      .select(col(groupCol), col(idCol), col("byte_len"),
        floor((col("__cum") - col("byte_len")) / lit(maxBatchBytes))
          .as("batch_id"))
  }

  /**
   * Byte-range chunk manifest for oversized payloads: split every
   * payload into fixed `chunkBytes` ranges (last chunk ragged), one
   * row per chunk with its offset/length — the metadata a parallel
   * range-read decode stage consumes (each worker fetches only its
   * [off, off+len) slice of the blob store object, so a 4 GB video
   * never single-threads one task). Empty payloads yield no chunks.
   * Output: (idCol, chunk_idx, off, len).
   *
   * Scale shape: metadata-only — the manifest computes from the
   * payload LENGTH (parquet statistics-friendly), payload bytes are
   * never read, and the in-row sequence explode is bounded by
   * payload_size / chunkBytes.
   */
  def chunkManifest(df: DataFrame, binCol: String, idCol: String,
                    chunkBytes: Int): DataFrame = {
    require(chunkBytes >= 1, s"chunkBytes must be >= 1: $chunkBytes")
    df.select(col(idCol), length(col(binCol)).cast("long").as("__n"))
      .where(col("__n") > 0)
      .select(col(idCol), col("__n"),
        explode(sequence(lit(0L),
          expr(s"(__n - 1) div $chunkBytes"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * chunkBytes).as("off"),
        least(lit(chunkBytes.toLong),
          col("__n") - col("chunk_idx") * chunkBytes).as("len"))
  }

  /**
   * Overlapping segment plan for long audio/video payloads — the
   * Whisper-style decode schedule (fixed window, fixed hop < window,
   * so consecutive segments overlap and no boundary word is lost).
   * Durations derive from payload LENGTH under the container's fake
   * 1 byte = 1 ms codec contract (the honest-fake decode documented at
   * [[fakeDecode]]); the real-codec swap changes only that one line.
   * Segments start at 0, hop, 2·hop, … while start < duration; each
   * ends at min(start + win, duration) — the last segment is ragged,
   * never empty. Empty payloads yield no segments.
   *
   * Unlike [[chunkManifest]] (disjoint BYTE ranges for parallel blob
   * reads), this plans overlapping TIME ranges for a decoder —
   * overlap is the point, so the two are not interchangeable.
   * Metadata-only: lengths only, nothing decoded; the in-row explode
   * is bounded by duration / hop. Output: (idCol, seg_idx, start_ms,
   * end_ms).
   */
  def segmentPlan(df: DataFrame, binCol: String, idCol: String,
                  winMs: Long, hopMs: Long): DataFrame = {
    require(winMs >= 1 && hopMs >= 1 && hopMs <= winMs,
      s"need 1 <= hopMs <= winMs: win=$winMs hop=$hopMs")
    df.select(col(idCol), length(col(binCol)).cast(LongType).as("__dur"))
      .where(col("__dur") > 0)
      .select(col(idCol), col("__dur"),
        explode(sequence(lit(0L),
          expr(s"(__dur - 1) div $hopMs"))).as("seg_idx"))
      .select(col(idCol), col("seg_idx"),
        (col("seg_idx") * hopMs).as("start_ms"),
        least(col("seg_idx") * hopMs + winMs, col("__dur")).as("end_ms"))
  }

  /**
   * Modality router: classify payloads by their magic bytes (PNG /
   * JPEG / RIFF containers, else raw text) and report per-modality
   * volume \u2014 the fan-out decision before per-modality decode stages
   * (images to the vision pipeline, audio/video to segmenting, text
   * to the t-family). The magic compare runs on a base64 of the first
   * bytes so it is pure built-ins on both engines; payload BYTES are
   * read only for the 4-byte prefix and the length \u2014 a columnar
   * reader prunes the rest.
   *
   * Output: (modality, n_payloads, total_bytes, avg_bytes).
   */
  def modalityRoute(df: DataFrame, binCol: String): DataFrame = {
    val magic = base64(substring(col(binCol), 1, 4))
    // JPEG is matched on the 3-byte FF D8 FF prefix: the 4th byte
    // varies by container (E0 JFIF, E1 EXIF, DB/EE raw/Adobe...).
    val magic3 = base64(substring(col(binCol), 1, 3))
    val pngB64 = java.util.Base64.getEncoder.encodeToString(
      Array[Byte](0x89.toByte, 'P', 'N', 'G'))
    val jpgB64 = java.util.Base64.getEncoder.encodeToString(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte))
    val riffB64 = java.util.Base64.getEncoder.encodeToString(
      "RIFF".getBytes("US-ASCII"))
    df.select(
        when(magic === pngB64, lit("image/png"))
          .when(magic3 === jpgB64, lit("image/jpeg"))
          .when(magic === riffB64, lit("audio/riff"))
          .otherwise(lit("text/plain")).as("modality"),
        length(col(binCol)).cast(LongType).as("__n"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_payloads"), sum(col("__n")).as("total_bytes"),
        avg(col("__n").cast("double")).as("avg_bytes"))
  }

  /**
   * Content fingerprint for an opaque payload — the pHash-shaped
   * plumbing for binary media dedup: byte stream → hex → sliding
   * character n-grams (native codegen hashes) → 64-bit SimHash.
   * Locality-sensitive over BYTES: payloads differing in a few bytes
   * differ in ≤ `gram`·bytes grams out of thousands, so their
   * fingerprints sit within a small Hamming distance. A true
   * PERCEPTUAL hash (DCT over decoded pixels) needs the codec this
   * container doesn't have — swapping the hex-gram stage for a
   * pixel-grid stage is the only change; the fingerprint width,
   * blocking and pairing downstream are final.
   */
  def payloadFingerprint(payload: Column, gram: Int = 4): Column = {
    require(gram >= 1 && gram <= 16, s"gram must be in [1,16], got $gram")
    val chars = filter(split(hex(payload), ""), c => c =!= "")
    // native single-pass fold (simhash64's doGenCode) — the SQL
    // simhashFromHashes makes 64 aggregate passes over the gram array,
    // which at 2 grams/byte turns payload-linear into payload×64
    graft.functions.NativeExpressions.simhash64(
      graft.functions.NativeExpressions.ngramHashes(chars, gram))
  }

  /**
   * Near-duplicate payload pairs (id_a, id_b, dist) within Hamming
   * `maxDist` of each other's [[payloadFingerprint]] — media-corpus
   * near-dedup without decoding. The pair join is
   * [[Dedup.fingerprintPairs]]' Manku blocking: one shuffle of slim
   * (chunk, value, id, fp) rows, in-row pair expansion, `maxBucket`
   * skew cap; payload BYTES never shuffle (the fingerprint pass is
   * map-only over the scan). Exact duplicates hash identically, so
   * recall at dist 0 is total — the structural oracle's pin.
   */
  def payloadNearDups(df: DataFrame, idCol: String, payloadCol: String,
                      maxDist: Int = 3, gram: Int = 4,
                      maxBucket: Int = 10000): DataFrame =
    Dedup.fingerprintPairs(
      df.select(col(idCol).cast(LongType).as("__mid"),
        payloadFingerprint(col(payloadCol), gram).as("__mfp")),
      "__mid", "__mfp", maxDist, maxBucket)
}
