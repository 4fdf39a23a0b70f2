package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Rng

/** Multimodal columns as opaque binaries with typed metadata.
  *
  * The Spark-side plumbing — schema, typed Dataset rows, partition-preserving
  * mapPartitions batches, feature schema — is real and tested. The actual
  * media decode is STUBBED (===> StubDecoder <===): this container has no
  * image/audio codecs, so the decoder is a deterministic fake that derives
  * "pixels" from the bytes. Swapping in a real codec changes only
  * [[StubDecoder.decode]]; every Spark contract stays identical.
  *
  * At 100 TB the working set is dominated by the binary column: the scan
  * must prune it unless requested. MultimodalSpec verifies this on a real
  * parquet scan: a query touching only (id, kind) has a ReadSchema WITHOUT
  * `bytes`, while [[metadata]] (whose n_bytes/magic derive from the payload)
  * legitimately reads it — via codegen'd column ops, never the decoder.
  */
object Multimodal {

  final case class MediaRow(id: Long, kind: String, bytes: Array[Byte])
  final case class MediaMeta(id: Long, kind: String, n_bytes: Long, magic: String)
  final case class MediaFeatures(id: Long, kind: String, width: Int, height: Int, features: Array[Double])

  /** ===> StubDecoder <=== deterministic fake standing in for a codec. */
  object StubDecoder {
    /** "Decode" bytes to a (width, height, pixels) grayscale image: the fake
      * derives a square image from a seeded hash of the payload. A real
      * implementation would call the codec here — signature unchanged. */
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Array[Double]) = {
      // null payload (a null-text doc through fakeMediaFromDocs — encode of
      // NULL is NULL) decodes like an empty one: the contract everywhere in
      // this module is that a malformed/absent payload NEVER crashes the
      // batch (round-6 review)
      val b0 = if (bytes == null) Array.empty[Byte] else bytes
      val side = math.max(2, math.min(8, b0.length / 16))
      val px = new Array[Double](side * side)
      var i = 0
      while (i < px.length) {
        val b = if (b0.isEmpty) 0L else b0(i % b0.length).toLong
        px(i) = (Rng.hash2(b, i.toLong) & 0xFF).toDouble / 255.0
        i += 1
      }
      (side, side, px)
    }

    /** Nearest-neighbor "resize" on the fake pixel grid (real kernel TBD). */
    def resize(w: Int, h: Int, px: Array[Double], newW: Int, newH: Int): Array[Double] = {
      val out = new Array[Double](newW * newH)
      var y = 0
      while (y < newH) {
        var x = 0
        while (x < newW) {
          out(y * newW + x) = px((y * h / newH) * w + (x * w / newW))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** REAL header parsing for container formats whose typed metadata is pure
    * byte arithmetic — no codec required, so this part of the decode path is
    * NOT stubbed. BMP (BITMAPINFOHEADER: 'BM', int32-LE width/height at
    * offsets 18/22) and WAV (RIFF/WAVE; the `fmt ` chunk is found by
    * WALKING the chunk list, so LIST/INFO/fact chunks before it are skipped
    * — uint16-LE channels / uint32-LE sample rate / uint16-LE bits at
    * offsets 2/4/14 within the chunk) cover the image/audio metadata
    * contract; entropy-coded formats (JPEG/PNG/MP3) still route to
    * [[StubDecoder]]. */
  object Headers {
    final case class MediaHeader(
        format: String, width: Int, height: Int,
        channels: Int, sampleRate: Int, bitsPerSample: Int)

    private[multimodal] def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    private[multimodal] def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    private[multimodal] def ascii(b: Array[Byte], off: Int, s: String): Boolean = {
      var i = 0
      while (i < s.length) { if (b(off + i) != s.charAt(i).toByte) return false; i += 1 }
      true
    }

    /** Walk the RIFF chunk list of a WAVE payload for the chunk with the
      * given 4-byte id, returning (dataOffset, dataSize) of its content.
      * Real-world PCM WAVs interleave LIST/INFO/fact chunks between `fmt `
      * and `data` — pinning fixed offsets (the round-5 form) silently
      * yielded zero frames on any non-canonical layout (ADVICE r5). Chunks
      * are word-aligned: an odd-sized chunk is followed by one pad byte.
      * Malformed sizes (negative, or running past the payload) stop the
      * walk — a truncated upload must yield None, never a wild read. */
    private[multimodal] def findRiffChunk(
        bytes: Array[Byte], id: String): Option[(Int, Int)] = {
      // the WHOLE walk is in Long: the round-6 fix moved only the bounds
      // GUARD to Long, but the `off += 8 + size + pad` advance stayed Int —
      // an odd-sized final chunk ending exactly at a ~2 GiB payload's EOF
      // wrapped `off` negative and the next read threw on an executor
      // (ADVICE r7, same overflow class one expression over). Reads take
      // Int offsets — safe, the guard has already bounded off ≤ length.
      var off = 12L // past RIFF<size>WAVE
      while (off + 8L <= bytes.length) {
        val size = le32(bytes, (off + 4L).toInt)
        if (size < 0 || off + 8L + size.toLong > bytes.length) return None
        if (ascii(bytes, off.toInt, id)) return Some(((off + 8L).toInt, size))
        off += 8L + size.toLong + (size & 1).toLong
      }
      None
    }

    def parse(bytes: Array[Byte]): Option[MediaHeader] =
      // null payload → unparseable (the typedMetadata 'unknown' path), not
      // an executor NPE — fakeMediaFromDocs emits null bytes for null-text
      // docs (round-6 review)
      if (bytes == null) None
      else if (bytes.length >= 26 && ascii(bytes, 0, "BM"))
        Some(MediaHeader("bmp", le32(bytes, 18), le32(bytes, 22), 0, 0, 0))
      else if (bytes.length >= 36 && ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE"))
        // fmt fields at offsets 2/4/14 within the fmt chunk's content —
        // located by the chunk walk, not a pinned file offset
        findRiffChunk(bytes, "fmt ").collect { case (o, sz) if sz >= 16 =>
          MediaHeader("wav", 0, 0, le16(bytes, o + 2), le32(bytes, o + 4), le16(bytes, o + 14))
        }
      else None
  }

  /** Deterministic synthetic BMP/WAV/garbage payloads derived from
    * (doc_id, text) — the fixture that puts [[Headers.parse]] under the
    * bitwise DuckDB gate (q_media_headers): the oracle recomputes the
    * EXPECTED field values from the same (doc_id, text) arithmetic, while
    * Spark round-trips them through encode → parse. Encoding uses
    * ByteBuffer little-endian writes — an INDEPENDENT code path from
    * parse's manual byte arithmetic, so a sign or offset error on either
    * side fails the gate (they cannot share a compensating bug).
    *
    * Field spec (mirrored in the oracle SQL, integer arithmetic only):
    *  - doc_id % 7 == 0 → garbage (leading 0x00 — never a valid magic)
    *  - else even doc_id → BMP: width = (len(text) % 3000) + 1,
    *    height = −((doc_id % 2000)+1) when doc_id % 3 == 0 (top-down BMPs
    *    have NEGATIVE height — exercises signed le32) else
    *    (doc_id % 100000) + 1
    *  - else (odd) → WAV: channels = (doc_id % 8)+1,
    *    sample_rate = 8000 + (doc_id % 6)·8000,
    *    bits = [8,16,24,32][doc_id % 4] */
  object SyntheticMedia {
    def bytes(id: Long, text0: String): Array[Byte] = {
      val text = if (text0 == null) "" else text0
      if (id % 7 == 0) {
        val t = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val out = new Array[Byte](1 + math.min(t.length, 24))
        System.arraycopy(t, 0, out, 1, out.length - 1)
        out
      } else if (id % 2 == 0) {
        val bb = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put('B'.toByte).put('M'.toByte)
        bb.position(18)
        // CODE POINTS, not UTF-16 units: DuckDB's length(text) counts code
        // points, and a supplementary character (emoji) would silently
        // fork the two engines' widths under String.length
        bb.putInt((text.codePointCount(0, text.length) % 3000) + 1)
        bb.putInt(
          if (id % 3 == 0) -((id % 2000).toInt + 1) else (id % 100000).toInt + 1)
        bb.array()
      } else {
        // WAV with a REAL PCM data chunk (round 5): nFrames = (id%40)+5
        // frames of `channels` samples, each bits/8 bytes LE; the raw
        // unsigned value of frame f channel c is
        // (id·131 + f·17 + c·7) mod 2^bits — the integer spec the
        // q_wav_frames oracle recomputes, while Spark decodes the bytes
        val channels = ((id % 8) + 1).toInt
        val bits = Array(8, 16, 24, 32)((id % 4).toInt)
        val bytesPer = bits / 8
        val nFrames = ((id % 40) + 5).toInt
        val dataSize = nFrames * channels * bytesPer
        val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        bb.putInt(36 + dataSize) // RIFF chunk size = file bytes − 8
        bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val rate = (8000 + (id % 6) * 8000).toInt
        bb.putInt(16) // fmt chunk size (canonical PCM)
        bb.putShort(1.toShort) // audio format = PCM
        bb.putShort(channels.toShort)
        bb.putInt(rate)
        bb.putInt(rate * channels * bytesPer) // byte rate
        bb.putShort((channels * bytesPer).toShort) // block align
        bb.putShort(bits.toShort)
        bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        bb.putInt(dataSize)
        val m = 1L << bits
        var f = 0
        while (f < nFrames) {
          var c = 0
          while (c < channels) {
            val v = (id * 131 + f * 17 + c * 7) % m
            var b = 0
            while (b < bytesPer) { bb.put(((v >> (8 * b)) & 0xFF).toByte); b += 1 }
            c += 1
          }
          f += 1
        }
        bb.array()
      }
    }
  }

  final case class TypedMeta(
      id: Long, kind: String, format: String, width: Int, height: Int,
      channels: Int, sample_rate: Int, bits_per_sample: Int)

  /** Typed per-format metadata via the REAL header parser (batched
    * mapPartitions like [[extractFeatures]]); unparseable payloads surface
    * as format="unknown" rather than being dropped — at web scale silent
    * row loss in a metadata pass corrupts joins downstream. */
  def typedMetadata(media: Dataset[MediaRow]): Dataset[TypedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      Headers.parse(r.bytes) match {
        case Some(h) =>
          TypedMeta(r.id, r.kind, h.format, h.width, h.height,
            h.channels, h.sampleRate, h.bitsPerSample)
        case None => TypedMeta(r.id, r.kind, "unknown", 0, 0, 0, 0, 0)
      }
    })
  }

  final case class WavFrame(id: Long, frame_idx: Long, sample: Long)

  /** REAL PCM frame sampling (the brief's "frame-sample" op, round 5):
    * every `every`-th frame's CHANNEL-0 sample from canonical PCM WAVs,
    * decoded by pure byte arithmetic — 8-bit WAV stores unsigned samples
    * biased by 128; 16/24/32-bit store signed little-endian (manual
    * sign-extension, no codec). The frame stride honors the header's
    * channels × bits/8 block align, so multi-channel audio skips the other
    * channels' bytes correctly. The `fmt ` and `data` chunks are located by
    * walking the RIFF chunk list (real-world PCM WAVs carry LIST/INFO/fact
    * chunks between them — round 6; the round-5 form pinned offset 36 and
    * silently yielded zero frames on those). Rows that are not WAV, have no
    * `data` chunk, or declare a chunk size the payload cannot back
    * (truncated upload) yield NO frames — at web scale a malformed media
    * row must not crash the batch or emit garbage samples.
    * Under the bitwise gate as q_wav_frames: SyntheticMedia writes frames
    * from an integer spec via ByteBuffer, this decodes them back via
    * independent manual arithmetic, and the DuckDB oracle recomputes the
    * expected samples from the spec — an offset, stride, bias, or
    * sign-extension error on either side breaks parity. */
  def sampleWavFrames(media: Dataset[MediaRow], every: Int): Dataset[WavFrame] = {
    require(every >= 1, s"every must be >= 1, got $every")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      Headers.parse(r.bytes) match {
        case Some(h) if h.format == "wav" && h.channels > 0 &&
            h.bitsPerSample % 8 == 0 && h.bitsPerSample > 0 && h.bitsPerSample <= 32 &&
            // audioFormat code (fmt chunk offset 0) must be 1 = integer
            // PCM: an IEEE-float (3) or ADPCM/extensible WAV passes every
            // other guard and would be sign-extended as if it were int PCM
            // — garbage samples, the outcome this op's contract forbids
            // (round-6 review). Non-PCM rows emit NOTHING, like every
            // other undecodable payload.
            Headers.findRiffChunk(r.bytes, "fmt ")
              .exists { case (fo, fsz) => fsz >= 16 && Headers.le16(r.bytes, fo) == 1 } =>
          // the data chunk is LOCATED by the RIFF walk (LIST/fact chunks may
          // precede it); the walk's bounds check already rejects a declared
          // size the payload cannot back (truncated upload → no frames)
          Headers.findRiffChunk(r.bytes, "data") match {
            case Some((dataOff, size)) =>
              val bytesPer = h.bitsPerSample / 8
              val frameBytes = h.channels * bytesPer
              val nFrames = size / frameBytes
              val bias = 1L << (h.bitsPerSample - 1)
              Iterator.range(0, nFrames, every).map { f =>
                val off = dataOff + f * frameBytes
                var v = 0L
                var b = 0
                while (b < bytesPer) { v |= (r.bytes(off + b) & 0xFFL) << (8 * b); b += 1 }
                val s =
                  if (h.bitsPerSample == 8) v - 128
                  else if (v >= bias) v - (bias << 1)
                  else v
                WavFrame(r.id, f.toLong, s)
              }
            case None => Iterator.empty
          }
        case _ => Iterator.empty
      }
    }
  }

  /** Metadata extraction never touches the decoder — pure column ops, so the
    * scan prunes to exactly (id, kind, bytes-length statistics). */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("id"), col("kind"),
      octet_length(col("bytes")).cast("long").as("n_bytes"),
      // substring the BINARY first: hex over the whole payload allocates a
      // 2× payload-size string per row just to read 4 magic bytes — pure
      // GC churn on a binary-dominated corpus scan (round-6 review);
      // byte-identical output incl. payloads shorter than 4 bytes
      hex(substring(col("bytes"), 1, 4)).as("magic"))

  /** Batched feature extraction: one decoder instance per partition, rows
    * streamed through it (the Scala analogue of a pandas-UDF batch). */
  def extractFeatures(media: Dataset[MediaRow], targetSide: Int = 4): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition setup (a real codec would init native state here)
      rows.map { r =>
        val (w, h, px) = StubDecoder.decode(r.kind, r.bytes)
        val resized = StubDecoder.resize(w, h, px, targetSide, targetSide)
        MediaFeatures(r.id, r.kind, targetSide, targetSide, resized)
      }
    }
  }

  /** Deterministic fake media table built from the documents table's text
    * bytes — stands in for a WARC/media store at test scale. */
  def fakeMediaFromDocs(spark: SparkSession, docsParquet: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(docsParquet)
      .select(col("doc_id").as("id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
