package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val docsPath = "/root/testdata/sf0.001/documents.parquet"

  test("metadata extraction: schema and values") {
    val media = Multimodal.fakeMediaFromDocs(spark, docsPath)
    val meta = Multimodal.metadata(media.toDF())
    assert(meta.schema.fieldNames.toSeq == Seq("id", "kind", "n_bytes", "magic"))
    val row = meta.orderBy("id").first()
    assert(row.getLong(2) > 0)
    assert(row.getString(3).length == 8)
  }

  test("feature extraction preserves rows, is deterministic, has fixed batch shape") {
    val media = Multimodal.fakeMediaFromDocs(spark, docsPath)
    val f1 = Multimodal.extractFeatures(media, targetSide = 4).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(media.repartition(7), targetSide = 4).collect().sortBy(_.id)
    assert(f1.length == media.count())
    assert(f1.forall(f => f.features.length == 16 && f.width == 4 && f.height == 4))
    assert(f1.zip(f2).forall { case (a, b) =>
      a.id == b.id && a.features.sameElements(b.features)
    }) // partitioning-independent
    assert(f1.forall(_.features.forall(v => v >= 0.0 && v <= 1.0)))
  }

  test("metadata-only plans don't depend on decode (no UDF in plan)") {
    val media = Multimodal.fakeMediaFromDocs(spark, docsPath)
    val plan = Multimodal.metadata(media.toDF()).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("mappartitions"))
  }

  test("parquet scan prunes the binary column for queries that don't need it") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    try {
      Multimodal.fakeMediaFromDocs(spark, docsPath).write.mode("overwrite").parquet(dir)
      val media = spark.read.parquet(dir)
      def readSchema(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString
          .linesIterator.filter(_.contains("ReadSchema")).mkString
      // (id, kind) projection: the 100-TB payload column must not be scanned
      val pruned = readSchema(media.select(col("id"), col("kind")))
      assert(pruned.nonEmpty && !pruned.contains("bytes"), s"bytes not pruned: $pruned")
      // metadata() derives n_bytes/magic from the payload, so it reads bytes
      // — through column ops only (no decoder), per the scaladoc claim
      val full = readSchema(Multimodal.metadata(media))
      assert(full.contains("bytes"))
    } finally {
      val p = java.nio.file.Path.of(dir)
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
    }
  }

  test("real header decode: BMP and WAV typed metadata from raw bytes") {
    import spark.implicits._
    import Multimodal.{Headers, MediaRow}
    // hand-assemble a minimal BITMAPINFOHEADER bitmap: 'BM', width 640,
    // height 480 as int32-LE at offsets 18/22
    val bmp = new Array[Byte](64)
    bmp(0) = 'B'; bmp(1) = 'M'
    def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    putLe32(bmp, 18, 640); putLe32(bmp, 22, 480)
    // canonical 44-byte WAV header: stereo, 44100 Hz, 16-bit
    val wav = new Array[Byte](64)
    "RIFF".zipWithIndex.foreach { case (c, i) => wav(i) = c.toByte }
    "WAVE".zipWithIndex.foreach { case (c, i) => wav(8 + i) = c.toByte }
    "fmt ".zipWithIndex.foreach { case (c, i) => wav(12 + i) = c.toByte }
    // fmt chunk SIZE (16) at offset 16 — the round-6 chunk walker validates
    // it (the round-5 parser read pinned offsets and accepted a zero size)
    putLe32(wav, 16, 16)
    putLe16(wav, 22, 2); putLe32(wav, 24, 44100); putLe16(wav, 34, 16)
    // pure-Scala parser contract
    val hb = Headers.parse(bmp).get
    assert(hb.format == "bmp" && hb.width == 640 && hb.height == 480)
    val hw = Headers.parse(wav).get
    assert(hw.format == "wav" && hw.channels == 2 && hw.sampleRate == 44100 && hw.bitsPerSample == 16)
    assert(Headers.parse("plain text".getBytes).isEmpty)
    // distributed path: typedMetadata over a mixed Dataset, unknowns kept
    val media = Seq(
      MediaRow(1L, "image", bmp), MediaRow(2L, "audio", wav),
      MediaRow(3L, "image", "not media".getBytes)).toDS()
    val rows = Multimodal.typedMetadata(media).collect().sortBy(_.id)
    assert(rows.map(_.format).toSeq == Seq("bmp", "wav", "unknown"))
    assert(rows(0).width == 640 && rows(0).height == 480)
    assert(rows(1).sample_rate == 44100 && rows(1).channels == 2)
    assert(rows.length == 3) // unparseable rows surfaced, not dropped
  }

  test("SyntheticMedia round-trips through Headers.parse per its field spec") {
    // encode (ByteBuffer LE) and decode (manual byte arithmetic) are
    // independent code paths; this pins the round-trip on adversarial ids
    // locally, complementing the corpus-wide q_media_headers oracle gate
    def expect(id: Long, text: String): Unit = {
      val parsed = Multimodal.Headers.parse(Multimodal.SyntheticMedia.bytes(id, text))
      if (id % 7 == 0) assert(parsed.isEmpty, s"id=$id should be unparseable")
      else if (id % 2 == 0) {
        val h = parsed.get
        assert(h.format == "bmp" &&
          h.width == (text.codePointCount(0, text.length) % 3000) + 1)
        val wantH =
          if (id % 3 == 0) -((id % 2000).toInt + 1) else (id % 100000).toInt + 1
        assert(h.height == wantH, s"id=$id height")
      } else {
        val h = parsed.get
        assert(h.format == "wav" && h.channels == (id % 8).toInt + 1)
        assert(h.sampleRate == 8000 + (id % 6).toInt * 8000)
        assert(h.bitsPerSample == Array(8, 16, 24, 32)((id % 4).toInt))
      }
    }
    val longText = "x" * 5000
    // 6/98304 = even & id%3==0 → NEGATIVE height (top-down BMP, signed
    // le32; 98304 exercises multi-byte magnitudes); 99998 = even positive
    // height 99999 (> 2^16 — high bytes); 35 = odd (wav); 0/49 = %7
    Seq(6L, 98304L, 99998L, 2L, 35L, 1L, 0L, 49L).foreach { id =>
      expect(id, "short")
      expect(id, longText)
      expect(id, "")
    }
    // width counts CODE POINTS like DuckDB's length(): a supplementary
    // char (2 UTF-16 units, 1 code point) must count once
    val emoji = "a😀b" // 4 UTF-16 units, 3 code points
    val h = Multimodal.Headers.parse(Multimodal.SyntheticMedia.bytes(2L, emoji)).get
    assert(h.width == 4, s"expected codePointCount(3)+1, got ${h.width}")
  }

  test("sampleWavFrames matches the integer spec incl. sign-extended negatives") {
    import spark.implicits._
    // odd non-%7 ids: id%4 ∈ {1,3} → synthetic WAVs are 16- or 32-bit only
    // (8/24-bit decode is covered by the hand-built-WAV test below).
    // 253·131 = 33143 ≥ 2^15 → 16-bit negative at frame 0;
    // 16400003·131 ≥ 2^31 → 32-bit negative (full sign-extension range).
    val ids = Seq(1L, 5L, 11L, 15L, 27L, 33L, 101L, 103L, 253L, 16400003L)
    val media = ids.toDS().map(id =>
      Multimodal.MediaRow(id, "audio", Multimodal.SyntheticMedia.bytes(id, "t")))
    val got = Multimodal.sampleWavFrames(media, every = 4)
      .collect().map(f => (f.id, f.frame_idx) -> f.sample).toMap
    val want = ids.flatMap { id =>
      val bits = Array(8, 16, 24, 32)((id % 4).toInt)
      val m = 1L << bits
      val nf = ((id % 40) + 5).toInt
      (0 until nf by 4).map { f =>
        val v = (id * 131 + f * 17) % m
        val s = if (bits == 8) v - 128 else if (v >= m / 2) v - m else v
        (id, f.toLong) -> s
      }
    }.toMap
    assert(got == want)
    // sanity: the fixture really exercises negative (sign-extended) samples
    assert(want.values.exists(_ < 0), "fixture produced no negative samples")
  }

  test("sampleWavFrames decodes 8-bit biased and 24-bit sign-extended samples") {
    import spark.implicits._
    // hand-built canonical WAVs (an encoder INDEPENDENT of SyntheticMedia,
    // which never emits 8/24-bit): channel-0 raws chosen to pin the bias
    // and sign-extension rules; channel-1 raws are decoys the stride must
    // skip
    def wav(channels: Int, bits: Int, frames: Seq[Seq[Long]]): Array[Byte] = {
      val bytesPer = bits / 8
      val dataSize = frames.length * channels * bytesPer
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      bb.put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      bb.putInt(16).putShort(1).putShort(channels.toShort).putInt(8000)
      bb.putInt(8000 * channels * bytesPer).putShort((channels * bytesPer).toShort)
      bb.putShort(bits.toShort)
      bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
      frames.foreach(_.foreach { v =>
        (0 until bytesPer).foreach(b => bb.put(((v >> (8 * b)) & 0xFF).toByte))
      })
      bb.array()
    }
    val media = Seq(
      // 8-bit stereo: unsigned raws 0, 128, 255 → −128, 0, 127
      Multimodal.MediaRow(1L, "audio",
        wav(2, 8, Seq(Seq(0L, 99L), Seq(128L, 99L), Seq(255L, 99L)))),
      // 24-bit mono: 0x800000 (sign bit) → −2^23; 0x7FFFFF → 2^23−1
      Multimodal.MediaRow(2L, "audio",
        wav(1, 24, Seq(Seq(0x800000L), Seq(0x7FFFFFL), Seq(0L))))).toDS()
    val got = Multimodal.sampleWavFrames(media, every = 1)
      .collect().map(f => (f.id, f.frame_idx) -> f.sample).toMap
    assert(got == Map(
      (1L, 0L) -> -128L, (1L, 1L) -> 0L, (1L, 2L) -> 127L,
      (2L, 0L) -> -8388608L, (2L, 1L) -> 8388607L, (2L, 2L) -> 0L))
  }

  test("non-canonical RIFF layouts: LIST/fact chunks are walked, not fatal") {
    import spark.implicits._
    // real-world PCM WAVs interleave LIST/INFO/fact chunks between `fmt `
    // and `data` (ADVICE r5: the offset-36 parser silently yielded zero
    // frames on them). Build 16-bit mono with (a) a LIST chunk between fmt
    // and data, (b) a fact chunk BEFORE fmt, (c) an ODD-sized chunk whose
    // pad byte the walker must skip.
    def chunk(id: String, content: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + content.length + (content.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(content.length).put(content)
      bb.array() // trailing pad byte (if odd) stays zero
    }
    def fmtChunk(channels: Int, bits: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val bytesPer = bits / 8
      bb.putShort(1).putShort(channels.toShort).putInt(8000)
        .putInt(8000 * channels * bytesPer).putShort((channels * bytesPer).toShort)
        .putShort(bits.toShort)
      bb.array()
    }
    def dataChunk(samples: Seq[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => bb.putShort(s.toShort))
      chunk("data", bb.array())
    }
    def riff(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("WAVE".getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val samples = Seq(100L, -200L, 300L)
    val listBetween = riff(chunk("fmt ", fmtChunk(1, 16)),
      chunk("LIST", "INFOsoft".getBytes("US-ASCII")), dataChunk(samples))
    val factBefore = riff(chunk("fact", Array[Byte](4, 0, 0, 0)),
      chunk("fmt ", fmtChunk(1, 16)), dataChunk(samples))
    val oddChunk = riff(chunk("junk", Array[Byte](1, 2, 3)), // size 3 → pad byte
      chunk("fmt ", fmtChunk(1, 16)), dataChunk(samples))
    // header metadata resolves through the walk on all three layouts
    Seq(listBetween, factBefore, oddChunk).foreach { b =>
      val h = Multimodal.Headers.parse(b).get
      assert(h.format == "wav" && h.channels == 1 &&
        h.sampleRate == 8000 && h.bitsPerSample == 16, "walked header")
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", listBetween),
      Multimodal.MediaRow(2L, "audio", factBefore),
      Multimodal.MediaRow(3L, "audio", oddChunk)).toDS()
    val got = Multimodal.sampleWavFrames(media, every = 1)
      .collect().map(f => (f.id, f.frame_idx) -> f.sample).toMap
    val want = Seq(1L, 2L, 3L).flatMap(id =>
      samples.zipWithIndex.map { case (s, f) => (id, f.toLong) -> s }).toMap
    assert(got == want)
  }

  test("null payloads surface as unknown/empty, never an executor NPE") {
    import spark.implicits._
    // fakeMediaFromDocs emits bytes = NULL for null-text docs (encode(NULL)
    // is NULL) — the whole decode surface must survive it (round-6 review)
    assert(Multimodal.Headers.parse(null).isEmpty)
    val media = Seq(Multimodal.MediaRow(1L, "image", null),
      Multimodal.MediaRow(2L, "audio", "RIFFxxxx".getBytes)).toDS()
    val meta = Multimodal.typedMetadata(media).collect().sortBy(_.id)
    assert(meta.map(_.format).toSeq == Seq("unknown", "unknown"))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 2)
    assert(Multimodal.sampleWavFrames(media, every = 1).collect().isEmpty)
  }

  test("a non-PCM WAV (IEEE-float format code) yields no frames, not garbage samples") {
    import spark.implicits._
    // audioFormat 3 (IEEE float) passes every other guard; decoding its
    // float bit patterns as int PCM would emit garbage (round-6 review)
    def wav(audioFormat: Short): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8)
      bb.put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      bb.putInt(16).putShort(audioFormat).putShort(1).putInt(8000)
      bb.putInt(8000 * 4).putShort(4).putShort(32)
      bb.put("data".getBytes("US-ASCII")).putInt(8)
      bb.putFloat(0.5f).putFloat(-0.25f)
      bb.array()
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav(3)), // IEEE float → nothing
      Multimodal.MediaRow(2L, "audio", wav(1))  // int PCM → frames
    ).toDS()
    val got = Multimodal.sampleWavFrames(media, every = 1).collect()
    assert(got.forall(_.id == 2L), s"float WAV must emit no frames: ${got.toSeq}")
    assert(got.nonEmpty, "the PCM control row must still decode")
    // header METADATA still parses for non-PCM (typed metadata ≠ decode)
    assert(Multimodal.Headers.parse(wav(3)).exists(_.format == "wav"))
  }

  test("a declared chunk size near Int.MaxValue is rejected, not a wild read") {
    import spark.implicits._
    // size 0x7FFFFFF0: `size < 0` is false and an Int-space bounds check
    // (off + 8 + size) wraps NEGATIVE, slipping past the guard into an
    // ArrayIndexOutOfBounds crash of the whole batch (round-6 review) —
    // the bounds math must run in Long
    val evil = new Array[Byte](64)
    "RIFF".zipWithIndex.foreach { case (c, i) => evil(i) = c.toByte }
    "WAVE".zipWithIndex.foreach { case (c, i) => evil(8 + i) = c.toByte }
    "data".zipWithIndex.foreach { case (c, i) => evil(12 + i) = c.toByte }
    evil(16) = 0xF0.toByte; evil(17) = 0xFF.toByte
    evil(18) = 0xFF.toByte; evil(19) = 0x7F.toByte // le32 = 0x7FFFFFF0
    assert(Multimodal.Headers.parse(evil).isEmpty)
    val got = Multimodal.sampleWavFrames(
      Seq(Multimodal.MediaRow(1L, "audio", evil)).toDS(), every = 1).collect()
    assert(got.isEmpty, "malformed row must yield no frames, not crash")
  }

  test("sampleWavFrames skips non-wav, truncated, and malformed rows silently") {
    import spark.implicits._
    val wav = Multimodal.SyntheticMedia.bytes(5L, "t")
    val truncated = wav.take(50) // data size field promises more than present
    val bmp = Multimodal.SyntheticMedia.bytes(2L, "t")
    val garbage = Multimodal.SyntheticMedia.bytes(7L, "t")
    val headerOnly = wav.take(44) // data chunk declared but zero backing
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", truncated),
      Multimodal.MediaRow(2L, "image", bmp),
      Multimodal.MediaRow(3L, "audio", garbage),
      Multimodal.MediaRow(4L, "audio", headerOnly),
      Multimodal.MediaRow(5L, "audio", wav)).toDS()
    val got = Multimodal.sampleWavFrames(media, every = 4).collect()
    assert(got.nonEmpty)
    assert(got.map(_.id).toSet == Set(5L),
      "only the intact WAV row may emit frames")
  }
}
