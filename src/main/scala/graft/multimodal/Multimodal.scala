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
      val side = math.max(2, math.min(8, bytes.length / 16))
      val px = new Array[Double](side * side)
      var i = 0
      while (i < px.length) {
        val b = if (bytes.isEmpty) 0L else bytes(i % bytes.length).toLong
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

  /** Metadata extraction never touches the decoder — pure column ops, so the
    * scan prunes to exactly (id, kind, bytes-length statistics). */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("id"), col("kind"),
      octet_length(col("bytes")).cast("long").as("n_bytes"),
      substring(hex(col("bytes")), 1, 8).as("magic"))

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
