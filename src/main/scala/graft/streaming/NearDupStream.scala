package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.CrossEngine

/** INCREMENTAL near-duplicate detection over a document stream — the
  * streaming counterpart of [[graft.pipeline.SimHashDedup]], built on
  * `flatMapGroupsWithState` (custom keyed state, the Structured Streaming
  * primitive for operators Spark's built-ins can't express).
  *
  * Keyed by (chunk_idx, chunk) — the same 7-byte-chunk SimHash banding as
  * the batch path — each bucket's state holds the (doc_id, fp) of members
  * seen so far: 16 bytes per member, NOT the documents, so state size is
  * bounded and independent of text length. A new arrival emits a pair for
  * every stored member within maxHamming, then joins the state. Buckets are
  * capped at maxMembers (the streaming form of the census cap: a boilerplate
  * chunk's state stops growing and the overflow is counted in `dropped`),
  * so a hot bucket costs O(cap) per arrival, never O(n).
  *
  * A pair sharing several chunks is emitted once per shared chunk
  * (OR-amplification); consumers dedupe downstream — chaining a stateful
  * dropDuplicates onto flatMapGroupsWithState is restricted by Spark, and
  * at scale the dedupe belongs in the (idempotent) sink anyway.
  */
object NearDupStream {

  final case class ChunkKey(chunk_idx: Int, chunk: Long)
  final case class DocChunk(chunk_idx: Int, chunk: Long, doc_id: Long, fp: Long)
  final case class BucketState(ids: List[Long], fps: List[Long], dropped: Long)
  final case class DupPair(doc_a: Long, doc_b: Long, hamming: Int)

  /** (doc_id, text) stream → chunk-keyed rows (same derivation as batch). */
  def chunked(docs: DataFrame): Dataset[DocChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), CrossEngine.simhash56Udf(col("text")).as("fp"))
      .select(col("doc_id"), col("fp"),
        posexplode(array((0 until CrossEngine.SimHash56.Chunks).map(i =>
          shiftrightunsigned(col("fp"), i * 8).bitwiseAND(lit(255L))): _*))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("chunk_idx").cast("int").as("chunk_idx"), col("chunk"),
        col("doc_id"), col("fp"))
      .as[DocChunk]
  }

  /** Streaming near-dup pairs at hamming ≤ maxHamming. Works on a streaming
    * OR batch `docs(doc_id, text)` DataFrame (flatMapGroupsWithState runs in
    * both; batch mode is the test oracle path).
    *
    * @param stateTtl when set (e.g. "24 hours"), bucket state expires after
    *                 that much processing-time inactivity — the retention
    *                 bound an UNBOUNDED stream needs. Docs arriving after a
    *                 bucket expired can no longer pair with its pre-expiry
    *                 members (a disclosed recall/retention tradeoff, exactly
    *                 like the batch census cap). None = keep state forever
    *                 (bounded replays, tests). */
  def pairs(
      docs: DataFrame,
      maxHamming: Int,
      maxMembers: Int,
      stateTtl: Option[String] = None): Dataset[DupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    chunked(docs)
      .groupByKey(r => ChunkKey(r.chunk_idx, r.chunk))
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf) {
        (_: ChunkKey, rows: Iterator[DocChunk], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(BucketState(Nil, Nil, 0L))
            val out = scala.collection.mutable.ArrayBuffer.empty[DupPair]
            rows.foreach { r =>
              var ids = st.ids
              var fps = st.fps
              while (ids.nonEmpty) {
                val h = java.lang.Long.bitCount(r.fp ^ fps.head)
                if (h <= maxHamming && ids.head != r.doc_id)
                  out += DupPair(math.min(ids.head, r.doc_id), math.max(ids.head, r.doc_id), h)
                ids = ids.tail; fps = fps.tail
              }
              st =
                if (st.ids.length < maxMembers)
                  BucketState(r.doc_id :: st.ids, r.fp :: st.fps, st.dropped)
                else st.copy(dropped = st.dropped + 1) // capped: disclose, don't grow
            }
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
