package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, collision-FREE 64-bit doc ids from urls.
  *
  * A bare 64-bit hash of the url is not collision-free at the design scale:
  * at 10^12 docs the birthday bound expects ≈ n²/2⁶⁵ ≈ 3×10⁴ colliding
  * pairs, each of which would silently merge two unrelated documents before
  * dedup even runs. Instead of widening every downstream key to 128 bits
  * (doubling the shuffle width of the whole pipeline for a 10⁻⁸ event), we
  * DETECT collisions with one groupBy census at ingest and REHASH only the
  * colliding rows with a second independent url lane, repeating until no
  * collisions remain (expected rounds: 1; the census after the first rehash
  * is over ~10⁴ keys). The result is a function of the input url SET only —
  * independent of partitioning and cluster size — so ids remain stable
  * across runs, resumes, and parallelism levels.
  */
object DocIds {

  /** Default primary lane: seeded 64-bit hash of the url, as the codegen
    * graft_url_id expression (identical values to the round-1..4 ScalaUDF
    * form — ids and docs checkpoints stay valid; this was the last per-row
    * UDF on the corpus-wide ingest path). Null url → null id (expression
    * contract); [[assign]]/[[assignDisjoint]] reject null urls LOUDLY before
    * it matters — see [[guardedId]]. Callers must have registered
    * GraftExpressions — [[assign]]/[[assignDisjoint]] and GraftSession.get
    * do. */
  def primaryHash(url: Column): Column =
    call_function("graft_url_id", url, lit(0x55524C49L))

  private def rehash(id: Column, url: Column): Column =
    call_function("graft_rehash_id", id, url)

  /** Null urls fail the run loudly. The ScalaUDF this lane replaced NPE'd on
    * a null url; the codegen expression null-propagates, and a NULL id is a
    * silent contract breach — equi-joins never match NULL, so a null-url doc
    * would bypass pair generation, verification, AND decontamination's
    * anti-join scrub (the empty-shingle leak class, via ids instead of
    * signatures). assignDisjoint's freshness/collision joins also treat NULL
    * as no-match, so every increment would add ANOTHER id=NULL row the
    * collision census can't see. A raise_error branch keeps the rejection
    * per-row inside codegen (no extra validation job). */
  private def guardedId(primary: Column): Column =
    when(col("url").isNull, raise_error(lit(
      "DocIds: null url in input pages — url is the document identity key " +
        "and must be non-null"))).otherwise(primary)

  /** Assign a unique `id` to every distinct url.
    *
    * @param pages input with a `url` column (exact repeat crawls — duplicate
    *              urls — are collapsed to one row first; the input contract
    *              is byte-identical text per url)
    * @param primary the initial id column (injectable so tests can force
    *                collisions; production uses [[primaryHash]])
    * @throws IllegalStateException if collisions persist after maxRounds
    *                               (cannot happen with 64-bit rehashing
    *                               unless two rows share a url post-dedup)
    */
  def assign(
      pages: DataFrame,
      primary: Column,
      maxRounds: Int = 5): DataFrame = {
    graft.functions.GraftExpressions.register(pages.sparkSession)
    val sc = pages.sparkSession.sparkContext
    var df = pages.dropDuplicates("url").withColumn("id", guardedId(primary))
    // each round's localCheckpoint pins blocks that supersede the previous
    // round's; release the stale ones once the new checkpoint materializes
    // (same discipline as ConnectedComponents.checkpointTracked — pinned-
    // but-dead blocks are an OOM contributor under this runtime's broadcast
    // accounting pathology)
    var prevIds: Seq[Int] = Nil
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val colliding = df.groupBy("id").count().where(col("count") > 1).select("id")
      if (colliding.isEmpty) done = true
      else {
        val before = sc.getPersistentRDDs.keySet
        df = df
          .join(broadcast(colliding.withColumn("collides", lit(true))), Seq("id"), "left")
          .withColumn("id",
            when(col("collides"), rehash(col("id"), col("url"))).otherwise(col("id")))
          .drop("collides")
          .localCheckpoint(true) // ids are final data, not a recomputable plan
        val added = sc.getPersistentRDDs.keysIterator.filterNot(before).toSeq
        val reg = sc.getPersistentRDDs
        prevIds.foreach(id => reg.get(id).foreach(_.unpersist(blocking = false)))
        prevIds = added
        round += 1
      }
    }
    if (!done)
      throw new IllegalStateException(
        s"doc-id collisions persist after $maxRounds rehash rounds — duplicate urls?")
    df
  }

  def assign(pages: DataFrame): DataFrame = assign(pages, primaryHash(col("url")))

  /** Incremental-ingest form: assign ids to NEW pages so they are unique AND
    * disjoint from a FROZEN existing id set (existing ids are immutable —
    * downstream state references them, so only the new side ever rehashes).
    * Each round detects both intra-new collisions and collisions against
    * `existingIds` (a rehash can create either), rehashes exactly the
    * colliding rows, and repeats — expected rounds ≈ 1, as in [[assign]].
    * The existing-id side is corpus-sized: joins carry shuffle hints, never
    * broadcast. */
  def assignDisjoint(
      pages: DataFrame,
      existingIds: DataFrame,
      maxRounds: Int = 5): DataFrame = {
    graft.functions.GraftExpressions.register(pages.sparkSession)
    val sc = pages.sparkSession.sparkContext
    val ex = existingIds.select(col("id"))
    var df = pages.dropDuplicates("url").withColumn("id", guardedId(primaryHash(col("url"))))
    // release superseded localCheckpoint blocks per round — same discipline
    // as assign(); pinned-but-dead blocks are an OOM contributor here
    var prevIds: Seq[Int] = Nil
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val intra = df.groupBy("id").count().where(col("count") > 1).select("id")
      val cross = df.select("id").join(ex.hint("shuffle_hash"), Seq("id"), "left_semi")
      val colliding = intra.union(cross).distinct()
      if (colliding.isEmpty) done = true
      else {
        val before = sc.getPersistentRDDs.keySet
        df = df
          .join(colliding.withColumn("collides", lit(true)).hint("shuffle_hash"),
            Seq("id"), "left")
          .withColumn("id",
            when(col("collides"), rehash(col("id"), col("url"))).otherwise(col("id")))
          .drop("collides")
          .localCheckpoint(true)
        val added = sc.getPersistentRDDs.keysIterator.filterNot(before).toSeq
        val reg = sc.getPersistentRDDs
        prevIds.foreach(id => reg.get(id).foreach(_.unpersist(blocking = false)))
        prevIds = added
        round += 1
      }
    }
    if (!done)
      throw new IllegalStateException(
        s"doc-id collisions persist after $maxRounds disjoint-rehash rounds")
    df
  }
}
