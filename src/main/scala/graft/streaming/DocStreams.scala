package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** A streamed document as the ingest side sees it (the fixture schema's
  * identity columns; text carries the content). */
case class Doc(doc_id: Long, text: String, lang: String)

/** One surviving document per distinct content hash, emitted by
  * `DocStreams.dedupByContent` — the streaming twin of llm_exact_dedup's
  * keeper rule. */
case class KeptDoc(doc_id: Long, h: String, lang: String)

/** Structured Streaming side of the LLM corpus-ingest pipeline — the
  * document analogue of EventStreams: a crawl/ingest feed arrives as a
  * stream, and exact dedup is the first gate a doc meets (every byte
  * that passes it costs downstream near-dup and quality work). The
  * composition with the batch pipeline is the daily-refresh story:
  * stream-dedup the day's feed into the corpus dir with monotone ids,
  * then PairTable.refreshInPlace + CorpusPrepMain --refresh judge only
  * the new batch (docs above the stamped watermark).
  */
object DocStreams {

  /** sha256 hex of the text — the SAME key llm_exact_dedup groups by
    * (Spark's sha2 emits lowercase hex; so does this). */
  private[streaming] def contentHash(text: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Online exact dedup state: one long per distinct content hash (the
    * keeper's doc_id). First arrival wins; within a microbatch the min
    * doc_id wins — so on a feed with monotone ingest ids (the same
    * contract PairTable.refreshInPlace's watermark rule relies on) the
    * survivor set EQUALS batch llm_exact_dedup's min-doc_id keepers.
    * State is keyed by the 64-hex hash — uniform by construction, no
    * hot partitions; TTL in a real deployment bounds the store to the
    * dedup horizon (unbounded here: the fixture-sized test contract). */
  class ContentDedupProcessor extends StatefulProcessor[String, Doc, KeptDoc] {
    @transient private var keeper: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Long](
        "keeper", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Doc],
                                 timerValues: TimerValues): Iterator[KeptDoc] = {
      if (keeper.exists()) Iterator.empty
      else {
        val first = rows.minBy(_.doc_id)
        keeper.update(first.doc_id)
        Iterator.single(KeptDoc(first.doc_id, key, first.lang))
      }
    }
  }

  /** llm_exact_dedup online twin (see ContentDedupProcessor). */
  def dedupByContent(docs: Dataset[Doc]): Dataset[KeptDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(d => contentHash(d.text))
      .transformWithState(new ContentDedupProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Stateless Gopher quality gate on the document stream — the
    * streaming form of llm_gopher_rules' pass verdict (the SAME column
    * expression, Textops.gopherPass, so batch and stream gate
    * identically). Stateless = a pure filter on each microbatch: no
    * store, no watermark, safe at any rate. */
  def gopherGate(docs: Dataset[Doc]): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF().where(graft.queries.Textops.gopherPass(
      org.apache.spark.sql.functions.col("text"))).as[Doc]
  }

  /** The composed online ingest: quality-gate THEN dedup — gating first
    * means garbage never occupies dedup state (the same
    * shrink-before-the-expensive-stage ordering CorpusPrep uses for its
    * stage-0 gates). */
  def ingest(docs: Dataset[Doc]): Dataset[KeptDoc] =
    dedupByContent(gopherGate(docs))

  /** Online token-length census — the streaming twin of
    * llm_token_histogram's stateful core: running doc counts per
    * 16-token bin (top-clamped at 19), Complete output mode. The
    * report head (share / cumulative share) is a stateless rollup of
    * this ≤20-row frame and stays batch-side; what needs streaming
    * state is exactly the per-bin counters. The ingest-health use:
    * watch the length distribution of the day's feed move against
    * yesterday's corpus curve without re-scanning anything. */
  def tokenLengthBins(docs: Dataset[Doc]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs.toDF()
      .select(graft.queries.Textops.lengthBin(col("text")).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_docs"))
  }
}
