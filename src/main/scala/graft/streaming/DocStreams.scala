package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Streaming document operators (SURVEY §2 S5-S6) — the online half of
  * the curation stack: documents arriving on a stream are near-dup-checked
  * against the accepted corpus (S5) and pushed through the same
  * quality/split/sample gate the batch pipeline applies (S6).
  */
object DocStreams {

  /** S5: streaming near-duplicate detection. Incoming docs are SimHashed
    * with the same 60-bit majority-vote fingerprint as batch D4
    * (stateless per-row expressions — no stream-side shuffle) and probed
    * against a broadcast band index of the static corpus fingerprints: a
    * match is any indexed fingerprint within hamming ≤ `hammingMax`
    * (pigeonhole: such a pair agrees on ≥1 of the 4 15-bit bands, so the
    * probe is a band join, never all-pairs).
    *
    * `docs` is unbounded with (doc_id, text, ...); `index` is a static
    * (doc_id, simhash) DataFrame (e.g. from `Dedup.simhash`). Returns an
    * append-mode stream of (doc_id, matched_id, hamming) — one row per
    * (incoming doc, matched corpus doc), emitted by the first agreeing
    * band only, so no dedup state is needed.
    *
    * At 100 TB-corpus scale the broadcast index is replaced by a
    * pre-bucketed fingerprint table on the same band key
    * ([[writeBandIndex]] / [[nearDupFlagBucketed]]) — the plan shape
    * (band join, stateless stream side) is unchanged. */
  def nearDupFlag(docs: DataFrame, index: DataFrame,
                  hammingMax: Int = Dedup.HammingMax): DataFrame =
    probe(bandedDocs(docs), broadcast(bandedIndex(index)), hammingMax)

  /** Banded projection of a (doc_id, simhash) corpus index: one row per
    * band, keyed (band, byte). Banding constants and predicates shared
    * with batch D4b (Dedup.SimhashBands / bandByteExpr /
    * firstAgreeingBandSql): one definition, one pigeonhole guarantee. */
  def bandedIndex(index: DataFrame): DataFrame =
    index
      .selectExpr("doc_id AS matched_id", "simhash AS isim",
        s"explode(sequence(0, ${Dedup.SimhashBands - 1})) AS band")
      .selectExpr("matched_id", "isim", "band",
        s"${Dedup.bandByteExpr("isim", "band")} AS byte")

  private def bandedDocs(docs: DataFrame): DataFrame =
    Dedup.withSimhash(docs)
      .selectExpr("doc_id", "simhash",
        s"explode(sequence(0, ${Dedup.SimhashBands - 1})) AS band")
      .selectExpr("doc_id", "simhash", "band",
        s"${Dedup.bandByteExpr("simhash", "band")} AS byte")

  private def probe(hashed: DataFrame, idxBanded: DataFrame,
                    hammingMax: Int): DataFrame =
    hashed.join(idxBanded, Seq("band", "byte"))
      // first-agreeing-band: each (doc, match) pair emitted exactly once
      .filter(expr(Dedup.firstAgreeingBandSql("simhash", "isim", "band")))
      .selectExpr("doc_id", "matched_id", "bit_count(simhash ^ isim) AS hamming")
      .filter(col("hamming") <= hammingMax)

  /** One-time layout step for S5b: persist the banded index as a table
    * bucketed (and per-bucket sorted) on the (band, byte) probe key —
    * the pay-at-ingest trade that lets every micro-batch probe read the
    * index co-partitioned, with no broadcast and no per-batch index
    * shuffle. */
  def writeBandIndex(index: DataFrame, table: String, buckets: Int = 16,
                     path: Option[String] = None): Unit = {
    val w = bandedIndex(index).write
      .bucketBy(buckets, "band", "byte").sortBy("band", "byte")
      .mode(SaveMode.Overwrite).format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** S5b: the 100 TB-corpus form of [[nearDupFlag]] — probes a
    * pre-bucketed banded fingerprint table instead of a broadcast index.
    * Identical match semantics (StreamingSpec proves parity); the plan
    * trades the broadcast for a co-partitioned join: the bucketed index
    * side is read in place (zero Exchange — pinned in StreamingSpec),
    * only the micro-batch's banded rows shuffle to the index's bucketing,
    * and the SHUFFLE_HASH hint on the stream side builds the (tiny)
    * batch, streaming the corpus-sized index partition past it. */
  def nearDupFlagBucketed(docs: DataFrame, spark: SparkSession,
                          indexTable: String,
                          hammingMax: Int = Dedup.HammingMax): DataFrame =
    probe(bandedDocs(docs).hint("shuffle_hash"), spark.table(indexTable),
      hammingMax)

  /** S6: streaming ingest gate — the live-arrival form of the batch
    * curation path: T2 quality scoring → T6 thresholds → T7 split
    * assignment → T10 per-language stratified sampling, on unbounded
    * (doc_id, text, lang) input.
    *
    * Every step is stateless per-row expression work (the exact same
    * expressions as the batch operators, via TextAnalysis helpers), so
    * the operator needs no watermark, no state store, and no stream-side
    * shuffle — and a doc admitted by the stream is bit-identically the
    * doc the batch pipeline would admit, which is what makes a
    * lambda-architecture corpus (bulk history + live tail) consistent. */
  def ingestGate(docs: DataFrame): DataFrame =
    TextAnalysis.withQuality(docs)
      .filter(TextAnalysis.qualityGateCond)
      .selectExpr("doc_id", "lang", "score",
        s"${TextAnalysis.splitCaseExpr} AS split",
        s"${TextAnalysis.sampleUExpr} AS u")
      .filter(expr(s"u < ${TextAnalysis.sampleRateCaseExpr}"))
      .drop("u")

  /** Streaming Misra-Gries state: the per-key counter map. */
  case class MgState(counts: Map[String, Long])

  /** S8: streaming heavy hitters — the online form of T22: a per-language
    * Misra-Gries token summary maintained in stream state via
    * `mapGroupsWithState`. Each micro-batch's tokens for a language are
    * exact-counted batch-locally, then MERGED into the state with the
    * same Mergeable-Summaries rule as the batch aggregate
    * ([[graft.functions.MisraGries.trimToCapacity]]): pointwise sum,
    * subtract the (m+1)-th largest, evict non-positives — so the state
    * holds AT MOST m counters per language FOREVER, with the cumulative
    * N/(m+1) retention guarantee over everything the stream has seen,
    * where a naive streaming `GROUP BY token` grows state with the
    * vocabulary. Output (Update mode): one row per language per batch
    * with the current sorted candidate set — the online
    * over-representation monitor a live ingest pipeline runs. */
  def streamingHeavyHitters(docs: DataFrame, m: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState}
    docs.select(col("lang"), explode(TextAnalysis.words).as("w"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[MgState, (String, Seq[String])](GroupStateTimeout.NoTimeout) {
        (lang: String, it: Iterator[(String, String)], state: GroupState[MgState]) =>
          val buf = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(_.counts.foreach { case (k, c) => buf(k) = c })
          // batch-local exact pre-count, one merge per batch: identical
          // guarantee to per-item MG updates (the merge rule's bound
          // covers any split of the stream), far fewer trim passes
          val batch = scala.collection.mutable.HashMap.empty[String, Long]
          it.foreach { case (_, w) => batch(w) = batch.getOrElse(w, 0L) + 1L }
          batch.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
          graft.functions.MisraGries.trimToCapacity(buf, m)
          state.update(MgState(buf.toMap))
          (lang, buf.keys.toSeq.sorted)
      }.toDF("lang", "candidates")
  }
}
