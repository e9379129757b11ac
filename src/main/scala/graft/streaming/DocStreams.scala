package graft.streaming

import org.apache.spark.sql.DataFrame
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
    * with the same 32-bit majority-vote fingerprint as batch D4
    * (stateless per-row expressions — no stream-side shuffle) and probed
    * against a broadcast byte-band index of the static corpus
    * fingerprints: a match is any indexed fingerprint within hamming ≤
    * `hammingMax` (pigeonhole: such a pair agrees on ≥1 of the 4 bytes,
    * so the probe is a band join, never all-pairs).
    *
    * `docs` is unbounded with (doc_id, text, ...); `index` is a static
    * (doc_id, simhash) DataFrame (e.g. from `Dedup.simhash`). Returns an
    * append-mode stream of (doc_id, matched_id, hamming) — one row per
    * (incoming doc, matched corpus doc), emitted by the first agreeing
    * band only, so no dedup state is needed.
    *
    * At 100 TB-corpus scale the broadcast index is replaced by a
    * pre-bucketed fingerprint table on the same band key — the plan shape
    * (band join, stateless stream side) is unchanged. */
  def nearDupFlag(docs: DataFrame, index: DataFrame,
                  hammingMax: Int = Dedup.HammingMax): DataFrame = {
    // banding constants and predicates shared with batch D4b
    // (Dedup.SimhashBands / bandByteExpr / firstAgreeingBandSql): one
    // definition, one pigeonhole guarantee
    val idxBanded = index
      .selectExpr("doc_id AS matched_id", "simhash AS isim",
        s"explode(sequence(0, ${Dedup.SimhashBands - 1})) AS band")
      .selectExpr("matched_id", "isim", "band",
        s"${Dedup.bandByteExpr("isim", "band")} AS byte")
    val hashed = Dedup.withSimhash(docs)
      .selectExpr("doc_id", "simhash",
        s"explode(sequence(0, ${Dedup.SimhashBands - 1})) AS band")
      .selectExpr("doc_id", "simhash", "band",
        s"${Dedup.bandByteExpr("simhash", "band")} AS byte")
    hashed.join(broadcast(idxBanded), Seq("band", "byte"))
      // first-agreeing-band: each (doc, match) pair emitted exactly once
      .filter(expr(Dedup.firstAgreeingBandSql("simhash", "isim", "band")))
      .selectExpr("doc_id", "matched_id", "bit_count(simhash ^ isim) AS hamming")
      .filter(col("hamming") <= hammingMax)
  }

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
}
