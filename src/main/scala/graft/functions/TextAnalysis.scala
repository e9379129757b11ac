package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators (SURVEY §2 T1-T6) — pure `functions._` /
  * higher-order-function compositions, fully codegen'd (no UDFs): at 100 TB
  * each of these is a single scan with per-row expression work.
  *
  * Cross-engine determinism: tokenization is `[a-z]+` over lowercased text
  * (identical regex semantics in Java and RE2 for this class), hashes are
  * md5 (identical hex in Spark and DuckDB), ratios divide in the same
  * order on both sides.
  */
object TextAnalysis {

  /** Per-language stopword lexicons for the heuristic language IDer. */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "for", "on"),
    "es" -> Seq("el", "los", "y", "es", "una", "en", "que", "por", "con", "para"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "sur"))

  val words: Column = regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))

  /** T1: language ID — count stopword hits per lexicon, pick the max
    * (deterministic tie-break: lexicographically last language wins, via
    * struct ordering on (hits, lang)). One codegen'd [[GraftLangId]]
    * node: all four lexicons counted in a single byte scan, replacing
    * four interpreted `filter(words, ...)` lambda walks over a per-row
    * materialized word array (the column formulation stays below as
    * [[langIdExprs]]; TextAnalysisSpec pins row-for-row equality). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val q = call_function("graft_langid", col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      q.getField("lang_pred").as("lang_pred"),
      q.getField("n_hits").as("n_hits"))
  }

  /** The column-expression formulation [[langId]] replaced — the
    * reference semantics the native expression must match exactly (also
    * the shape the DuckDB oracle mirrors). Test-only. */
  private[graft] def langIdExprs(df: DataFrame): DataFrame = {
    val cands = lexicons.map { case (lang, stops) =>
      val hits = size(filter(words, w => array_contains(typedLit(stops), w)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    df.select(
      col("doc_id"),
      greatest(cands: _*).getField("lang").as("lang_pred"),
      greatest(cands: _*).getField("hits").as("n_hits"))
  }

  /** DuckDB's greatest() rejects structs, so the (hits, lang) max with
    * tie→last-lang is unrolled into a CASE chain checking languages in
    * reverse alphabetical order. */
  def langIdOracle: String = {
    val hitCols = lexicons.map { case (lang, stops) =>
      val arr = stops.map(s => s"'$s'").mkString("[", ", ", "]")
      s"len(list_filter(w, x -> list_contains($arr, x))) AS h_$lang"
    }
    val langs = lexicons.map(_._1)
    val cases = langs.reverse.init.map { lang =>
      val geq = langs.filter(_ != lang).map(o => s"h_$lang >= h_$o").mkString(" AND ")
      s"WHEN $geq THEN '$lang'"
    }
    s"""SELECT doc_id,
       |  CASE ${cases.mkString("\n    ")} ELSE '${langs.head}' END AS lang_pred,
       |  greatest(${langs.map("h_" + _).mkString(", ")}) AS n_hits
       |FROM (SELECT doc_id, ${hitCols.mkString(",\n    ")}
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents))""".stripMargin
  }

  // Decimal round-trip: round(double, n) disagrees between engines when
  // the value sits a hair below a half boundary (DuckDB's x*10^n scaling
  // can land exactly on .5, BigDecimal's exact view doesn't). Snapping to
  // 10 decimal digits first makes both rounds see the same number.
  private def rdet(c: Column, s: Int): Column =
    round(c.cast(org.apache.spark.sql.types.DecimalType(18, 10)), s).cast("double")

  /** Append the T2 quality metrics (n_words, stop_ratio, punct_ratio,
    * score) to any frame with a `text` column — one codegen'd
    * [[GraftQuality]] struct node per row, so the same operator serves
    * the batch query and the streaming ingest gate (DocStreams)
    * unchanged, and the gate's per-micro-batch re-planning pays ONE
    * expression node instead of the ~150-node column formulation (kept
    * below as [[withQualityExprs]]; TextAnalysisSpec pins row-for-row
    * equality of the two). */
  def withQuality(df: DataFrame): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val q = call_function("graft_quality", col("text"))
    df.withColumn("n_words", q.getField("n_words"))
      .withColumn("stop_ratio", q.getField("stop_ratio"))
      .withColumn("punct_ratio", q.getField("punct_ratio"))
      .withColumn("score", q.getField("score"))
  }

  /** The column-expression formulation [[withQuality]] replaced — the
    * reference semantics the native struct must match bit-for-bit (it is
    * also the shape the DuckDB oracle mirrors). Test-only. */
  private[graft] def withQualityExprs(df: DataFrame): DataFrame = {
    val en = lexicons.toMap.apply("en")
    // Zero-denominator guards: a wordless or empty doc gets null ratios
    // (and therefore a null score, which fails every threshold gate)
    // instead of killing the job with an ANSI divide-by-zero — at corpus
    // scale one degenerate row must never fail the pipeline. The driver
    // corpus has no such rows, so oracle results are unaffected.
    val nWords = when(size(words) === 0, lit(null)).otherwise(size(words).cast("double"))
    val stopHits = size(filter(words, w => array_contains(typedLit(en), w))).cast("double")
    val nChars = when(length(col("text")) === 0, lit(null)).otherwise(length(col("text")).cast("double"))
    // strip letters/digits/spaces → what remains IS the punctuation
    val punct = length(regexp_replace(lower(col("text")), "[a-z0-9 ]", ""))
      .cast("double") / nChars
    val stopRatio = stopHits / nWords
    val score = least(lit(1.0), nWords / lit(100.0)) * 0.5 + stopRatio * 0.3 +
      (lit(1.0) - punct) * 0.2
    df.withColumn("n_words", size(words))
      .withColumn("stop_ratio", rdet(stopRatio, 4))
      .withColumn("punct_ratio", rdet(punct, 4))
      .withColumn("score", rdet(score, 4))
  }

  /** T2: quality scoring — length, punctuation ratio, stopword ratio,
    * composite score. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    withQuality(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_words"), col("stop_ratio"),
        col("punct_ratio"), col("score"))

  def qualityOracle: String = {
    val en = lexicons.toMap.apply("en").map(s => s"'$s'").mkString("[", ", ", "]")
    """SELECT doc_id, len(w) AS n_words,
      |  CAST(round(CAST(hits / nw AS DECIMAL(18,10)), 4) AS DOUBLE) AS stop_ratio,
      |  CAST(round(CAST(pr AS DECIMAL(18,10)), 4) AS DOUBLE) AS punct_ratio,
      |  CAST(round(CAST(least(1.0, nw / 100.0) * 0.5 + (hits / nw) * 0.3 + (1.0 - pr) * 0.2 AS DECIMAL(18,10)), 4) AS DOUBLE) AS score
      |FROM (SELECT doc_id, w,
      |    CAST(len(list_filter(w, x -> list_contains(LEX, x))) AS DOUBLE) AS hits,
      |    CAST(len(w) AS DOUBLE) AS nw,
      |    CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS pr
      |  FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents))""".stripMargin
      .replace("LEX", en)
  }

  /** Whitespace-token class, spelled out because `\S` differs between
    * engines: Java's `\s` is `[ \t\n\x0B\f\r]` but RE2 (DuckDB) excludes
    * vertical tab. The explicit negated class (vertical tab counted as
    * whitespace, Java's convention) is identical under both regex
    * dialects. */
  val NonWhitespaceToken = "[^ \\t\\n\\x0B\\f\\r]+"

  /** T3: token counting — whitespace tokens, regex word tokens, char
    * totals. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(NonWhitespaceToken), lit(0))).as("n_tokens"),
      size(words).as("n_words"),
      length(col("text")).as("n_chars"),
      aggregate(words, lit(0), (acc, w) => acc + length(w)).as("sum_word_chars"))

  def tokenCountOracle: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS n_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
      |  length(text) AS n_chars,
      |  CAST(COALESCE(list_sum(list_transform(regexp_extract_all(lower(text), '[a-z]+'), w -> length(w))), 0) AS BIGINT) AS sum_word_chars
      |FROM documents""".stripMargin

  /** T4: document fingerprinting — a bag fingerprint (md5 of the sorted
    * distinct word set: order-insensitive) and a positional fingerprint
    * (md5 of the word sequence): the pair distinguishes reordered content
    * from true duplicates. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      md5(array_join(array_sort(array_distinct(words)), "|")).as("fp_bag"),
      md5(array_join(words, "|")).as("fp_seq"))

  def fingerprintOracle: String =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))), '|')) AS fp_bag,
      |  md5(array_to_string(regexp_extract_all(lower(text), '[a-z]+'), '|')) AS fp_seq
      |FROM documents""".stripMargin

  /** T5: corpus vocabulary — top-100 words by occurrence count with
    * document frequency. The explode feeds a hash aggregation with
    * map-side partial combine, then a global top-k: at 100 TB the shuffle
    * carries one row per distinct word per partition, not per token. */
  def vocab(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(words).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("word").asc)
      .limit(100)

  def vocabOracle: String =
    """SELECT word, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      |      FROM documents)
      |GROUP BY word ORDER BY n_occ DESC, word ASC LIMIT 100""".stripMargin

  /** T6: quality-filter pipeline — the survivors of the T2 scoring pass
    * under training-data thresholds (min length, min composite score, max
    * punctuation). The thresholds compare the *rounded* metrics, which are
    * bit-identical cross-engine, so the survivor set is deterministic. */
  /** The T6 admission predicate over withQuality columns — ONE definition
    * shared by the batch filter and the streaming ingest gate, so the two
    * paths cannot silently diverge on a threshold tune. */
  def qualityGateCond: Column =
    col("n_words") >= 20 && col("score") >= 0.5 && col("punct_ratio") <= 0.2

  def qualityFilter(spark: SparkSession, dir: String): DataFrame =
    quality(spark, dir)
      .filter(qualityGateCond)
      .select(col("doc_id"), col("n_words"), col("score"))

  def qualityFilterOracle: String =
    s"""SELECT doc_id, n_words, score FROM ($qualityOracle)
       |WHERE n_words >= 20 AND score >= 0.5 AND punct_ratio <= 0.2""".stripMargin

  /** T7: deterministic train/val/test split — every doc is assigned a
    * split by the hash of its id (first 4 md5 hex digits mod 1000:
    * <900 train, <950 val, else test). Pure per-row expression work: the
    * assignment is reproducible on any engine, any cluster size, any run
    * — the property a training-data pipeline needs so re-runs never leak
    * val/test docs into train. */
  /** Per-mille uniform draw from the md5 of `arg` — first 4 hex digits as
    * an integer mod 1000. Spelled as one hex parse (`conv(..., 16, 10)`),
    * which is exactly the digit arithmetic the DuckDB mirror
    * ([[duckPermille]]) spells out (d1*4096 + d2*256 + d3*16 + d4): same
    * integers, no floats, so the two engines agree bit-for-bit. The
    * compact form matters beyond taste: this draw appears three times in
    * the streaming ingest gate, whose analyzed tree is re-planned every
    * micro-batch — the per-op insert bench pays the gate's node count as
    * planning latency, and one conv node replaces ~28 arithmetic nodes
    * per draw. The shared basis of T7 splitting and T10 sampling. */
  def sparkPermille(arg: String): String =
    s"(CAST(conv(substring(md5($arg), 1, 4), 16, 10) AS INT) % 1000)"

  /** T7's split verdict as a reusable SQL expression over `doc_id`. */
  def splitCaseExpr: String =
    s"""CASE WHEN ${sparkPermille("CAST(doc_id AS STRING)")} < 900 THEN 'train'
       |     WHEN ${sparkPermille("CAST(doc_id AS STRING)")} < 950 THEN 'val'
       |     ELSE 'test' END""".stripMargin

  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).selectExpr(
      "doc_id", "lang", s"$splitCaseExpr AS split")

  /** DuckDB mirror of sparkPermille (strpos/substr digit arithmetic). */
  def duckPermille(arg: String): String = {
    val hv = (0 until 4).map(k =>
      s"(strpos('0123456789abcdef', substr(md5($arg), ${k + 1}, 1)) - 1) * ${1 << (4 * (3 - k))}")
      .mkString(" + ")
    s"($hv) % 1000"
  }

  /** DuckDB mirror of splitCaseExpr; `docCol` is the (possibly qualified)
    * doc-id column reference — parameterized so callers embedding this in
    * a larger query never have to rewrite identifiers by string surgery. */
  def duckSplitCaseExpr(docCol: String = "doc_id"): String =
    s"""CASE WHEN ${duckPermille(s"CAST($docCol AS VARCHAR)")} < 900 THEN 'train'
       |     WHEN ${duckPermille(s"CAST($docCol AS VARCHAR)")} < 950 THEN 'val'
       |     ELSE 'test' END""".stripMargin

  def hashSplitOracle: String =
    s"""SELECT doc_id, lang, ${duckSplitCaseExpr()} AS split
       |FROM documents""".stripMargin

  /** T8: bottom-k (KMV) distinct-token sketch per source — graft's custom
    * TypedImperativeAggregate (functions.BottomK): bounded k-value state
    * per partition, mergeable partials, so the shuffle carries k hashes
    * per (group, partition) where collect_set would carry every distinct
    * token. The sorted sketch is deterministic → DuckDB-oracle-able. */
  def bottomkSketch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // surfaced as a '|'-joined string, not array<string>: the driver's
    // pandas compare cannot sort a list column (md5 hex never contains
    // '|', so the join is lossless)
    Tables.documents(spark, dir)
      .select(col("source"), explode(words).as("w"))
      .selectExpr("source", "md5(w) AS h")
      .groupBy(col("source"))
      .agg(expr("array_join(graft_bottomk(h, 16), '|')").as("sketch"))
  }

  def bottomkSketchOracle: String =
    """SELECT source,
      |  array_to_string((list_sort(list(DISTINCT md5(w))))[1:16], '|') AS sketch
      |FROM (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |      FROM documents)
      |GROUP BY source""".stripMargin

  // --- T16: KMV distinct-cardinality estimate -------------------------------

  /** Sketch size shared by [[bottomkSketch]] and [[distinctEstimate]]. */
  val SketchK = 16

  /** Hex digits of the k-th hash used as the KMV order statistic: 12
    * digits = 48 bits, exact in a BIGINT with 15× headroom. */
  private val KmvHexDigits = 12
  private val KmvSpace = 1L << (4 * KmvHexDigits)

  /** Hex-prefix value of a 32-digit md5 string by explicit digit
    * arithmetic ([[Dedup]]'s cross-engine recipe: `find` is `instr` on
    * Spark, `strpos` on DuckDB). */
  private def kmvVal(find: String, arg: String): String =
    (0 until KmvHexDigits).map(j =>
      s"($find('0123456789abcdef', substr($arg, ${j + 1}, 1)) - 1) * CAST(${1L << (4 * (KmvHexDigits - 1 - j))} AS BIGINT)")
      .mkString(" + ")

  /** T16: per-source distinct-token cardinality estimated from the
    * bottom-k (KMV) sketch, next to the exact count it approximates —
    * the estimator the T8 sketch exists to serve: est = (k-1)/u_(k),
    * where u_(k) is the k-th smallest hash normalized into [0,1).
    *
    * Scale shape: the exact count shuffles every distinct token once;
    * the estimate's state is k hashes per group REGARDLESS of
    * cardinality — at 100 TB the sketch column is the difference between
    * a bounded-memory aggregate and one whose partials grow with the
    * vocabulary (collect_set). Sketches of non-full size short-circuit
    * to the exact count (a not-yet-full KMV sketch IS the distinct set).
    * All integer arithmetic (48-bit hash prefix, integer division) →
    * bit-identical cross-engine. */
  def distinctEstimate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("source"), explode(words).as("w"))
      .selectExpr("source", "md5(w) AS h")
      .groupBy(col("source"))
      .agg(countDistinct(col("h")).as("n_exact"),
        expr(s"graft_bottomk(h, $SketchK)").as("sk"))
      .selectExpr("source", "n_exact",
        s"""CASE WHEN size(sk) < $SketchK THEN n_exact
           |  ELSE CAST(${SketchK - 1} AS BIGINT) * $KmvSpace
           |    DIV greatest(${kmvVal("instr", s"element_at(sk, $SketchK)")}, 1)
           |END AS n_est""".stripMargin)
  }

  def distinctEstimateOracle: String =
    s"""WITH tok AS (SELECT source, md5(w) AS h
       |  FROM (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |        FROM documents)),
       |agg AS (SELECT source, count(DISTINCT h) AS n_exact,
       |    (list_sort(list(DISTINCT h)))[1:$SketchK] AS sk
       |  FROM tok GROUP BY source)
       |SELECT source, n_exact,
       |  CASE WHEN len(sk) < $SketchK THEN n_exact
       |    ELSE CAST(${SketchK - 1} AS BIGINT) * $KmvSpace
       |      // greatest(${kmvVal("strpos", s"sk[$SketchK]")}, 1)
       |  END AS n_est
       |FROM agg""".stripMargin

  // --- T17: per-document TF-IDF top term ------------------------------------

  /** T17: each document's most distinctive term by TF-IDF (tf·ln(N/df),
    * the classic smoothing-free form; N = documents with ≥1 token).
    *
    * Scale shape: term frequencies are one (doc, word) hash aggregation;
    * the document-frequency table is vocabulary-sized (≪ corpus — Heaps'
    * law) and explicitly broadcast, as is the single-row N — so the
    * corpus shuffles ONCE for the tf groupBy and the scoring join adds
    * no exchange. The per-doc argmax is a window partitioned by doc_id:
    * millions of singleton-ish partitions hash-spread across executors,
    * never a skewed global sort. Ties break lexicographically → fully
    * deterministic; the score is snapped through DECIMAL(18,10)→6dp (the
    * [[Dedup.jaccardPairs]] recipe) for cross-engine hash stability. */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(words).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds df, N, and the scoring join: one tf pass
    val dfTab = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nDocs = tok.select(countDistinct(col("doc_id")).as("n_docs"))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("w"))
    tok.join(broadcast(dfTab), Seq("w"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", expr(
        "CAST(round(CAST(tf * ln(CAST(n_docs AS DOUBLE) / df) AS DECIMAL(18,10)), 6) AS DOUBLE)"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("w").as("top_term"), col("score").as("tfidf"))
  }

  def tfidfTopOracle: String =
    """WITH tok AS (SELECT doc_id, w, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |        FROM documents)
      |  GROUP BY 1, 2),
      |dfx AS (SELECT w, count(*) AS df FROM tok GROUP BY 1),
      |nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tok),
      |scored AS (SELECT doc_id, w,
      |    CAST(round(CAST(tf * ln((SELECT n FROM nn) / df) AS DECIMAL(18,10)), 6) AS DOUBLE) AS score
      |  FROM tok JOIN dfx USING (w)),
      |r AS (SELECT doc_id, w, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rn
      |  FROM scored)
      |SELECT doc_id, w AS top_term, score AS tfidf FROM r WHERE rn = 1""".stripMargin

  // --- T9: eval-set decontamination ----------------------------------------

  /** Shingle width for contamination checks. Real deployments use 8-13
    * word n-grams; 4 here because the synthetic corpus draws from a tiny
    * vocabulary (at width 8 almost nothing but verbatim dups collide). */
  val DecontamShingle = 4

  /** Production shingle width (the 8-13-gram band real pipelines use).
    * Runs behind the exact same [[decontamOf]] code path as the gated
    * 4-gram profile; DecontamProfileSpec proves it catches planted
    * verbatim contamination while admitting fewer incidental collisions
    * than the wide-net 4-gram. */
  val DecontamShingleProd = 8

  /** T9: decontamination — flag training documents that share any
    * `DecontamShingle`-gram with the held-out eval set (stand-in eval
    * set: doc_id % 50 = 0, the role a benchmark suite plays in a real
    * pipeline).
    *
    * Scale shape: the eval shingle set is tiny and broadcast; the corpus
    * side explodes shingles and joins against the broadcast — one corpus
    * scan, no corpus shuffle (the groupBy shuffles only matched rows,
    * a vanishing fraction). This is the n-gram-overlap decontamination
    * pass every serious training-data pipeline runs before training. */
  def decontam(spark: SparkSession, dir: String): DataFrame =
    decontamOf(Tables.documents(spark, dir), DecontamShingle)

  /** Core of T9 over any (doc_id, text, ...) frame at a given shingle
    * width (eval set = doc_id % 50 = 0): the gated 4-gram profile and the
    * production 8-gram profile ([[DecontamShingleProd]]) are the same
    * plan with a different width constant. */
  def decontamOf(docs: DataFrame, width: Int): DataFrame = {
    // checkpoint the shingle sets once: both the eval and the train branch
    // read them, and the regex + shingle-build pass is the expensive part
    val sh = docs
      .selectExpr("doc_id", "regexp_extract_all(lower(text), '[a-z]+', 0) AS words")
      .filter(expr(s"size(words) >= $width"))
      .selectExpr("doc_id",
        s"""array_distinct(transform(sequence(0, size(words) - $width),
           |  i -> concat_ws(' ', slice(words, i + 1, $width)))) AS sh""".stripMargin)
      .localCheckpoint()
    val evalSh = sh.filter(col("doc_id") % 50 === 0)
      .selectExpr("explode(sh) AS s").distinct()
    sh.filter(col("doc_id") % 50 =!= 0)
      .selectExpr("doc_id", "explode(sh) AS s")
      .join(broadcast(evalSh), Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  def decontamOracle: String =
    s"""WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS words FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(len(words) - ${DecontamShingle - 1}),
       |    i -> array_to_string(words[i + 1:i + $DecontamShingle], ' '))) AS sh
       |  FROM w WHERE len(words) >= $DecontamShingle),
       |ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 50 = 0),
       |tr AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 50 <> 0)
       |SELECT doc_id, count(*) AS n_shared FROM tr JOIN ev USING (s) GROUP BY doc_id""".stripMargin

  // --- T10: stratified sampling --------------------------------------------

  /** Per-mille keep rates per language — the rebalancing knob of a
    * stratified corpus sample (downsample the dominant language, keep the
    * rest). */
  val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 500, "es" -> 800, "de" -> 900, "fr" -> 950, "zh" -> 1000)

  /** T10: deterministic stratified sampling — each doc draws a uniform
    * per-mille value from md5('sample:' || doc_id) (salted so the draw is
    * independent of the T7 split hash) and survives if it falls under its
    * language's keep rate. Pure per-row expression work: reproducible on
    * any engine, any cluster size, any run — and the same doc always gets
    * the same verdict, so incremental re-runs never flip membership. */
  /** T10's salted draw and per-language keep-rate case, reusable. */
  def sampleUExpr: String =
    sparkPermille("concat('sample:', CAST(doc_id AS STRING))")
  def sampleRateCaseExpr: String =
    SampleRates.map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString("CASE lang ", " ", " ELSE 1000 END")

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "lang", s"$sampleUExpr AS u")
      .filter(expr(s"u < $sampleRateCaseExpr"))
      .select(col("doc_id"), col("lang"), col("u"))

  def stratifiedSampleOracle: String =
    s"""SELECT doc_id, lang, u FROM (
       |  SELECT doc_id, lang, ${duckPermille("'sample:' || CAST(doc_id AS VARCHAR)")} AS u FROM documents)
       |WHERE u < $sampleRateCaseExpr""".stripMargin

  // --- T11: intra-document repetition --------------------------------------

  /** T11: repetition scoring — the fraction of word bigrams that are
    * duplicates of an earlier bigram in the same document (the
    * duplicate-n-gram family of quality signals, cf. the Gopher/
    * MassiveText filtering rules): high values mean boilerplate or
    * degenerate repetition. Single scan, pure per-row array expressions,
    * no shuffle at all. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOf(Tables.documents(spark, dir))

  /** Core of T11 over any (doc_id, text) frame. r21 (guide §2.3 narrow
    * types / §4 expression cost): the published values are a COUNT and a
    * DISTINCT-count over a doc's bigrams, so a bigram needs an identity,
    * not its text — the key is one xxhash64 over the two word columns
    * (no separator ambiguity: xxhash64 chains the fields) and the
    * `array_distinct` dedups 8-byte longs with primitive equality instead
    * of built-and-compared strings. A 64-bit collision within one doc
    * (~len²/2⁶⁵, ≈1e-10 for a 10k-word doc) would overcount one dup —
    * the oracle gate would surface it; TextAnalysisSpec pins the hashed
    * path row-identical to the string path (`rawKey = true`). */
  private[graft] def repetitionOf(docs: DataFrame,
                                  rawKey: Boolean = false): DataFrame = {
    val bg =
      if (rawKey)
        """transform(sequence(0, size(words) - 2),
          |  i -> concat_ws(' ', element_at(words, i + 1), element_at(words, i + 2)))""".stripMargin
      else
        """transform(sequence(0, size(words) - 2),
          |  i -> xxhash64(element_at(words, i + 1), element_at(words, i + 2)))""".stripMargin
    docs
      .selectExpr("doc_id", "regexp_extract_all(lower(text), '[a-z]+', 0) AS words")
      .filter(expr("size(words) >= 2"))
      .selectExpr("doc_id", s"$bg AS bg")
      .selectExpr("doc_id", "size(bg) AS n_bigrams",
        """CAST(round(CAST(CAST(size(bg) - size(array_distinct(bg)) AS DOUBLE)
          |  / CAST(size(bg) AS DOUBLE) AS DECIMAL(18,10)), 4) AS DOUBLE) AS dup_bigram_frac""".stripMargin)
  }

  def repetitionOracle: String =
    """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS words FROM documents),
      |b AS (SELECT doc_id, list_transform(range(len(words) - 1),
      |    i -> words[i + 1] || ' ' || words[i + 2]) AS bg
      |  FROM w WHERE len(words) >= 2)
      |SELECT doc_id, len(bg) AS n_bigrams,
      |  CAST(round(CAST(CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE)
      |    / CAST(len(bg) AS DOUBLE) AS DECIMAL(18,10)), 4) AS DOUBLE) AS dup_bigram_frac
      |FROM b""".stripMargin

  // --- T12: quality buckets (head/middle/tail) ------------------------------

  /** T12: CCNet-style quality bucketing — within each language, split docs
    * into head/middle/tail by the T2 composite score.
    *
    * Boundary-based, not rank-based: per-language tercile BOUNDARIES are a
    * tiny aggregate (2 doubles per language), broadcast back, and each doc
    * buckets by a per-row comparison. An `ntile(3) OVER (PARTITION BY
    * lang ...)` window would funnel the whole corpus through one sorting
    * task per language — with 'en' ≈ half the corpus that single task is
    * the scale killer at 100 TB. This form is two corpus scans (score agg
    * + score bucket), zero global sorts, and the skewed key costs nothing.
    * Ties at a boundary all land in the higher bucket on both engines
    * (scores and boundaries are decimal-snapped, so the comparison is
    * bit-identical cross-engine). */
  def qualityBuckets(spark: SparkSession, dir: String): DataFrame = {
    // r21 (guide §2.4, remove shuffles outright): lang lives in the same
    // documents row the quality score is computed from — carry it through
    // the scoring scan instead of re-joining the corpus to itself on
    // doc_id (the old shape was a corpus⋈corpus SortMergeJoin: two
    // exchanges + two sorts that existed only to re-attach one column).
    val scored = withQuality(
        Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"), col("score"))
    val bounds = scored.groupBy(col("lang")).agg(
      rdet(expr("percentile(score, 1.0D/3)"), 6).as("b_lo"),
      rdet(expr("percentile(score, 2.0D/3)"), 6).as("b_hi"))
    scored.join(broadcast(bounds), Seq("lang"))
      .withColumn("bucket",
        when(col("score") >= col("b_hi"), lit("head"))
          .when(col("score") >= col("b_lo"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("lang"), col("score"), col("bucket"))
  }

  def qualityBucketsOracle: String =
    s"""WITH s AS (
       |  SELECT q.doc_id, d.lang, q.score
       |  FROM ($qualityOracle) q JOIN documents d ON d.doc_id = q.doc_id),
       |b AS (
       |  SELECT lang,
       |    CAST(round(CAST(quantile_cont(score, 1.0/3) AS DECIMAL(18,10)), 6) AS DOUBLE) AS b_lo,
       |    CAST(round(CAST(quantile_cont(score, 2.0/3) AS DECIMAL(18,10)), 6) AS DOUBLE) AS b_hi
       |  FROM s GROUP BY lang)
       |SELECT s.doc_id, s.lang, s.score,
       |  CASE WHEN s.score >= b.b_hi THEN 'head'
       |       WHEN s.score >= b.b_lo THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM s JOIN b USING (lang)""".stripMargin

  // --- T13: length-distribution telemetry -----------------------------------

  /** T13: per-source document-length percentiles — the distribution
    * telemetry that drives corpus filter thresholds (where to cut
    * "too short" / "too long" per source). Exact interpolated
    * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, both at
    * rank p·(n−1) with linear interpolation), snapped through the
    * DECIMAL round used everywhere cross-engine doubles meet.
    *
    * Scale note: exact percentile buffers each group's value multiset —
    * fine for per-source telemetry (groups are bounded and values are
    * small ints); at 100 TB with huge value domains the one-word change
    * is [[lengthPercentilesApprox]] (bounded sketch state, mergeable
    * partials), which is not oracle-matchable (its output depends on the
    * accuracy knob) and so is gated by PercentileApproxSpec against this
    * exact form instead. */
  def lengthPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        rdet(expr("percentile(n_chars, 0.25)"), 4).as("p25"),
        rdet(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
        rdet(expr("percentile(n_chars, 0.75)"), 4).as("p75"),
        rdet(expr("percentile(n_chars, 0.95)"), 4).as("p95"))

  /** T13's 100 TB form: `approx_percentile` — the Greenwald-Khanna style
    * sketch whose per-group state is bounded by `accuracy` (rank error ≤
    * group_size / accuracy) and whose partials merge map-side, where the
    * exact form buffers every value. Same output schema as
    * [[lengthPercentiles]]; PercentileApproxSpec asserts its values track
    * the exact ones within the sketch's error bound at sf0.1. */
  def lengthPercentilesApprox(spark: SparkSession, dir: String,
                              accuracy: Int = 10000): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr(s"approx_percentile(n_chars, 0.25, $accuracy)").cast("double").as("p25"),
        expr(s"approx_percentile(n_chars, 0.5, $accuracy)").cast("double").as("p50"),
        expr(s"approx_percentile(n_chars, 0.75, $accuracy)").cast("double").as("p75"),
        expr(s"approx_percentile(n_chars, 0.95, $accuracy)").cast("double").as("p95"))

  def lengthPercentilesOracle: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(round(CAST(quantile_cont(n_chars, 0.25) AS DECIMAL(18,10)), 4) AS DOUBLE) AS p25,
      |  CAST(round(CAST(quantile_cont(n_chars, 0.5) AS DECIMAL(18,10)), 4) AS DOUBLE) AS p50,
      |  CAST(round(CAST(quantile_cont(n_chars, 0.75) AS DECIMAL(18,10)), 4) AS DOUBLE) AS p75,
      |  CAST(round(CAST(quantile_cont(n_chars, 0.95) AS DECIMAL(18,10)), 4) AS DOUBLE) AS p95
      |FROM documents GROUP BY source""".stripMargin

  // --- T14: sequence packing ----------------------------------------------

  /** Tokens per packed training sequence. */
  val PackBudget = 256L

  /** Shards per language stream in the gated sharded packing (T14b).
    * Production would size this so each (lang, shard) stream holds a few
    * GB of tokens — thousands of shards at 100 TB, behind this same knob. */
  val PackShards = 8

  /** Core of T14: pack documents into PackBudget-token training sequences
    * within each independent stream defined by `streamKeys` — fixed doc_id
    * order per stream, running BIGINT cumsum, integer div/mod for the
    * sequence id and offset (bit-identical cross-engine). One shuffle on
    * the stream key; each stream is a single window task, so the stream
    * key's granularity IS the parallelism: callers choose it to bound the
    * per-task data (see seqPackSharded). */
  def seqPackStreams(df: DataFrame, streamKeys: Seq[String]): DataFrame =
    df.withColumn("cum_before", coalesce(expr(
        s"""sum(n_tokens) OVER (PARTITION BY ${streamKeys.mkString(", ")}
           |ORDER BY doc_id ASC
           |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin), lit(0L)))
      .withColumn("seq_id", expr(s"cum_before div $PackBudget"))
      .withColumn("seq_offset", expr(s"cum_before % $PackBudget"))
      .drop("cum_before")

  private def packBase(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), size(words).cast("long").as("n_tokens"))

  /** T14 (compat form): one stream per language. Fine when languages are
    * balanced and streams fit one task; the gated scale form is
    * seqPackSharded below. */
  def seqPack(spark: SparkSession, dir: String): DataFrame =
    seqPackStreams(packBase(spark, dir), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("seq_id"), col("seq_offset"))

  /** T14b (scale form): streams are (lang, shard) with shard a
    * deterministic hash of doc_id mod PackShards — the per-stream window
    * task now sees ~1/PackShards of its language, so a skewed language
    * ('en' ≈ half the corpus) no longer serializes through one task.
    * Readers reassemble a language's corpus as the union of its shard
    * streams; determinism is unchanged (the shard draw is the same md5
    * permille used by T7/T10, reproducible on any engine). */
  def seqPackSharded(spark: SparkSession, dir: String): DataFrame =
    seqPackStreams(
      packBase(spark, dir).withColumn("shard",
        expr(s"${sparkPermille("CAST(doc_id AS STRING)")} % $PackShards").cast("int")),
      Seq("lang", "shard"))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        col("seq_id"), col("seq_offset"))

  private def seqPackOracleFor(streamKeys: String, shardCol: String): String =
    s"""SELECT doc_id, lang$shardCol, n_tokens,
       |  CAST(cum_before // $PackBudget AS BIGINT) AS seq_id,
       |  CAST(cum_before % $PackBudget AS BIGINT) AS seq_offset
       |FROM (
       |  SELECT doc_id, lang$shardCol, n_tokens,
       |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY $streamKeys ORDER BY doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM (SELECT doc_id, lang,
       |      CAST(${duckPermille("CAST(doc_id AS VARCHAR)")} % $PackShards AS INTEGER) AS shard,
       |      CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_tokens
       |    FROM documents))""".stripMargin

  def seqPackOracle: String = seqPackOracleFor("lang", "")

  def seqPackShardedOracle: String = seqPackOracleFor("lang, shard", ", shard")

  // --- T15: n-gram (bigram) counts ------------------------------------------

  /** T15: corpus bigram statistics — top-50 adjacent word pairs, the n-gram
    * LM / contamination-analysis building block. Same explode→hash-agg
    * shape as T5 vocab: the shuffle carries one row per distinct bigram per
    * partition (map-side combine), never per token. */
  def bigrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(words.as("w"))
      // slice length must be >= 0 (slice throws on size(w)-1 = -1), and
      // docs with <2 words contribute no bigrams anyway
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        // adjacency via two shifted slices zipped — no index sequence, so
        // there is no sequence(1, 0) reversed-range edge case
        """zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
          |  (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("bigram").asc)
      .limit(50)

  def bigramsOracle: String =
    """SELECT bigram, count(*) AS n_occ FROM (
      |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bigram
      |  FROM (SELECT regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents)
      |  WHERE len(w) >= 2)
      |GROUP BY bigram ORDER BY n_occ DESC, bigram ASC LIMIT 50""".stripMargin

  // --- T18: PII scrubbing ----------------------------------------------------

  /** Patterns scrubbed by T18, applied in this order (order is part of
    * the contract: emails first — their dotted domains would otherwise
    * feed the IP pattern — then phones, then IPv4). Regexes restricted
    * to syntax with identical semantics in Java regex (Spark) and RE2
    * (DuckDB): char classes, \d, \b, bounded repetition, alternation.
    *
    * Boundary (pinned in TextAnalysisSpec "piiScrub pattern boundary"):
    * the IP octet alternation admits only 0-255, so `300.1.2.3` is NOT an
    * IP (a naive \d{1,3} quad would redact it — and \b blocks a partial
    * match of its valid `00.1.2.3` tail because digit→digit is not a word
    * boundary); `555-123` is too short for the phone shape; and
    * `user@localhost` has no dotted TLD, so it stays. Over-redaction is a
    * real cost in a compliance pass — every false positive destroys
    * training text — so the misses are contract, not accident. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "<EMAIL>",
    "\\b\\d{3}-\\d{4}\\b" -> "<PHONE>",
    ("\\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])" +
      "(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b") -> "<IP>")

  /** T18: PII scrubbing — redact emails / phone numbers / IPv4 addresses
    * and count what was removed, the compliance pass every training-data
    * pipeline runs before release. Pure per-row regex expression work:
    * one scan, zero shuffles (pinned in PlanShapeSpec), trivially
    * data-parallel at 100 TB.
    *
    * The synthetic corpus contains no digits at all (so raw scrubbing
    * would be gated on a no-op): the query PLANTS deterministic PII
    * derived from doc_id — identically on both engines, the same
    * plant-then-operate pattern the dedup scale specs use — and the
    * scrubber must find and redact exactly the planted items. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0.1")).as("text"))
    val Seq(email, phone, ip) = PiiPatterns.map(_._1)
    val scrubbed = PiiPatterns.foldLeft(col("text")) {
      case (c, (pat, tag)) => regexp_replace(c, pat, tag)
    }
    planted.select(
      col("doc_id"),
      regexp_count(col("text"), lit(email)).as("n_emails"),
      regexp_count(col("text"), lit(phone)).as("n_phones"),
      regexp_count(col("text"), lit(ip)).as("n_ips"),
      scrubbed.as("scrubbed"))
  }

  def piiScrubOracle: String = {
    val Seq(email, phone, ip) = PiiPatterns.map(_._1)
    // DuckDB regexp_replace is first-match-only without the 'g' flag
    val scrub = PiiPatterns.foldLeft("text") {
      case (s, (pat, tag)) => s"regexp_replace($s, '$pat', '$tag', 'g')"
    }
    s"""WITH planted AS (SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR)
       |      || '@example.com or call 555-'
       |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$email')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$phone')) AS INTEGER) AS n_phones,
       |  CAST(len(regexp_extract_all(text, '$ip')) AS INTEGER) AS n_ips,
       |  $scrub AS scrubbed
       |FROM planted""".stripMargin
  }

  // --- T19: unigram-frequency scoring ---------------------------------------

  /** T19: unigram-LM quality scoring — each token scored by its corpus
    * frequency-per-million (the fixed-point unigram probability), each
    * doc by the mean and minimum over its tokens: the shape of
    * CCNet-style LM filtering with the model swapped for the corpus's
    * own unigram table. Low mean = unusual vocabulary; low min = the doc
    * contains the corpus's rarest tokens. Integer-exact end to end
    * (counts, ×1e6 fixed point, integer division), so the cross-engine
    * oracle hash-matches without any float-rounding recipe.
    *
    * Scale shape: the corpus tokenizes ONCE into (doc, word, multiplicity)
    * — the same hash aggregation T17 starts from — then the vocabulary
    * (≪ corpus, Heaps' law) and the single-row token total are broadcast
    * onto it: one shuffle total, and the per-doc reduction is a second
    * map-side-combined aggregation on doc_id. A real LM swap-in changes
    * only the `fpm` column (per-token logprob from the model table). */
  def freqScore(spark: SparkSession, dir: String): DataFrame =
    freqScoreOf(Tables.documents(spark, dir))

  private[graft] def freqScoreOf(docs: DataFrame): DataFrame = {
    val dw = docs
      .select(col("doc_id"), explode(words).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("m"))
      .localCheckpoint() // feeds vocab, the total, and the scoring join
    val vocab = dw.groupBy(col("w")).agg(sum(col("m")).as("cnt"))
    val total = vocab.select(sum(col("cnt")).as("total"))
    dw.join(broadcast(vocab), Seq("w"))
      .crossJoin(broadcast(total))
      .withColumn("fpm", expr("cnt * 1000000L DIV total"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_tokens"),
        expr("sum(m * fpm) DIV sum(m)").as("mean_fpm"),
        min(col("fpm")).as("min_fpm"))
      .select(col("doc_id"), col("n_tokens"), col("mean_fpm"), col("min_fpm"))
  }

  def freqScoreOracle: String =
    """WITH dw AS (SELECT doc_id, w, count(*) AS m
      |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |        FROM documents)
      |  GROUP BY 1, 2),
      |vocab AS (SELECT w, CAST(sum(m) AS BIGINT) AS cnt FROM dw GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
      |scored AS (SELECT doc_id, m, cnt * 1000000 // (SELECT total FROM tot) AS fpm
      |  FROM dw JOIN vocab USING (w))
      |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_tokens,
      |  CAST(sum(m * fpm) // sum(m) AS BIGINT) AS mean_fpm,
      |  min(fpm) AS min_fpm
      |FROM scored GROUP BY doc_id""".stripMargin

  // --- T20: BM25 relevance ranking ------------------------------------------

  /** Okapi BM25 parameters (the standard defaults). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** T20: Okapi BM25 top-5 documents per query term — the retrieval
    * scoring pass a training-data pipeline runs for data selection /
    * quality-by-query curation (and the scoring core of any RAG corpus
    * build). Query = the corpus's 3 highest-total-frequency terms
    * (deterministic: ties by term), so the op needs no external input.
    *
    * score(d, t) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf = ln((N − df + 0.5)/(df + 0.5) + 1).
    *
    * Scale shape: ONE tokenize pass feeds tf, doc length, df, and the
    * query-term pick (the tf relation is checkpointed and reused); the
    * query set, df table, and avgdl scalar are broadcast; the only
    * corpus-wide shuffle is the (doc, term) tf aggregation. The top-5
    * window partitions by term over docs CONTAINING the term only.
    * Doubles: the formula is one fixed expression tree evaluated
    * identically on both engines; the published score snaps through
    * DECIMAL(18,10) → 6 dp (the repo's standard cross-engine snap). */
  def bm25Top(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(words).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds dl, df, query pick, and scoring: one pass
    val dl = tok.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")) / count(lit(1))).cast("double").as("avgdl"))
    val dfTab = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val queryTerms = tok.groupBy(col("w")).agg(sum(col("tf")).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(3)
      .select(col("w").as("term"))
    val win = Window.partitionBy(col("term"))
      .orderBy(col("bm25").desc, col("doc_id"))
    // df restricted to the 3 query terms BEFORE broadcasting: the full
    // df table is vocabulary-sized (millions of rows at the claimed
    // scale) and only 3 of its values are ever read
    val dfq = dfTab.join(queryTerms, col("w") === col("term"))
      .select(col("w"), col("df"))
    tok.join(broadcast(queryTerms), col("w") === col("term"))
      .join(broadcast(dfq), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("bm25", expr(
        s"""CAST(round(CAST(
           |  ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1)
           |  * (CAST(tf AS DOUBLE) * ($Bm25K1 + 1))
           |  / (CAST(tf AS DOUBLE) + $Bm25K1 * (1 - $Bm25B + $Bm25B * CAST(dl AS DOUBLE) / avgdl))
           |AS DECIMAL(18,10)), 6) AS DOUBLE)""".stripMargin))
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= 5)
      .select(col("term"), col("rnk"), col("doc_id"), col("bm25"))
  }

  def bm25TopOracle: String =
    s"""WITH tok AS (SELECT doc_id, w, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |        FROM documents)
       |  GROUP BY 1, 2),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tok GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs,
       |    CAST(CAST(sum(dl) AS DOUBLE) / count(*) AS DOUBLE) AS avgdl FROM dl),
       |dfx AS (SELECT w, count(*) AS df FROM tok GROUP BY 1),
       |q AS (SELECT w AS term FROM (SELECT w, sum(tf) AS cnt FROM tok GROUP BY 1)
       |      ORDER BY cnt DESC, w LIMIT 3),
       |scored AS (SELECT q.term, tok.doc_id,
       |    CAST(round(CAST(
       |      ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1)
       |      * (CAST(tf AS DOUBLE) * ($Bm25K1 + 1))
       |      / (CAST(tf AS DOUBLE) + $Bm25K1 * (1 - $Bm25B + $Bm25B * CAST(dl.dl AS DOUBLE) / avgdl))
       |    AS DECIMAL(18,10)), 6) AS DOUBLE) AS bm25
       |  FROM tok JOIN q ON tok.w = q.term
       |  JOIN dfx ON dfx.w = tok.w
       |  JOIN dl ON dl.doc_id = tok.doc_id
       |  CROSS JOIN stats),
       |r AS (SELECT term, doc_id, bm25,
       |    row_number() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS rnk
       |  FROM scored)
       |SELECT term, rnk, doc_id, bm25 FROM r WHERE rnk <= 5""".stripMargin

  // --- T22: heavy hitters ---------------------------------------------------

  /** Misra-Gries capacity (ε = 1/(m+1): every token with frequency above
    * N/65 is guaranteed retained) and the published top-k. */
  val HeavyHittersM = 64
  val HeavyHittersK = 10

  /** T22: exact corpus top-k tokens via a two-phase Misra-Gries pass —
    * the heavy-hitters op a vocabulary/over-representation audit runs at
    * corpus scale. Phase 1: the native mergeable [[MisraGries]] summary
    * (graft_mg_candidates) finds candidates with BOUNDED state — the
    * shuffle carries at most m counters per partition, where a bare
    * `GROUP BY token` carries every distinct token. Phase 2: candidates
    * broadcast back, exact recount of candidate tokens only (map-side
    * combine collapses to ≤ m keys per partition), exact top-k by
    * (count DESC, term). The output is exact-deterministic whenever the
    * true top-k clear the N/(m+1) retention bound (SketchSpec pins the
    * bound and the operator's partition-invariance), so the DuckDB
    * oracle is the plain exact GROUP BY top-k. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val tok = Tables.documents(spark, dir).select(explode(words).as("w"))
    val cands = tok.agg(
      call_function("graft_mg_candidates", col("w"), lit(HeavyHittersM)).as("cands"))
    // explode the candidate array to rows and broadcast-HASH-join on the
    // token: array_contains against the 1-row array would plan a nested
    // loop evaluating up to m string comparisons per corpus token
    val candRows = cands.select(explode(col("cands")).as("w"))
    tok.join(broadcast(candRows), Seq("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(HeavyHittersK)
      .select(col("w").as("term"), col("n"))
  }

  def heavyHittersOracle: String =
    s"""SELECT w AS term, count(*) AS n
       |FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
       |GROUP BY w ORDER BY n DESC, w LIMIT $HeavyHittersK""".stripMargin

  // --- T21: temperature-weighted source mixing ------------------------------

  /** Mixing temperature exponent (α): sampling weight ∝ n^α flattens the
    * source distribution (α=1 keeps natural proportions, α=0 is uniform);
    * 0.5 is the square-root temperature commonly used for multi-source
    * corpus mixing. */
  val MixAlpha = 0.5

  /** Overall sampling budget as a fraction of the corpus. */
  val MixBudget = 0.5

  /** T21: temperature-weighted source mixing — THE data-mixing op of a
    * multi-source training pipeline: re-weight sources by n^α (α = 0.5
    * temperature), allocate a total budget (50% of the corpus) across
    * sources by the flattened weights, and downsample each source to its
    * allocation with the deterministic md5-permille draw shared with
    * T7/T10 (so membership is reproducible and engine-independent).
    * Over-represented sources shrink toward the flattened share;
    * under-represented ones keep everything (keep-ratio capped at 1).
    *
    * Scale shape: one tiny per-source count aggregation, thresholds
    * BROADCAST back, one filter pass over the corpus — no corpus
    * shuffle. Cross-engine determinism: per-source weights snap through
    * DECIMAL(18,10) and the weight TOTAL is a decimal sum (exact,
    * order-insensitive), so the double division that follows sees
    * bit-identical inputs on both engines; the final threshold is
    * floor()'d before the int cast (TRUNCATION on both engines — a bare
    * INT cast rounds in DuckDB but truncates in Spark). */
  def sourceMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("w", expr(
        s"CAST(round(CAST(pow(CAST(n AS DOUBLE), $MixAlpha) AS DECIMAL(18,10)), 9) AS DECIMAL(18,10))"))
    val totals = counts.agg(sum(col("n")).as("n_total"), sum(col("w")).as("w_total"))
    val thresholds = counts.crossJoin(broadcast(totals))
      .withColumn("thr", expr(
        s"""CAST(floor(1000 * least(CAST(1.0 AS DOUBLE),
           |  $MixBudget * CAST(n_total AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE))
           |    / CAST(n AS DOUBLE))) AS INT)""".stripMargin))
      .select(col("source"), col("thr"))
    docs.join(broadcast(thresholds), Seq("source"))
      .filter(expr(s"${sparkPermille("CAST(doc_id AS STRING)")} < thr"))
      .select(col("doc_id"), col("source"))
  }

  def sourceMixOracle: String =
    s"""WITH counts AS (SELECT source, count(*) AS n,
       |    CAST(round(CAST(pow(CAST(count(*) AS DOUBLE), $MixAlpha) AS DECIMAL(18,10)), 9) AS DECIMAL(18,10)) AS w
       |  FROM documents GROUP BY 1),
       |totals AS (SELECT sum(n) AS n_total, sum(w) AS w_total FROM counts),
       |thresholds AS (SELECT source,
       |    CAST(floor(1000 * least(CAST(1.0 AS DOUBLE),
       |      $MixBudget * CAST(n_total AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE))
       |        / CAST(n AS DOUBLE))) AS INT) AS thr
       |  FROM counts CROSS JOIN totals)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN thresholds t ON d.source = t.source
       |WHERE ${duckPermille("CAST(d.doc_id AS VARCHAR)")} < t.thr""".stripMargin

  // --- T23: BPE subword tokenization -----------------------------------------

  /** Merge-table size for [[bpeEncode]] — small by design (the merge
    * table is driver-resident and broadcast; a production run would use
    * 30k+ merges, the LOOP SHAPE is identical). */
  val BpeMerges = 10

  /** The greedy left-to-right single-pair merge as a codegen'd
    * higher-order fold: walk the symbol array once, replacing each
    * non-overlapping adjacent (a, b) with their concatenation,
    * leftmost-first. Overlap semantics ride the fold for free: after a
    * merge the accumulator's last element is concat(a, b), which can
    * never equal `a` again (b is nonempty), so "aaa" under (a, a)
    * yields [aa, a] exactly as canonical BPE does. Symbols are [a-z]+
    * substrings, so the inlined literals need no escaping. */
  private def bpeMergeSql(a: String, b: String): String =
    s"""aggregate(syms, CAST(array() AS ARRAY<STRING>),
       |  (acc, s) -> IF(size(acc) > 0 AND element_at(acc, -1) = '$a' AND s = '$b',
       |    concat(slice(acc, 1, size(acc) - 1), array('$a$b')),
       |    concat(acc, array(s))))""".stripMargin

  /** T23: deterministic byte-pair-encoding subword tokenization — the
    * token-budget operator of a real training pipeline (T3/T19/T21
    * count regex words; training budgets are SUBWORD tokens). Learner:
    * [[BpeMerges]] rounds over the DISTINCT-WORD table (Heaps' law:
    * vocabulary-scale, never corpus-scale) — each round one
    * frequency-weighted adjacent-pair aggregation, the winner chosen by
    * (count DESC, pair ASC) so ties are deterministic, then the merge
    * applied to every word's symbol array by [[bpeMergeSql]]'s fold.
    * The per-round argmax is ONE collected row (the greedy-modularity
    * scalar-probe pattern); the merge application is a narrow map. The
    * ENCODE pass is a join: the learner already segmented every
    * distinct word, so encoding the corpus = words ⋈ vocab — at 100 TB
    * the vocab side broadcasts and no corpus shuffle happens beyond
    * the per-doc re-aggregation. Output: (doc_id, n_subwords, n_words)
    * per document with ≥ 1 word.
    *
    * Determinism: the winning pair is a pure function of the corpus
    * multiset (partition-invariant by the commutative count agg + total
    * tie order); TextAnalysisSpec pins merge-order determinism,
    * partition invariance, and a hand-worked instance. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncodeOf(Tables.documents(spark, dir), BpeMerges)

  /** The learner: k merge rounds over `docs`, returning the segmented
    * distinct-word table (word, freq, syms) and the learned merge list
    * in order. See [[bpeEncode]]'s doc for the scale shape. */
  def bpeLearn(docs: DataFrame, k: Int): (DataFrame, Seq[(String, String)]) = {
    val wordFreq = docs.select(explode(words).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // vocabulary-scale frame, re-derived k times — pin it once.
    // Char split via substring-per-position (the exact mirror of the
    // oracle's list_transform) — regex splits ('', '(?!^)') leave a
    // trailing empty symbol under Spark's limit=-1 semantics.
    // r21 NOTE (measured, rejected): lazy checkpoints (eager = false)
    // throughout this loop — folding each round's materialization into
    // its argmax job, 1 scheduled job/round instead of 2 — were tried to
    // cut the per-round driver constant and measured SLOWER at sf0.1
    // (t_bpe_encode 1.14 → 1.45 s, executor cpu also up): persisting
    // inside the argmax job's tasks costs more than the extra (narrow,
    // already-persisted-input) checkpoint job it saves. Eager stays.
    var vocab = wordFreq
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to k) {
      val best = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS x, element_at(syms, i + 1) AS y))"""
            .stripMargin)).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
        .limit(1).collect()
      if (best.nonEmpty) { // no pairs left: every word fully merged
        learned += ((best(0).getString(0), best(0).getString(1)))
        vocab = vocab.withColumn("syms",
          expr(bpeMergeSql(best(0).getString(0), best(0).getString(1))))
          .localCheckpoint()
      }
    }
    (vocab, learned.toSeq)
  }

  /** The learned merge table alone (rank order) — spec surface. */
  def bpeMergeTable(docs: DataFrame, k: Int): Seq[(String, String)] =
    bpeLearn(docs, k)._2

  def bpeEncodeOf(docs: DataFrame, k: Int): DataFrame = {
    val vocab = bpeLearn(docs, k)._1
    docs.select(col("doc_id"), explode(words).as("word"))
      .join(vocab.select(col("word"), size(col("syms")).as("n")), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_subwords"), count(lit(1)).as("n_words"))
  }

  /** DuckDB mirror of [[bpeEncode]] — the same [[BpeMerges]] rounds
    * unrolled (the G27 MATERIALIZED-CTE pattern), with the greedy
    * left-to-right merge walk expressed as a per-word recursive scan
    * (state = (rest, out); depth = word length): bit-identical pair
    * counts, the same (cnt DESC, x, y) winner, the same fold. An empty
    * winner (no pairs left) makes the round a no-op on both engines. */
  def bpeEncodeOracle: String = {
    val rounds = (1 to BpeMerges).map { r =>
      s"""pc$r AS (SELECT syms[CAST(i AS INT)] AS x, syms[CAST(i AS INT) + 1] AS y,
         |    SUM(freq) AS cnt
         |  FROM v${r - 1}, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
         |b$r AS MATERIALIZED (SELECT x, y FROM pc$r
         |  ORDER BY cnt DESC, x ASC, y ASC LIMIT 1),
         |m$r(word, freq, rest, out) AS (
         |  SELECT word, freq, syms, CAST([] AS VARCHAR[]) FROM v${r - 1}
         |  UNION ALL
         |  SELECT word, freq,
         |    CASE WHEN len(rest) >= 2 AND rest[1] = (SELECT x FROM b$r)
         |           AND rest[2] = (SELECT y FROM b$r)
         |      THEN rest[3:] ELSE rest[2:] END,
         |    CASE WHEN len(rest) >= 2 AND rest[1] = (SELECT x FROM b$r)
         |           AND rest[2] = (SELECT y FROM b$r)
         |      THEN list_append(out, rest[1] || rest[2])
         |      ELSE list_append(out, rest[1]) END
         |  FROM m$r WHERE len(rest) > 0),
         |v$r AS MATERIALIZED (SELECT word, freq, out AS syms FROM m$r
         |  WHERE len(rest) = 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |w AS MATERIALIZED (SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM documents),
       |v0 AS MATERIALIZED (SELECT word, COUNT(*) AS freq,
       |    list_transform(range(1, length(word) + 1),
       |      i -> word[CAST(i AS INT)]) AS syms
       |  FROM w GROUP BY word),
       |$rounds
       |SELECT w.doc_id, CAST(SUM(len(v.syms)) AS BIGINT) AS n_subwords,
       |  COUNT(*) AS n_words
       |FROM w JOIN v$BpeMerges v ON v.word = w.word
       |GROUP BY w.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_bpe_encode" -> bpeEncode,
    "t_bm25" -> bm25Top,
    "t_heavy_hitters" -> heavyHitters,
    "t_source_mix" -> sourceMix,
    "t_freq_score" -> freqScore,
    "t_pii_scrub" -> piiScrub,
    "t_seq_pack" -> seqPack,
    "t_seq_pack_sharded" -> seqPackSharded,
    "t_bigrams" -> bigrams,
    "t_lang_id" -> langId,
    "t_quality" -> quality,
    "t_token_count" -> tokenCount,
    "t_fingerprint" -> fingerprint,
    "t_vocab" -> vocab,
    "t_quality_filter" -> qualityFilter,
    "t_hash_split" -> hashSplit,
    "t_bottomk_sketch" -> bottomkSketch,
    "t_distinct_estimate" -> distinctEstimate,
    "t_tfidf" -> tfidfTop,
    "t_decontam" -> decontam,
    "t_stratified_sample" -> stratifiedSample,
    "t_repetition" -> repetition,
    "t_quality_buckets" -> qualityBuckets,
    "t_length_percentiles" -> lengthPercentiles)

  val oracles: Map[String, String] = Map(
    "t_bpe_encode" -> bpeEncodeOracle,
    "t_bm25" -> bm25TopOracle,
    "t_heavy_hitters" -> heavyHittersOracle,
    "t_source_mix" -> sourceMixOracle,
    "t_freq_score" -> freqScoreOracle,
    "t_pii_scrub" -> piiScrubOracle,
    "t_seq_pack" -> seqPackOracle,
    "t_seq_pack_sharded" -> seqPackShardedOracle,
    "t_bigrams" -> bigramsOracle,
    "t_lang_id" -> langIdOracle,
    "t_quality" -> qualityOracle,
    "t_token_count" -> tokenCountOracle,
    "t_fingerprint" -> fingerprintOracle,
    "t_vocab" -> vocabOracle,
    "t_quality_filter" -> qualityFilterOracle,
    "t_hash_split" -> hashSplitOracle,
    "t_bottomk_sketch" -> bottomkSketchOracle,
    "t_distinct_estimate" -> distinctEstimateOracle,
    "t_tfidf" -> tfidfTopOracle,
    "t_decontam" -> decontamOracle,
    "t_stratified_sample" -> stratifiedSampleOracle,
    "t_repetition" -> repetitionOracle,
    "t_quality_buckets" -> qualityBucketsOracle,
    "t_length_percentiles" -> lengthPercentilesOracle)
}
