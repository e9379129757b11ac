package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis

/** Invariants of the T9-T12 pipeline operators (their value-level
  * correctness is DuckDB-oracle-gated; these pin the semantic contracts). */
class TextAnalysisSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-text-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  test("bpe: hand-worked merge trajectory, greedy overlap, and exhaustion no-op") {
    import spark.implicits._
    // corpus: aaab ×2, ab ×1.
    //  round 1: pairs (a,a)=4 (two per aaab), (a,b)=3 → merge (a,a);
    //           greedy left-to-right on aaab = [aa, a, b] (the middle
    //           'a' is consumed by the FIRST occurrence, not re-used)
    //  round 2: (aa,a)=2, (a,b)=2+1 → merge (a,b) → aaab=[aa,ab], ab=[ab]
    //  round 3: (aa,ab)=2 → merge → aaab=[aaab]
    //  round 4+: no pairs anywhere → no-op rounds
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMergeTable(docs, 5)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    val enc = TextAnalysis.bpeEncodeOf(docs, 5).collect()
    assert(enc.length === 1)
    // encode: aaab→1 token ×2, ab→1 token → 3 subwords over 3 words
    assert((enc(0).getLong(1), enc(0).getLong(2)) === ((3L, 3L)))
  }

  test("bpe: deterministic tie-break and partition invariance") {
    import spark.implicits._
    // (a,b) and (c,d) both count 2 → lexicographic min pair (a,b) wins
    val tied = Seq((1L, "ab cd"), (2L, "ab cd")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMergeTable(tied, 1) === Seq(("a", "b")))
    // partition invariance on the real corpus: the learned table and the
    // per-doc encoding are pure functions of the corpus multiset
    val docs = graft.sources.Tables.documents(spark, dir)
    val m1 = TextAnalysis.bpeMergeTable(docs.repartition(1), 4)
    val m7 = TextAnalysis.bpeMergeTable(docs.repartition(7), 4)
    assert(m1 === m7)
    assert(m1.length === 4)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val e1 = asMap(TextAnalysis.bpeEncodeOf(docs.repartition(1), 4))
    val e7 = asMap(TextAnalysis.bpeEncodeOf(docs.repartition(7), 4))
    assert(e1 === e7)
    // subword count per doc is bounded by (chars, words]: merging only
    // ever shrinks a word's segmentation, never below one token
    e1.values.foreach { case (nsw, nw) => assert(nsw >= nw) }
  }

  test("freqScore: planted corpus → exact fixed-point unigram frequencies") {
    import spark.implicits._
    // counts: a=3, b=1, c=1, total=5 → fpm a=600000, b=c=200000
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.freqScoreOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 466666L, 200000L))) // (2*600000 + 200000) div 3
    assert(got(2L) == ((2L, 400000L, 200000L)))
  }

  test("freqScore invariants on the real corpus") {
    val rows = graft.functions.TextAnalysis.freqScore(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mean, mn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 1)
      assert(mn >= 1 && mn <= mean, s"doc ${r.getLong(0)}: min $mn mean $mean")
      assert(mean <= 1000000, "a token's frequency share cannot exceed the whole corpus")
    }
  }

  test("graft_quality native struct is bit-identical to the column-expression formulation") {
    // The single-node GraftQuality expression replaced a ~150-node tree
    // (per-micro-batch planning + per-task plan-ship cost on the ingest
    // gate); this pins value parity on the full sf0.001 corpus PLUS the
    // boundary rows the corpus can't contain: empty text, whitespace/
    // punctuation-only (0 words but chars), digits, unicode with
    // multi-byte chars, null, and a locale trap (U+0130 lowercases to 2
    // code points, so the punct denominator must use the ORIGINAL length).
    import spark.implicits._
    val corpus = graft.sources.Tables.documents(spark, dir).select(col("text"))
    val edges = Seq("", "   ", "!!!", "12 34", "the and of", "é ü 中文 the",
      "İstanbul the", "a", "THE A AND").toDF("text")
    val adversarial = corpus.union(edges)
      .union(Seq[Option[String]](None).toDF("text"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("text", "n_words", "stop_ratio", "punct_ratio", "score")
        .collect().map(_.toSeq).toSeq
    val native = canon(TextAnalysis.withQuality(adversarial))
    val exprs = canon(TextAnalysis.withQualityExprs(adversarial))
    assert(native.size == exprs.size)
    native.zip(exprs).foreach { case (n, e) =>
      assert(n == e, s"native $n != expression $e")
    }
  }

  test("graft_langid native struct is identical to the greatest-of-structs formulation") {
    // Tie-breaks are the trap: greatest(struct(hits, lang)) gives equal
    // hit counts to the lexicographically LAST language, including the
    // all-zero case ('fr'). Edge rows force 0-hit, single-hit, and
    // multi-language-tie outcomes on top of the full corpus.
    import spark.implicits._
    val corpus = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val edges = Seq(
      (100001L, ""), (100002L, "zzz qqq"), (100003L, "the der el le"),
      (100004L, "und und the the"), (100005L, "es la en y por para"),
      (100006L, "THE AND OF"), (100007L, "le la les et est"))
      .toDF("doc_id", "text")
    val all = corpus.union(edges)
    val native = TextAnalysis.langId(spark, dir) // corpus-only route
    // compare apples to apples: run both formulations over `all`
    graft.functions.GraftFunctions.register(spark)
    val q = call_function("graft_langid", col("text"))
    val nat = all.select(col("doc_id"), q.getField("lang_pred").as("lang_pred"),
      q.getField("n_hits").as("n_hits")).collect().map(_.toSeq).toSeq
    val old = TextAnalysis.langIdExprs(all).collect().map(_.toSeq).toSeq
    assert(nat.size == old.size && native.count() == corpus.count())
    nat.zip(old).foreach { case (n, e) => assert(n == e, s"native $n != expression $e") }
  }

  test("decontam never flags eval-set documents and counts are positive") {
    val rows = TextAnalysis.decontam(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (id, _) => id % 50 != 0 })
    assert(rows.forall { case (_, n) => n > 0 })
  }

  test("piiScrub pattern boundary: adversarial near-misses survive, true PII is redacted") {
    // the oracle gate proves the planted-PII contract; this pins the OTHER
    // side of the boundary — what must NOT be redacted. Over-redaction
    // destroys training text, so each near-miss is contract: octets >255
    // are not IPs (and \b blocks partial matches of their valid tails),
    // 555-123 / 555-12345 are not the phone shape, user@localhost has no
    // dotted TLD.
    import spark.implicits._
    val cases = Seq(
      ("ping 300.1.2.3 now", "ping 300.1.2.3 now"),
      ("ping 999.999.999.999 now", "ping 999.999.999.999 now"),
      ("ping 256.0.0.1 now", "ping 256.0.0.1 now"),
      ("call 555-123 now", "call 555-123 now"),
      ("call 555-12345 now", "call 555-12345 now"),
      ("mail user@localhost now", "mail user@localhost now"),
      // …and the true positives still redact, including the extremes
      ("ping 255.255.255.255 now", "ping <IP> now"),
      ("ping 0.0.0.0 now", "ping <IP> now"),
      ("ping 10.199.0.1 now", "ping <IP> now"),
      ("call 555-0199 now", "call <PHONE> now"),
      ("mail a.b+c%d@ex-1.co now", "mail <EMAIL> now"))
    val scrub = TextAnalysis.PiiPatterns.foldLeft(col("s")) {
      case (c, (pat, tag)) => regexp_replace(c, pat, tag)
    }
    val got = cases.map(_._1).toDF("s").select(scrub.as("out")).as[String].collect()
    got.zip(cases).foreach { case (o, (in, want)) =>
      assert(o == want, s"scrub('$in') = '$o', want '$want'")
    }
  }

  test("stratifiedSample is deterministic and respects per-language rates") {
    val s1 = TextAnalysis.stratifiedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val s2 = TextAnalysis.stratifiedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 == s2, "same doc must get the same verdict on every run")
    // zh keeps everything (rate 1000): sampled zh count == corpus zh count
    val zhAll = graft.sources.Tables.documents(spark, dir)
      .filter(col("lang") === "zh").count()
    assert(s1.count(_._2 == "zh").toLong == zhAll)
    // en downsamples at 500/1000: strictly fewer than the corpus count
    val enAll = graft.sources.Tables.documents(spark, dir)
      .filter(col("lang") === "en").count()
    assert(s1.count(_._2 == "en").toLong < enAll)
  }

  test("repetition: dup fraction in [0,1) and bigram count = words - 1") {
    val joined = TextAnalysis.repetition(spark, dir).as("r")
      .join(TextAnalysis.tokenCount(spark, dir).as("t"), Seq("doc_id"))
      .select(col("n_bigrams"), col("n_words"), col("dup_bigram_frac"))
      .collect()
    assert(joined.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0))
    assert(joined.forall(r => r.getInt(0) == r.getInt(1) - 1))
  }

  test("repetition bigram keying (r21): xxhash64 keys ≡ built-string bigrams") {
    // the bigram key is distinct-internal; the hashed (at-scale) and
    // string keyings must produce byte-identical rows on the real corpus
    val docs = graft.sources.Tables.documents(spark, dir)
    val hashed = TextAnalysis.repetitionOf(docs).collect().map(_.toString).sorted
    val raw = TextAnalysis.repetitionOf(docs, rawKey = true).collect()
      .map(_.toString).sorted
    assert(hashed.nonEmpty && hashed.sameElements(raw),
      "repetition: hashed vs string bigram key diverged")
  }

  test("seqPack: per-language streams pack contiguously with in-budget offsets") {
    val rows = TextAnalysis.seqPack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, _, off) => off >= 0 && off < TextAnalysis.PackBudget })
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, n, seq, off) =>
        assert(seq == cum / TextAnalysis.PackBudget, s"$lang doc $id seq")
        assert(off == cum % TextAnalysis.PackBudget, s"$lang doc $id offset")
        cum += n
      }
    }
  }

  test("bigrams: top-50 adjacent pairs, deterministically ordered") {
    val rows = TextAnalysis.bigrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length <= 50 && rows.nonEmpty)
    assert(rows.forall(_._1.matches("[a-z]+ [a-z]+")))
    rows.sliding(2).foreach { case Array((b1, n1), (b2, n2)) =>
      assert(n1 > n2 || (n1 == n2 && b1 < b2), s"($b1,$n1) before ($b2,$n2)")
    case _ => }
  }

  test("distinctEstimate: KMV estimate brackets the exact count it approximates") {
    val rows = TextAnalysis.distinctEstimate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, exact, est) =>
      assert(exact > 0 && est > 0, s"$src: non-positive counts")
      // k=16 KMV has relative σ ≈ 1/√(k-2); 4σ ≈ ±~100%. Anything inside
      // [exact/4, exact*4] proves the estimator is wired to the right
      // order statistic (an off-by-one digit in the hash-prefix
      // arithmetic throws the estimate off by 16×+).
      assert(est >= exact / 4 && est <= exact * 4,
        s"$src: estimate $est implausible vs exact $exact")
    }
  }

  test("tfidfTop: one top term per tokenized doc, deterministic, score >= 0") {
    import graft.sources.Tables
    val nTokenized = Tables.documents(spark, dir)
      .filter(expr("size(regexp_extract_all(lower(text), '[a-z]+', 0)) > 0"))
      .count()
    val rows = TextAnalysis.tfidfTop(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.length == nTokenized, "exactly one row per doc with tokens")
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(_._3 >= 0.0), "tf*ln(N/df) is nonnegative (df <= N)")
    assert(rows.forall(_._2.nonEmpty))
  }

  test("qualityBuckets: tercile sizes differ by at most 1 within each language") {
    val sizes = TextAnalysis.qualityBuckets(spark, dir)
      .groupBy(col("lang"), col("bucket")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    sizes.keys.map(_._1).toSeq.distinct.foreach { lang =>
      val counts = Seq("head", "middle", "tail").map(b => sizes.getOrElse((lang, b), 0L))
      assert(counts.max - counts.min <= 1, s"$lang terciles $counts not balanced")
    }
  }
}
