package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dedup fast-path equivalence and simhash-pair sanity. */
class DedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-dedup-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  test("spanDedup: planted verbatim runs → merged spans; within-doc repeats excluded") {
    import spark.implicits._
    val docs = Seq(
      // A carries two shared runs back-to-back: one from B, one from C.
      // The grams straddling the boundary exist only in A, so the two
      // spans are ADJACENT but not overlapping → must stay separate.
      (1L, "aa bb cc dd ee ff gg hh ii jj"),
      (2L, "aa bb cc dd ee"),
      (3L, "ff gg hh ii jj"),
      // D repeats a 5-gram only within itself → not a cross-doc span
      (4L, "pp qq rr ss tt uu pp qq rr ss tt"),
      // E and F are verbatim-identical 7-worders → overlapping grams
      // merge into ONE span covering the whole doc
      (5L, "ka kb kc kd ke kf kg"),
      (6L, "ka kb kc kd ke kf kg")
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedupOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L, 6L), s"docs with spans: ${got.keySet}")
    assert(got(1L) == ((10, 2L, 2L, 10L)), s"doc 1: ${got(1L)}") // 2 adjacent spans, full coverage
    assert(got(2L) == ((5, 1L, 1L, 5L)))
    assert(got(3L) == ((5, 1L, 1L, 5L)))
    assert(got(5L) == ((7, 3L, 1L, 7L))) // 3 overlapping grams → 1 merged span
    assert(got(6L) == ((7, 3L, 1L, 7L)))
  }

  test("spanDedup invariants on the real corpus") {
    val rows = Dedup.spanDedup(spark, dir).collect()
    assert(rows.nonEmpty, "sf0.001 corpus must contain cross-doc duplicated 5-gram spans")
    rows.foreach { r =>
      val (n, grams, spans, cov) = (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(spans >= 1 && grams >= spans, s"doc ${r.getLong(0)}: $spans spans of $grams grams")
      assert(cov >= spans * Dedup.SpanK, "each merged span covers >= K tokens")
      assert(cov <= n, s"doc ${r.getLong(0)}: coverage $cov exceeds n_tokens $n")
    }
  }

  test("span gram keying: xxhash64 default ≡ raw-string key on the real corpus (dedup AND trim)") {
    // the gram key is join-internal; the hashed (at-scale) and raw-string
    // keyings must produce byte-identical results
    def both[A](f: => Array[org.apache.spark.sql.Row]): (Seq[String], Seq[String]) = {
      spark.conf.set(Dedup.RawGramKeyKey, "false")
      val hashed = f.map(_.toString).toSeq.sorted
      spark.conf.set(Dedup.RawGramKeyKey, "true")
      val raw = f.map(_.toString).toSeq.sorted
      spark.conf.unset(Dedup.RawGramKeyKey)
      (hashed, raw)
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    val (dh, dr) = both(Dedup.spanDedupOf(docs).collect())
    assert(dh.nonEmpty && dh == dr, "spanDedup: hashed vs raw gram key diverged")
    val (th, tr) = both(Dedup.spanTrimOf(docs).collect())
    assert(th.nonEmpty && th == tr, "spanTrim: hashed vs raw gram key diverged")
  }

  test("sourceOverlap shingle keying (r21): xxhash64 word-gram keys ≡ raw-string shingles") {
    // the shingle key is distinct/join-internal; the hashed (at-scale)
    // and raw-string keyings must produce byte-identical overlap matrices
    val docs = graft.sources.Tables.documents(spark, dir)
    val hashed = Dedup.sourceOverlapOf(docs).collect().map(_.toString).sorted
    val raw = Dedup.sourceOverlapOf(docs, rawKey = true).collect()
      .map(_.toString).sorted
    assert(hashed.nonEmpty && hashed.sameElements(raw),
      "sourceOverlap: hashed vs raw shingle key diverged")
  }

  test("withSimhash word values (r21): native graft_md5h(words, 15) ≡ SQL hex-digit arithmetic") {
    import org.apache.spark.sql.functions._
    // the r21 native hash must reproduce the interpreted 15-digit
    // instr/substr formulation (the DuckDB oracle's shape) bit-for-bit,
    // on the real corpus — both the per-word values and the fingerprint
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    graft.functions.GraftFunctions.register(spark)
    val native = Dedup.withSimhash(docs).select(col("doc_id"), col("simhash"))
      .collect().map(_.toString).sorted
    val sql = Dedup.wordValSqlFor(docs)
      .selectExpr("doc_id", s"graft_simhash(vals, ${Dedup.SimhashBits}) AS simhash")
      .collect().map(_.toString).sorted
    assert(native.nonEmpty && native.sameElements(sql),
      "withSimhash: native md5h word values diverged from the SQL formulation")
  }

  test("spanTrim: removed-token count equals spanDedup's coverage; untouched docs hash their full stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, dir)
    val cov = Dedup.spanDedupOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap // doc -> dup_tokens
    val full = docs.select(col("doc_id"),
        md5(concat_ws(" ", expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val trim = Dedup.spanTrimOf(docs).collect()
    assert(trim.length == docs.count())
    trim.foreach { r =>
      val (id, n, kept, h) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(n - kept == cov.getOrElse(id, 0L),
        s"doc $id: trimmed ${n - kept} tokens vs spanDedup coverage ${cov.getOrElse(id, 0L)}")
      if (!cov.contains(id)) assert(h == full(id), s"untouched doc $id must hash its full stream")
      else assert(h != full(id), s"trimmed doc $id must not hash its full stream")
    }
  }

  test("sourceOverlap: planted shingle sets → exact intersection and fixed-point jaccard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "wa wb wc wd", "srcA"), // shingles: {wa wb wc, wb wc wd}
      (2L, "wa wb wc", "srcB"),    // shingles: {wa wb wc}
      (3L, "xa xb xc", "srcC")     // disjoint from both
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlapOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // zero-overlap pairs are absent by contract (inner join on the shingle)
    assert(got.keySet == Set(("srcA", "srcB")), s"pairs: ${got.keySet}")
    assert(got(("srcA", "srcB")) == ((2L, 1L, 1L, 500000L))) // |A∩B|=1, J=1/2
  }

  test("containmentPairs: planted quote-inside-document found at containment 1.0, jaccard far below banding range") {
    import spark.implicits._
    // doc 1 is quoted VERBATIM inside doc 2 (plus a long unique tail):
    // containment of 1-in-2 is 1.0, Jaccard is tiny — the case the
    // MinHash banding never pairs. doc 3 shares only boilerplate-free
    // noise; doc 4 duplicates a high-df phrase everywhere to prove the
    // df cap keeps boilerplate out of the index.
    val boiler = "click here to subscribe now"
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    // letter-only (the shingle tokenizer is [a-z]+ — digits would make
    // every tail word collapse to the same token)
    val tailWords = (0 until 60)
      .map(i => s"tail${('a' + i % 26).toChar}${('a' + i / 26).toChar}").mkString(" ")
    val docs = Seq(
      (1L, quote),
      (2L, s"$quote $tailWords"),
      (3L, "completely different words in every position here today"),
      (4L, s"$boiler $boiler $boiler extra")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val p12 = got.find(t => t._1 == 1L && t._2 == 2L)
    assert(p12.isDefined, s"planted quote pair not found in ${got.mkString(", ")}")
    val (_, _, nA, _, nInter, cont) = p12.get
    assert(nInter === nA, "every shingle of the quoted doc must intersect")
    assert(cont === 1000000L, "containment of the quote must be exactly 1.0")
    // the semantic point, deterministically: the pair's JACCARD is far
    // below any near-dup banding threshold (quote shingles / union with
    // the 60-word tail) even though containment is exactly 1.0 — the
    // asymmetric score is what surfaces quote-inside-document pairs
    // (LSH banding catching such a pair is a low-probability fluke of
    // the hash family, not a guarantee — which is why D14 exists)
    val (_, _, na, nb, ni, _) = p12.get
    assert(ni * 5 <= (na + nb - ni),
      s"planted pair's jaccard must stay below 0.2 (n_a=$na n_b=$nb n_inter=$ni)")
    assert(!got.exists(t => t._1 == 3L || t._2 == 3L), "noise doc must not pair")
  }

  test("containmentPairs recall contract: pure-boilerplate containment missed at rarestK=0, exact at rarestK=2") {
    import spark.implicits._
    // the adversarial case the df cap is blind to: doc 1 is NOTHING BUT
    // a boilerplate phrase carried by 10 other documents, so every one
    // of its shingles has df = 11 > ContainDfCap — the capped index
    // holds no posting for it and the default operator misses every
    // (1, carrier) pair even though containment is exactly 1.0. That
    // miss IS the rarestK=0 contract (pinned below, not hidden in a
    // docstring); rarestK=2 probes doc 1's two rarest shingles against
    // the full inverted list and must recover all 10 pairs at 1.0.
    val boiler = "click here to subscribe to our newsletter right now today"
    def tail(c: Char) = (0 until 20)
      .map(i => s"u$c${('a' + i % 26).toChar}${('a' + i / 26).toChar}").mkString(" ")
    val docs = (Seq((1L, boiler)) ++
      (2L to 11L).map(k => (k, s"$boiler ${tail(('a' + k).toChar)}")))
      .toDF("doc_id", "text")
    val base = Dedup.containmentPairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!base.exists(p => p._1 == 1L || p._2 == 1L),
      s"rarestK=0 contract: the pure-boilerplate doc must be absent, got $base")
    val fb = Dedup.containmentPairsOf(docs, rarestK = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap
    val wanted = (2L to 11L).map(k => (1L, k)).toSet
    assert(fb.keySet.filter(p => p._1 == 1L) === wanted,
      s"rarestK=2 must recover all 10 planted pairs, got ${fb.keySet}")
    wanted.foreach { p =>
      val (nA, _, nInter, cont) = fb(p)
      assert(nInter === nA && cont === 1000000L,
        s"pair $p: full containment must verify exactly (n_a=$nA n_inter=$nInter)")
    }
    // carrier-carrier overlap is boilerplate-only (8 of ~28 shingles,
    // under the 50% threshold): the fallback must not spray them through
    assert(!fb.keySet.exists(p => p._1 > 1L),
      s"sub-threshold carrier pairs must stay filtered, got ${fb.keySet}")
  }

  test("sourceOverlap invariants on the real corpus") {
    val rows = Dedup.sourceOverlap(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (na, nb, common, j) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a < b, s"pair ($a, $b) must be ordered")
      assert(common >= 1 && common <= math.min(na, nb))
      assert(j >= 0 && j <= 1000000)
    }
  }

  test("exactDedupFast groups identically to the md5 oracle path") {
    def groups(df: org.apache.spark.sql.DataFrame) =
      df.select("canonical_id", "n_docs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(groups(Dedup.exactDedup(spark, dir)) == groups(Dedup.exactDedupFast(spark, dir)))
  }

  test("graft_minhash signature equals the per-permutation SQL formulation") {
    // One compiled pass with all k minima live vs k interpreted
    // array_min(transform(...)) walks — the values must be bit-identical
    // (the DuckDB oracle spells out the same per-j arithmetic). Checked
    // at k=8 (the gated profile) over the full sf0.001 corpus.
    graft.functions.GraftFunctions.register(spark)
    val sh = Dedup.shingleSetsOf(
      graft.sources.Tables.documents(spark, dir))
    val k = 8
    val perJ = (0 until k).map(j => Dedup.sparkMinhash(j)).mkString("array(", ", ", ")")
    val rows = sh.selectExpr("doc_id", "graft_md5h(shingles) AS hvs")
      .selectExpr("doc_id", s"graft_minhash(hvs, $k) AS native", s"$perJ AS sql")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Long](1)} != sql ${r.getSeq[Long](2)}")
    }
  }

  test("minhashPairs emits each candidate pair exactly once, ordered a<b") {
    val rows = Dedup.minhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (a, b) => a < b })
    assert(rows.distinct.length == rows.length,
      "first-agreeing-band emission must make pairs unique without DISTINCT")
  }

  test("jaccardPairs scores exactly the minhash candidate set, within [0,1]") {
    val cand = Dedup.minhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val scored = Dedup.jaccardPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(scored.map(_._1).toSet == cand)
    assert(scored.forall { case (_, j) => j >= 0.0 && j <= 1.0 })
  }

  test("editPairs: length-pruned subset of candidates; zero distance iff jaccard 1.0") {
    val cand = Dedup.minhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edits = Dedup.editPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(edits.keySet.subsetOf(cand),
      "edit distances must only be computed on LSH candidates")
    // banded DP contract: exact distance in [0, EditMaxLenDiff], or the
    // -1 sentinel when the distance provably exceeds the threshold
    assert(edits.values.forall(d => d == -1 || (d >= 0 && d <= Dedup.EditMaxLenDiff)))
    // planted near-dups differ by a handful of word mutations — some
    // candidate must sit within a few edits
    assert(edits.values.filter(_ >= 0).min <= 10,
      "planted near-dups must surface with small distances")
    // zero edit distance = identical normalized content ⇒ identical
    // shingle sets ⇒ jaccard exactly 1.0 (the converse need not hold)
    val jac = Dedup.jaccardPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(edits.filter(_._2 == 0).keys.forall(p => jac(p) == 1.0))
  }

  test("dedupClusters: every member maps to the min doc_id of its pair-connected cluster") {
    val edges = Dedup.jaccardPairs(spark, dir)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= Dedup.ClusterJaccard)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // reference union-find over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(x => x -> find(x)).toMap
    assert(clusters == expected)
  }

  test("incrementalDedup: cross-source matches are exactly the minhash pairs spanning the batch boundary") {
    import org.apache.spark.sql.functions.col
    val srcOf = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // brute reference: the full-corpus LSH pairs, restricted to (new, index)
    val expected = Dedup.minhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        (srcOf(a) == Dedup.IncrNewSource, srcOf(b) == Dedup.IncrNewSource) match {
          case (true, false) => Some((a, b))
          case (false, true) => Some((b, a))
          case _ => None
        }
      }.groupBy(_._1)
    val got = Dedup.incrementalDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, ps) =>
      assert(got(id) == ((ps.length.toLong, ps.map(_._2).min)), s"doc $id")
    }
  }

  test("simhashPairs only emits pairs within the hamming bound, deduplicated") {
    val rows = Dedup.simhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.forall { case (a, b, h) => a < b && h <= Dedup.HammingMax })
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
  }
}
