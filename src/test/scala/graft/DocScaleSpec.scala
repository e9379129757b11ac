package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

/** DocScale contract: the generator's four plant families are really
  * there (byte-exact copy, +1-word near dup, 20-token prefix, 12-token
  * splice), and every closed-form plant-recovery check the 2M-doc soak
  * applies passes end-to-end through the REAL gated operators at a tiny
  * N — so a generator or check bug fails here in seconds, not 10 minutes
  * into the committed soak. */
class DocScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-docscale-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val N = 2000L
  private lazy val dir: String = {
    val d = s"/tmp/${Reset.ScratchPrefix}docscale_spec"
    DocScale.synthesize(spark, N, d)
    d
  }

  test("generator: schema and the four plant families") {
    val docs = Tables.documents(spark, dir)
    assert(docs.columns.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(docs.count() == N)
    val byId = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // EXACT: 99 ≡ 98; NEAR: 97 = 96 + " extra"
    assert(byId(199L) == byId(198L))
    assert(byId(197L) == byId(196L) + " extra")
    // CONTAINMENT: 93 = first 20 tokens of 92
    assert(byId(193L) == byId(192L).split(' ').take(20).mkString(" "))
    assert(byId(193L).split(' ').length == 20)
    // SPAN: 95's tokens 10..21 = 94's tokens 5..16 (1-based), same length,
    // and NOTHING else coincides positionally
    val w94 = byId(194L).split(' ')
    val w95 = byId(195L).split(' ')
    assert(w95.length == w94.length)
    assert(w95.slice(9, 21).toSeq == w94.slice(4, 16).toSeq)
    assert(w95.zip(w94).zipWithIndex.forall { case ((a, b), i) =>
      if (i >= 9 && i < 21) true else a != b
    })
    // word lengths: every token is prefix + 3 letters (tokenizer-visible)
    assert(w94.forall(w => w.length == 4 && w.forall(_.isLetter)))
    // the splice doc's FILLER words come from the disjoint 'v'
    // sub-vocabulary (so no splice-boundary gram can ever coincide);
    // the splice window itself carries 94's 'w' words
    assert(w95.zipWithIndex.forall { case (w, i) =>
      w.head == (if (i >= 9 && i < 21) 'w' else 'v')
    })
  }

  test("soak checks pass end-to-end through the gated operators") {
    // the exact (op → closed-form check) pairs the 2M-doc soak runs
    assert(DocScale.checkMinhash(spark, N,
      Dedup.minhashPairs(spark, dir), exactBar = false) >= 2 * N / 100)
    assert(DocScale.checkMinhash(spark, N,
      Dedup.minhashPairsOf(Tables.documents(spark, dir)), exactBar = true) >= 2 * N / 100)
    assert(DocScale.checkSimhash(spark, N,
      Dedup.simhashPairs(spark, dir)) >= N / 100)
    // span output is EXACTLY the 8 planted docs per block
    assert(DocScale.checkSpanDedup(spark, N,
      Dedup.spanDedup(spark, dir)) == 8 * N / 100)
    assert(DocScale.checkContainment(spark, N,
      Dedup.containmentPairs(spark, dir)) >= 3 * N / 100)
    assert(DocScale.checkClusters(spark, N,
      Dedup.dedupClusters(spark, dir)) == 4 * N / 100)
  }

  test("checks fail loud on a corrupted result") {
    import org.apache.spark.sql.functions.{col, lit}
    val span = Dedup.spanDedup(spark, dir)
    // drop one planted doc → the closed-form join must throw
    intercept[IllegalStateException] {
      DocScale.checkSpanDedup(spark, N, span.filter(col("doc_id") =!= 194L))
    }
    // corrupt a hamming value → the simhash check must throw
    val sim = Dedup.simhashPairs(spark, dir)
    intercept[IllegalStateException] {
      DocScale.checkSimhash(spark, N, sim.withColumn("hamming", lit(1L)))
    }
  }
}
