package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The round-11 seeded/selection operators: personalized PageRank (g_ppr),
  * BM25 relevance (t_bm25), temperature source mixing (t_source_mix). The
  * oracle gate pins cross-engine equality; these pin the SEMANTICS the
  * oracle can't see — local/distributed parity, mass concentration, rank
  * ordering, budget behavior. */
class SeededOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-seededops-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  test("personalized PageRank: local twin ≡ distributed DataFrame loop") {
    Reset.clear(spark)
    val local = graft.operators.GraphOps.personalizedPagerank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val key = graft.graph.LocalExec.MaxBytesKey
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "0")
    val dist =
      try graft.operators.GraphOps.personalizedPagerank(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    assert(local.keySet == dist.keySet)
    local.foreach { case (n, r) =>
      assert(math.abs(r - dist(n)) < 1e-9, s"node $n: local $r vs dist ${dist(n)}")
    }
    Reset.clear(spark)
  }

  test("personalized PageRank: mass concentrates on the seed's region clique") {
    val ranks = graft.operators.GraphOps.personalizedPagerank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // the seed holds the single largest rank, and every rank is in [0, 1]
    val seed = graft.operators.GraphOps.PprSource
    assert(ranks(seed) == ranks.values.max, "seed must hold the max rank")
    assert(ranks.values.forall(r => r >= 0.0 && r <= 1.0))
    // nations outside the seed's region receive NO mass on this graph:
    // edges only connect same-region nations, so the walk never leaves
    // the seed's clique
    val nation = graft.sources.Tables.nation(spark, dir)
      .select("n_nationkey", "n_regionkey").collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1))).toMap
    val seedRegion = nation(seed)
    ranks.foreach { case (n, r) =>
      if (nation(n) != seedRegion) assert(r == 0.0, s"nation $n outside seed region has rank $r")
      else assert(r > 0.0, s"clique peer $n of the seed has zero rank")
    }
  }

  test("BM25: ranks are 1..5 per term, descending scores, terms are the top-3 frequent") {
    val rows = graft.functions.TextAnalysis.bm25Top(spark, dir).collect()
    val byTerm = rows.groupBy(_.getString(0))
    assert(byTerm.size == 3, s"expected 3 query terms, got ${byTerm.keySet}")
    byTerm.foreach { case (term, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length),
        s"ranks not contiguous for $term")
      assert(sorted.length <= 5)
      // scores non-increasing with rank
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"scores not descending for $term: ${scores.mkString(",")}")
    }
    // the chosen terms really are the 3 highest-total-frequency tokens
    import org.apache.spark.sql.functions._
    val top3 = graft.sources.Tables.documents(spark, dir)
      .select(explode(graft.functions.TextAnalysis.words).as("w"))
      .groupBy("w").count().orderBy(col("count").desc, col("w"))
      .limit(3).collect().map(_.getString(0)).toSet
    assert(byTerm.keySet == top3)
  }

  test("random walks: every step follows a real edge, draws are deterministic, sinks stop early") {
    Reset.clear(spark)
    val rows = graft.operators.GraphOps.randomWalks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val again = graft.operators.GraphOps.randomWalks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.sortBy(identity).sameElements(again.sortBy(identity)),
      "walks are not deterministic")
    val edges = graft.graph.PropertyGraph.fromNodeEdgeLists(spark,
        graft.operators.GraphOps.WikiVoteNodes, graft.operators.GraphOps.WikiVoteEdges)
      .edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byWalk = rows.groupBy(_._1)
    byWalk.foreach { case (start, steps) =>
      val path = steps.sortBy(_._2)
      assert(path.head == ((start, 0, start)), s"walk $start must begin at its seed")
      // steps are contiguous from 0 (a sink stops the walk, never gaps it)
      assert(path.map(_._2).toSeq == (0 until path.length),
        s"walk $start has non-contiguous steps")
      path.zip(path.tail).foreach { case ((_, _, u), (_, _, v)) =>
        assert(edges((u, v)), s"walk $start took non-edge $u -> $v")
      }
    }
    // at least one walk reaches full length on this graph
    assert(byWalk.values.exists(_.length == graft.operators.GraphOps.WalkSteps + 1))
  }

  test("source mixing: over-represented sources shrink toward the flattened share, small ones keep all") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, dir)
    val before = docs.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val kept = graft.functions.TextAnalysis.sourceMix(spark, dir)
    val after = kept.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(after.keySet.subsetOf(before.keySet))
    // total kept is near the budget (md5-permille draw is approximate:
    // generous ±15% band around the 50% target)
    val total = before.values.sum.toDouble
    val keptTotal = after.values.sum.toDouble
    assert(keptTotal > total * 0.35 && keptTotal < total * 0.65,
      s"kept $keptTotal of $total — budget way off")
    // flattening: the biggest source's kept FRACTION must not exceed any
    // smaller source's kept fraction by more than the permille noise
    val fracs = before.map { case (s, n) => (s, after.getOrElse(s, 0L).toDouble / n) }
    val (bigSrc, _) = before.maxBy(_._2)
    val (smallSrc, _) = before.minBy(_._2)
    assert(fracs(bigSrc) <= fracs(smallSrc) + 0.1,
      s"mixing did not flatten: big-source frac ${fracs(bigSrc)} vs small ${fracs(smallSrc)}")
  }
}
