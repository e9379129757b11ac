package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.{Relational, Similarity}

/** Physical-plan shape proofs for the scale claims the operators make
  * (SURVEY §5): pushdown reaches the parquet scan, small sides broadcast,
  * the IVF assignment is exchange-free. These are the properties that
  * decide whether a plan survives a 100 TB input, so they are pinned as
  * tests rather than left to .explain() spot checks.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-planshape-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Run `body` with auto-broadcast disabled, restoring the session's
    * PRIOR threshold afterwards (not a hard-coded default — the suite
    * must not silently rewrite a session-level setting). */
  private def withAutoBroadcastOff[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("scanFilter pushes predicate and projection into the parquet scan") {
    val p = plan(Relational.scanFilter(spark, dir))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), p)
    // pruned read schema: none of the 13 unreferenced lineitem columns
    assert(!p.contains("l_comment"), "projection must not read l_comment\n" + p)
  }

  test("q1 decimal sums run as codegen'd HashAggregate over graft_dsum") {
    // MicrosSum's whole point is a fixed-width primitive buffer that stays
    // in whole-stage HashAggregate; a buffer-layout regression would make
    // Spark silently fall back to Object/Sort aggregation and give the
    // per-row decimal cost right back
    val p = plan(Relational.pricingSummary(spark, dir))
    assert(p.contains("microssum") || p.contains("MicrosSum"),
      "q1 must aggregate through graft_dsum/MicrosSum\n" + p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("ObjectHashAggregate") && !p.contains("SortAggregate"),
      "MicrosSum must keep the fixed-width HashAggregate path\n" + p)
  }

  test("Q5/Q3: fixed dims broadcast by hint; SF-scaled sides are never force-broadcast") {
    // disable size-based auto-broadcast: at sf0.001 EVERY table fits the
    // 10MB threshold, which would hide the 100 TB shape. With it off, only
    // explicit broadcast() hints survive — so this pins exactly the claim:
    // the constant-size dims (region=5, nation=25 rows) broadcast by
    // declaration, while customer/supplier/orders (all grow with SF) carry
    // NO hint and must shuffle. A broadcast hint on an SF-scaled table
    // would be an OOM, not a slow plan, at the 100 TB design point.
    withAutoBroadcastOff {
      val p5 = plan(Relational.localSupplierVolume(spark, dir))
      assert(p5.contains("BroadcastHashJoin"), p5) // nation + region hints
      // the lineitem-orders, customer and supplier joins all shuffle
      val shuffleJoins5 =
        "ShuffledHashJoin".r.findAllIn(p5).size + "SortMergeJoin".r.findAllIn(p5).size
      assert(shuffleJoins5 >= 3,
        s"customer/supplier must shuffle without hints (saw $shuffleJoins5 shuffle joins)\n" + p5)
      val p3 = plan(Relational.shippingRevenue(spark, dir))
      assert(!p3.contains("BroadcastHashJoin"),
        "Q3 has no fixed-size dim; nothing may broadcast when size info is off\n" + p3)
    }
  }

  test("decontam joins the corpus against a broadcast eval shingle set") {
    val p = plan(TextAnalysis.decontam(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "eval set must broadcast, never sort-merge the corpus\n" + p)
  }

  test("IVF centroid assignment is exchange-free (scan + broadcast only)") {
    // the PRODUCTION assignment stage (ivfAnn checkpoints exactly this
    // plan): the centroid row aggregates through a broadcast; the corpus
    // side must see no shuffle Exchange at all
    val p = plan(Similarity.ivfAssignment(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      "corpus-side shuffle in IVF assignment\n" + p)
  }

  test("PQ encode is exchange-free and routes through the native graft_pq_encode") {
    // the index-build scan s_pq_ann checkpoints: codebook aggregated
    // into one broadcast row, corpus side scan+project only — and the
    // per-row M×K×SubDim argmin must be the single compiled call, not
    // an inline least() tree (the IVF argmax JIT-cliff lesson)
    val p = plan(Similarity.pqCodes(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      "corpus-side shuffle in PQ encode\n" + p)
    assert(p.contains("graft_pq_encode"), "native PQ encode missing from plan\n" + p)
  }

  test("containmentPairs: every join is an equi-join, no nested-loop fallback") {
    val p = plan(graft.operators.Dedup.containmentPairs(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "containment verify fell off the equi-join path\n" + p)
  }

  test("qualityBuckets has no corpus-wide window sort (boundary-based terciles)") {
    // an ntile window PARTITION BY lang would pipe ~half the corpus (the
    // 'en' key) through ONE sorting task; the boundary form's only
    // per-lang state is a 2-double aggregate that broadcasts back
    val p = plan(TextAnalysis.qualityBuckets(spark, dir))
    assert(!p.contains("Window"),
      "quality bucketing must not window-sort the corpus\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "tercile boundaries must join back via broadcast\n" + p)
    // r21: lang rides the scoring scan — the corpus⋈corpus doc_id
    // re-join (a SortMergeJoin whose only job was re-attaching one
    // column from the same table) must stay gone
    assert(!p.contains("SortMergeJoin"),
      "quality bucketing must not self-join the corpus for lang\n" + p)
  }

  test("stratifiedSample, hashSplit and piiScrub are single-scan, shuffle-free plans") {
    for (df <- Seq(TextAnalysis.stratifiedSample(spark, dir),
                   TextAnalysis.hashSplit(spark, dir),
                   TextAnalysis.piiScrub(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), "per-row operators must not shuffle\n" + p)
    }
  }

  test("pivot compiles to one conditional-aggregate pass: no Expand, no extra join") {
    val p = plan(Relational.pivotEvents(spark, dir))
    // explicit value list => Spark's two-phase pivot: a (cohort, type)
    // pre-aggregation (map-side combined — the shuffle carries one row
    // per group-pair, never per event) then the pivot aggregation on
    // cohort. No Expand (that's rollup/cube's shape), no join, no
    // distinct-scan pre-job; exactly the two group-key exchanges.
    assert(!p.contains("Expand"), "pivot must not expand rows\n" + p)
    assert(!p.contains("Join"), "pivot with explicit values needs no join\n" + p)
    assert("\\) Exchange".r.findAllIn(p).size <= 2, "two group-key shuffles at most\n" + p)
  }

  test("freqScore joins vocabulary and total by broadcast onto the checkpointed tokens") {
    val p = plan(graft.functions.TextAnalysis.freqScore(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    // corpus-side shuffles: only the final per-doc aggregation may
    // exchange (the (doc, word) aggregation is inside the checkpoint)
    assert(!p.contains("SortMergeJoin"),
      "vocabulary must reach the tokens by broadcast, never a corpus shuffle join\n" + p)
  }

  test("knnLabel scans the corpus once against a broadcast query set") {
    val p = plan(graft.operators.Similarity.knnLabel(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "the corpus must never shuffle for the query-set join\n" + p)
  }

  test("rangeWindow is one partition-keyed exchange feeding a Window — no join, no global sort") {
    val p = plan(Relational.rangeWindow(spark, dir))
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), "single-input window op must not join\n" + p)
    assert("\\) Exchange".r.findAllIn(p).size <= 1,
      "one hashpartitioning(user_id) shuffle at most\n" + p)
    assert(!p.contains("rangepartitioning"),
      "the window must hash-spread on user_id, never globally sort\n" + p)
  }

  test("spanTrim joins spans back by doc_id — no cartesian, no nested-loop fallback") {
    val p = plan(graft.operators.Dedup.spanTrim(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the spans must reach the corpus via an equi-join on doc_id\n" + p)
  }

  test("bloomSeenShingles probes in-plan via the broadcast filter, pre-shuffle") {
    withAutoBroadcastOff {
      val df = graft.operators.Dedup.bloomSeenShingles(spark, dir)
      val p = plan(df)
      // the probe is per-row expression work in the batch scan stage (the
      // filter arrives via torrent broadcast — NOT a join carrying filter
      // bytes into every row, and NOT a plan literal that rides every
      // stage's serialized task set at GB scale)
      assert(p.contains("graft_bloom_contains("), "probe must run in-plan")
      assert(p.contains("graft_broadcast_binary("),
        "filter must reach the probe as a broadcast handle\n" + p)
      // no large binary may be embedded in the plan itself: walk the
      // analyzed plan's expression trees (the executed plan hides under
      // AdaptiveSparkPlanExec) and bound every BinaryType literal
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.BinaryType
      var maxLit = 0
      df.queryExecution.analyzed.foreach(_.expressions.foreach(_.foreach {
        case Literal(v: Array[Byte], BinaryType) => maxLit = math.max(maxLit, v.length)
        case _ => ()
      }))
      assert(maxLit <= (1 << 20),
        s"plan embeds a ${maxLit}-byte binary literal; filters must broadcast")
      // the only shuffles are the verify join's two sides and the final
      // per-doc aggregation — the prefilter itself must add none
      val exchanges = "(?m)^\\s*\\(\\d+\\) Exchange".r.findAllIn(p).size
      assert(exchanges <= 4, s"bloom path grew extra shuffles ($exchanges)\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    }
  }

  test("saltedRevenue shuffles on (key, salt): the hot key spreads over reducers") {
    // with auto-broadcast off the join must shuffle, and the exchange key
    // must include the salt — that spread IS the operator's entire point
    withAutoBroadcastOff {
      val p = plan(Relational.saltedRevenue(spark, dir))
      assert(p.contains("__salt"),
        "join-side exchanges must partition on the salt column\n" + p)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "salting must stay an equi-join\n" + p)
      // build side = the SALTED left side: per (key, salt) slot it holds
      // 1/saltFactor of a key's fact rows while the replicated side holds
      // all of them — building the deliberately inflated table would hash
      // the larger side (see Skew.saltedJoin)
      assert(p.contains("ShuffledHashJoin") && p.contains("BuildLeft"),
        "salted side must be the shuffled-hash build side\n" + p)
    }
  }

  test("tfidfTop: rank-1 pushes down to WindowGroupLimit; df/N join by broadcast") {
    val p = plan(TextAnalysis.tfidfTop(spark, dir))
    assert(p.contains("WindowGroupLimit"),
      "per-doc argmax must prune via group-limit, not a full window sort\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "vocabulary-sized df table and 1-row N must broadcast\n" + p)
  }

  test("distinctEstimate is a single-scan two-stage aggregate (no join, no extra pass)") {
    val p = plan(TextAnalysis.distinctEstimate(spark, dir))
    // formatted explain lists every node twice (tree + detail section):
    // count the numbered detail entries only
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1,
      "exact count and sketch must come from ONE corpus scan\n" + p)
    assert(!p.contains("Join"), "no join belongs in this aggregate\n" + p)
  }

  test("dedupClusters CC rounds are sized to the survivor graph, not session width") {
    // the verified-pair graph is ~50 edges; before the numParts knob the CC
    // inherited spark.sql.shuffle.partitions and paid ~32 near-empty tasks
    // per pointer-jumping round (the suite's variance amplifier). Pin that
    // the final labels — and so each checkpointed round, which uses the
    // same chk() width — carry at most 8 partitions even when the session
    // runs at the production width.
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "32")
    try {
      val labels = graft.operators.Dedup.dedupClusters(spark, dir)
      assert(labels.rdd.getNumPartitions <= 8,
        s"survivor CC must run narrow; saw ${labels.rdd.getNumPartitions} partitions")
    } finally spark.conf.set(key, prev)
  }

  test("bm25: one checkpointed tf relation feeds scoring; query/df/stats broadcast; df side is 3 rows") {
    Reset.clear(spark)
    val p = plan(TextAnalysis.bm25Top(spark, dir))
    assert(p.contains("Scan ExistingRDD"),
      "tf relation must be checkpointed once and reused\n" + p)
    assert(!p.contains("CartesianProduct"),
      "no cartesian anywhere (the stats crossJoin is a broadcast 1-row)\n" + p)
    // the df lookup joins BROADCAST (and, per the review fix, the
    // broadcast side is the query-term-restricted 3-row table, never the
    // vocabulary-sized full df table — pinned by the join being a hash
    // join, not a nested loop over an array)
    assert(p.contains("BroadcastHashJoin"), "df/query joins must broadcast\n" + p)
  }

  test("heavyHitters phase 2 probes candidates via broadcast HASH join, never a nested loop") {
    Reset.clear(spark)
    val p = plan(TextAnalysis.heavyHitters(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      "candidate probe must be a broadcast hash join on the token\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "array_contains against the 1-row array would plan a nested loop\n" + p)
  }

  test("sourceMix: thresholds broadcast back; the corpus side never sort-merge-joins") {
    Reset.clear(spark)
    val p = plan(TextAnalysis.sourceMix(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      "per-source thresholds must broadcast onto the corpus\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "the corpus must not shuffle for the threshold join\n" + p)
  }

  test("outlierScore: the centroid is a broadcast constant; the scan side never shuffles for it") {
    Reset.clear(spark)
    val p = plan(Similarity.outlierScore(spark, dir))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "centroid must reach the corpus as a broadcast, not via shuffle\n" + p)
    assert(p.contains("graft_dot"),
      "pass 2's dots must run through the codegen graft_dot, not an " +
        "interpreted higher-order fold\n" + p)
    assert(!p.contains("zip_with") && !p.contains("aggregate(zip_with"),
      "no interpreted zip_with fold may remain in the scoring scan\n" + p)
  }

  test("randomWalks: checkpointed adjacency, no cartesian in the step joins") {
    Reset.clear(spark)
    val p = plan(graft.operators.GraphOps.randomWalks(spark, dir))
    assert(p.contains("Scan ExistingRDD"),
      "adjacency (and each frontier) must be checkpointed\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "step joins must stay equi-joins on the node key\n" + p)
    Reset.clear(spark)
  }

  test("commonNeighbors/adamicAdar witness joins stay equi-joins on checkpointed adjacency") {
    import graft.operators.GraphOps
    for (df <- Seq(GraphOps.commonNeighbors(spark, dir),
                   GraphOps.adamicAdar(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "witness self-join must hash on nbr, never go quadratic\n" + p)
      assert(p.contains("Scan ExistingRDD"),
        "adjacency must be checkpointed, not re-derived per consumer\n" + p)
    }
  }

  test("greedyModularity round update never exchanges the labeled edge state") {
    // the r16 plan audit's scale finding: the old round loop re-joined
    // the edge relation against the full membership map, re-shuffling
    // edges on `b` once the map outgrew broadcast. The reworked loop
    // applies the merge DIFF via broadcast joins — the edge side of a
    // round update must show two BroadcastHashJoins and ZERO shuffle
    // exchanges, even with auto-broadcast off (the hint is explicit).
    import org.apache.spark.sql.functions.{broadcast, col}
    import spark.implicits._
    val labE = Seq((1L, 2L, 10L, 20L), (2L, 3L, 20L, 30L))
      .toDF("a", "b", "ca", "cb").localCheckpoint()
    val rl = Seq((20L, 10L)).toDF("community", "newc")
    withAutoBroadcastOff {
      val p = plan(graft.graph.Algorithms.relabelEdges(labE, broadcast(rl)))
      // formatted explain prints each node in the tree AND its detail
      // section: two joins appear as 4 mentions
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
        "both label columns must relabel via broadcast joins\n" + p)
      assert(!p.contains("Exchange hashpartitioning"),
        "a round update must never re-exchange the labeled edge state\n" + p)
      assert(!p.contains("SortMergeJoin"), p)
    }
  }
}
