package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions
import graft.operators.Similarity

/** ANN sanity across the three search paths, and the extensions-based
  * registration of graft_dot. */
class SimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  // built WITH extensions: exercises the spark.sql.extensions path that
  // production sessions use (operators also self-register defensively)
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .appName("graft-similarity-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  test("graft_dot resolves via SparkSessionExtensions injection") {
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r === 11.0)
  }

  test("bucketed ANN (LSH, IVF) never beats brute force on top-1 similarity") {
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.filter("rank = 1").collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val exact = top1(Similarity.cosineTopK(spark, dir))
    val lsh = top1(Similarity.lshAnn(spark, dir))
    val ivf = top1(Similarity.ivfAnn(spark, dir))
    val mrl = top1(Similarity.mrlRerank(spark, dir))
    // bucketing/prescreening restricts candidates, so the best hit is at
    // most the exact best (ties allowed when the true NN survives the
    // bucket/cell/coarse-pool cut)
    lsh.foreach { case (q, s) => assert(s <= exact(q) + 1e-12, s"lsh query $q") }
    ivf.foreach { case (q, s) => assert(s <= exact(q) + 1e-12, s"ivf query $q") }
    mrl.foreach { case (q, s) => assert(s <= exact(q) + 1e-12, s"mrl query $q") }
    // NO recall floor on mrl: the synthetic embeddings are random, so the
    // 16-dim prefix carries no trained matryoshka structure and the pool
    // legitimately misses true NNs. The distribution-free contract is
    // pinned below instead: whatever neighbors the coarse stage picks,
    // the PUBLISHED sims are exact full-precision cosines.
  }

  test("mrlRerank publishes exact full-precision cosines for its picked pool") {
    val rows = Similarity.mrlRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(rows.nonEmpty)
    val ids = rows.flatMap(t => Seq(t._1, t._2)).distinct
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .filter(s"vec_id IN (${ids.mkString(",")})")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    // the operator's DECIMAL(18,10) -> 6 snap; valueOf (Double.toString
    // path) mirrors Spark's Decimal(double), NOT the exact-binary ctor
    def snap(d: Double): Double =
      java.math.BigDecimal.valueOf(d)
        .setScale(10, java.math.RoundingMode.HALF_UP)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    rows.foreach { case (q, n, sim) =>
      val (a, b) = (vecs(q), vecs(n))
      val want = snap(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
      assert(sim == want, s"pair ($q, $n): published $sim, exact $want")
    }
  }

  test("quantizedAnn: int8 scores bounded, and quantized ranking tracks the exact one") {
    val rows = Similarity.quantizedAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // |q[i]| <= 127 (+0.5 rounding) on unit vectors → dot bounded by ~64*128^2
    assert(rows.forall { case (_, _, _, d) => math.abs(d) <= 64L * 128 * 128 })
    // 4-bit-mantissa quantization of unit vectors preserves the gross
    // neighborhood: each query's quantized top-5 shares a majority (>=3 of
    // 5) with the exact top-5 — a bare nonempty intersection could pass a
    // badly broken quantizer by chance
    val exact = Similarity.cosineTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, g) => q -> g.map(_._2).toSet }
    rows.groupBy(_._1).foreach { case (q, g) =>
      val common = g.map(_._2).toSet.intersect(exact(q)).size
      assert(common >= 3, s"query $q: only $common of top-5 match exact")
    }
  }

  test("knnLabel vote is exactly the majority over cosineTopK's neighbor set") {
    import graft.operators.Similarity
    // recompute the vote independently from the gated top-k output +
    // the labels table; the operator must agree on every query
    val labels = graft.sources.Tables.embeddings(spark, dir)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val top = Similarity.cosineTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = top.groupBy(_._1).map { case (q, rows) =>
      val votes = rows.groupBy(r => labels(r._2))
        .map { case (lbl, rs) => (lbl, rs.size, rs.map(_._3).min) }
      // order: votes desc, best rank asc, label asc
      val win = votes.toSeq.sortBy { case (lbl, n, br) => (-n, br, lbl) }.head
      q -> ((win._1, win._2.toLong))
    }
    val got = Similarity.knnLabel(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(got.size == Similarity.NumQueries)
  }

  test("kmeansUpdate: counts partition the corpus and fixed-point means reconstruct the true means") {
    import graft.operators.Similarity
    val rows = Similarity.kmeansUpdate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val nVecs = graft.sources.Tables.embeddings(spark, dir).count()
    assert(rows.keys.map(_._1).toSet.size <= Similarity.IvfCentroids)
    // per-dim counts across clusters must each partition the corpus
    (0 until Similarity.Dim).foreach { d =>
      val total = rows.collect { case ((_, dim), (n, _)) if dim == d => n }.sum
      assert(total == nVecs, s"dim $d: counts sum to $total of $nVecs")
    }
    // reconstruction: sum_fp/(n*2^24) within one fixed-point ulp of the
    // true double mean over the assigned vectors
    val assigned = Similarity.ivfAssignment(spark, dir)
      .select(org.apache.spark.sql.functions.col("cid"),
        org.apache.spark.sql.functions.col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val byCid = assigned.groupBy(_._1)
    rows.foreach { case ((cid, dim), (n, sumFp)) =>
      val members = byCid(cid).map(_._2(dim).toDouble)
      assert(n == members.size)
      val trueMean = members.sum / members.size
      val fpMean = sumFp.toDouble / (n.toDouble * Similarity.KmeansFp)
      assert(math.abs(fpMean - trueMean) <= 1.0 / Similarity.KmeansFp,
        s"cid $cid dim $dim: $fpMean vs $trueMean")
    }
  }

  test("outlier score: bottom-K of the true full centrality ranking, centroid exact") {
    val got = Similarity.outlierScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == Similarity.OutlierK)
    // scores ascend with deterministic tie-break
    assert(got.zip(got.tail).forall { case ((i1, s1), (i2, s2)) =>
      s1 < s2 || (s1 == s2 && i1 < i2) })
    // independently compute every vector's cosine to the exact mean
    // centroid and check the published set IS the global bottom-K
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dim = vecs.head._2.length
    val cent = Array.tabulate(dim)(d => vecs.map(_._2(d).toDouble).sum / vecs.length)
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    val cn = math.sqrt(dot(cent, cent))
    val all = vecs.map { case (id, e) =>
      val ed = e.map(_.toDouble)
      (id, dot(ed, cent) / (math.sqrt(dot(ed, ed)) * cn))
    }.sortBy { case (id, s) => (s, id) }
    val expectIds = all.take(Similarity.OutlierK).map(_._1).toSet
    assert(got.map(_._1).toSet == expectIds,
      s"published outliers ${got.map(_._1).toSet} != true bottom-K $expectIds")
  }

  test("nprobe=2 probe is strictly-no-worse than nprobe=1 at every rank") {
    // the 2-cell candidate pool is a superset of the 1-cell pool (the
    // top-1 cell is always among the top-2), so at each rank position
    // the published similarity may only rise; and the result set may
    // only grow (thin cells that starved nprobe=1 gain candidates).
    def byRank(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), Double] =
      df.collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getDouble(3)).toMap
    val p1 = byRank(Similarity.ivfAnn(spark, dir))
    val p2 = byRank(Similarity.ivfAnn2(spark, dir))
    assert(p2.size >= p1.size, s"probe2 returned ${p2.size} < probe1's ${p1.size}")
    p1.foreach { case (key, s1) =>
      val s2 = p2.getOrElse(key, Double.NegativeInfinity)
      assert(s2 >= s1 - 1e-12, s"rank $key regressed: $s2 < $s1")
    }
    // ...and stays bounded by brute force, same as the other ANN paths
    val exact = byRank(Similarity.cosineTopK(spark, dir).filter("rank <= 3"))
    p2.foreach { case (key, s) =>
      assert(s <= exact(key) + 1e-12, s"probe2 beat brute force at $key")
    }
  }

  test("pqAnn equals an independent exact ADC recompute") {
    // re-derive the whole PQ pipeline in plain Scala from the raw floats
    // (codebook slices, per-vector encodes, fixed-point ADC tables,
    // final ranking) and demand the operator's published rows match
    // EXACTLY — codes, integer scores, ranks, tie-breaks, everything
    val embArr = graft.sources.Tables.embeddings(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val (m0, k0, sub) = (Similarity.PqM, Similarity.PqK, Similarity.PqSubDim)
    assert(embArr.size >= Similarity.NumQueries + k0, "corpus too small for the codebook")
    def dot(a: Array[Float], aOff: Int, b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < sub) { acc += a(aOff + i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val books: Map[Int, Array[Float]] = (for {
      k <- 0 until k0; m <- 0 until m0
    } yield (m * k0 + k) -> embArr(Similarity.NumQueries.toLong + k)
      .slice(m * sub, (m + 1) * sub)).toMap
    val bn = books.map { case (bid, be) => bid -> dot(be, 0, be) }
    def codesOf(v: Array[Float]): Array[Int] = (0 until m0).map { m =>
      var bestK = -1; var best = Double.PositiveInfinity
      for (k <- 0 until k0) {
        val bid = m * k0 + k
        val d = bn(bid) - 2.0 * dot(v, m * sub, books(bid))
        if (d < best || bestK < 0) { best = d; bestK = k }
      }
      bestK
    }.toArray
    val fp = (1 << 24).toDouble
    def term(q: Long, bid: Int): Long =
      math.floor((bn(bid) - 2.0 * dot(embArr(q), (bid / k0) * sub, books(bid))) * fp).toLong
    val expected = (for {
      q <- 0L until Similarity.NumQueries.toLong
      (vd, i) <- embArr.keys.filter(_ != q).map { v =>
        val cs = codesOf(embArr(v))
        (v, (0 until m0).map(m => term(q, m * k0 + cs(m))).sum)
      }.toSeq.sortBy { case (v, d) => (d, v) }.take(3).zipWithIndex
    } yield (q, vd._1, i + 1, vd._2)).toSet
    val got = Similarity.pqAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  test("ANN results never contain the query itself and ranks are contiguous") {
    Seq(Similarity.cosineTopK(spark, dir), Similarity.lshAnn(spark, dir),
        Similarity.ivfAnn(spark, dir), Similarity.quantizedAnn(spark, dir),
        Similarity.ivfAnn2(spark, dir), Similarity.mrlRerank(spark, dir),
        Similarity.pqAnn(spark, dir)).foreach { df =>
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(rows.forall { case (q, n, _) => q != n })
      rows.groupBy(_._1).foreach { case (_, g) =>
        assert(g.map(_._3).sorted.toSeq == (1 to g.length))
      }
    }
  }
}
