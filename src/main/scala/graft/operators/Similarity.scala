package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Similarity search over the embeddings table (SURVEY §2 D5-D7, E1-E4:
  * brute-force / LSH / IVF / quantized ANN, embedding near-dup, kNN
  * label transfer, and the k-means centroid-update training step).
  *
  * D5 (brute-force cosine top-k): the query set is broadcast against the
  * corpus — the corpus is scanned once and never shuffled; per-query top-k
  * is a row_number window on the (small) query_id key.
  *
  * D6 (LSH-bucketed ANN — the 100 TB path): corpus and queries are hashed
  * once into 2^8 hyperplane-sign buckets; candidate generation is a join on
  * the bucket key, so cost scales with bucket occupancy, not corpus size.
  * Hyperplanes are deterministic constants derived from md5 (computed at
  * plan-build time, embedded as integer literals in both engines' plans).
  *
  * Cross-engine determinism: every dot product is a left fold over the
  * vector in index order with all terms cast to double — graft's native
  * `graft_dot` expression (functions.ArrayDotProduct, a codegen'd
  * primitive loop) and DuckDB `list_reduce` produce bit-identical
  * doubles, so rankings and bucket signs agree exactly.
  */
object Similarity {

  val NumQueries = 8 // vec_id < 8 are the query vectors
  val TopK = 5
  val Planes = 8
  val Dim = 64

  /** Sequential double dot product — graft's native codegen expression
    * (functions.ArrayDotProduct): a primitive loop inside whole-stage
    * codegen, same left-fold order as the DuckDB oracle below. */
  private def sparkDot(a: String, b: String) = s"graft_dot($a, $b)"

  /** Same fold in DuckDB (list_reduce folds left; 0+v1 == v1 exactly). */
  private def duckDot(a: String, b: String) =
    s"""list_reduce(list_transform(range($Dim),
       |  i -> CAST($a[i + 1] AS DOUBLE) * CAST($b[i + 1] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  // --- D5: brute-force cosine top-k ----------------------------------------

  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding",
        s"${sparkDot("embedding", "embedding")} AS nrm")
    val q = emb.selectExpr("vec_id AS query_id", "embedding AS qe", "nrm AS qn")
      .filter(col("query_id") < NumQueries)
    val pairs = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id",
        s"(${sparkDot("qe", "embedding")}) / (sqrt(qn) * sqrt(nrm)) AS sim")
    pairs
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC)"))
      .filter(col("rank") <= TopK)
      .selectExpr("query_id", "neighbor_id", "rank",
        "CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim")
  }

  val cosineTopKOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding AS e,
       |    ${duckDot("embedding", "embedding")} AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM emb WHERE vec_id < $NumQueries),
       |pairs AS (SELECT query_id, emb.vec_id AS neighbor_id,
       |    (${duckDot("qe", "e")}) / (sqrt(qn) * sqrt(nrm)) AS sim
       |  FROM emb JOIN q ON emb.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM pairs)
       |SELECT query_id, neighbor_id, rank,
       |  CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim
       |FROM r WHERE rank <= $TopK""".stripMargin

  // --- E3: kNN label vote ----------------------------------------------------

  /** E3: kNN classification — each query vector takes the majority label
    * vote of its [[TopK]] cosine neighbors (the label-transfer /
    * auto-curation pass over an embedded corpus: spam/quality/domain
    * labels propagated from a labeled seed set). Same broadcast-query
    * scan shape as D5 — the corpus is scanned once, never shuffled; the
    * vote is a per-query aggregation over K rows. Fully deterministic:
    * neighbor ranking ties break on vec_id, vote ties break on best
    * (lowest) neighbor rank, then on the label itself. */
  def knnLabel(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "label", "embedding",
        s"${sparkDot("embedding", "embedding")} AS nrm")
    val q = emb.selectExpr("vec_id AS query_id", "embedding AS qe", "nrm AS qn")
      .filter(col("query_id") < NumQueries)
    val top = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id", "label",
        s"(${sparkDot("qe", "embedding")}) / (sqrt(qn) * sqrt(nrm)) AS sim")
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC)"))
      .filter(col("rank") <= TopK)
    top.groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("n_votes"), min(col("rank")).as("best_rank"))
      .withColumn("vr", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, best_rank ASC, label ASC)"))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("n_votes"))
  }

  val knnLabelOracle: String =
    s"""WITH emb AS (SELECT vec_id, label, embedding AS e,
       |    ${duckDot("embedding", "embedding")} AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM emb WHERE vec_id < $NumQueries),
       |r AS (SELECT query_id, emb.vec_id AS neighbor_id, label,
       |    row_number() OVER (PARTITION BY query_id ORDER BY
       |      (${duckDot("qe", "e")}) / (sqrt(qn) * sqrt(nrm)) DESC, emb.vec_id ASC) AS rank
       |  FROM emb JOIN q ON emb.vec_id <> q.query_id),
       |votes AS (SELECT query_id, label, count(*) AS n_votes, min(rank) AS best_rank
       |  FROM r WHERE rank <= $TopK GROUP BY 1, 2),
       |w AS (SELECT query_id, label, n_votes,
       |    row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, best_rank ASC, label ASC) AS vr
       |  FROM votes)
       |SELECT query_id, label AS pred_label, CAST(n_votes AS BIGINT) AS n_votes
       |FROM w WHERE vr = 1""".stripMargin

  // --- D6: LSH-bucketed ANN -------------------------------------------------

  /** Deterministic hyperplane components: h[j][i] derived from
    * md5("p<j>|<i>") — first 4 hex digits as an int in [0, 65535],
    * embedded as integer literals (exact in both engines). The plane
    * count is the LSH family's scale knob: bucket occupancy is N/2^planes,
    * so a deployment sizes `planes ≈ log2(N)` to keep the within-bucket
    * pair join bounded (the gated queries pin [[Planes]] = 8 for the
    * bench corpus; [[graft.EmbedScale]] drives the same code at
    * log2(N) planes). */
  def planeIntsFor(planes: Int): Seq[Seq[Int]] = {
    // bucketExpr packs the sign bits with INT `1 << j`, which wraps at
    // j = 31 (1 << 32 == 1): more planes would silently collide distinct
    // sign patterns onto reused bits. 31 planes ≈ a 2-billion-vector
    // corpus at O(1) occupancy; past that, widen the pack to BIGINT.
    require(planes <= 31, s"plane count $planes exceeds the 31-bit bucket pack")
    val md = MessageDigest.getInstance("MD5")
    (0 until planes).map { j =>
      (0 until Dim).map { i =>
        val hex = md.digest(s"p$j|$i".getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        Integer.parseInt(hex, 16)
      }
    }
  }

  lazy val planeInts: Seq[Seq[Int]] = planeIntsFor(Planes)

  /** Bucket id expression: sign bit of each hyperplane dot, packed. */
  private def bucketExpr(embCol: String, arrayLit: Seq[Int] => String,
                         dot: (String, String) => String,
                         planes: Seq[Seq[Int]] = planeInts): String = {
    val bits = planes.zipWithIndex.map { case (h, j) =>
      val d = dot(arrayLit(h), embCol)
      s"(CASE WHEN ($d) >= 0 THEN ${1 << j} ELSE 0 END)"
    }
    bits.mkString(" + ")
  }

  /** Spark side: the (x/32768 - 1) plane components are exact doubles
    * (power-of-two divisor), so they are embedded as double literals and
    * the dot runs through the same native graft_dot loop. */
  private def sparkPlaneDot(lit: String, e: String) = s"graft_dot($lit, $e)"

  private def duckPlaneDot(lit: String, e: String) =
    s"""list_reduce(list_transform(range($Dim),
       |  i -> (CAST($lit[i + 1] AS DOUBLE) / 32768.0 - 1.0) * CAST($e[i + 1] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  private def sparkArray(xs: Seq[Int]) =
    xs.map(x => s"${x / 32768.0 - 1.0}D").mkString("array(", ", ", ")")
  private def duckArray(xs: Seq[Int]) = xs.mkString("[", ", ", "]")

  def lshAnn(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val bucket = bucketExpr("embedding", sparkArray, sparkPlaneDot)
    val emb = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding",
        s"${sparkDot("embedding", "embedding")} AS nrm", s"($bucket) AS bucket")
    val q = emb.selectExpr("vec_id AS query_id", "embedding AS qe",
        "nrm AS qn", "bucket AS qbucket")
      .filter(col("query_id") < NumQueries)
    emb.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id",
        s"(${sparkDot("qe", "embedding")}) / (sqrt(qn) * sqrt(nrm)) AS sim")
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC)"))
      .filter(col("rank") <= 3)
      .selectExpr("query_id", "neighbor_id", "rank",
        "CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim")
  }

  val lshAnnOracle: String = {
    val bucket = bucketExpr("e", duckArray, duckPlaneDot)
    s"""WITH emb AS (SELECT vec_id, embedding AS e,
       |    ${duckDot("embedding", "embedding")} AS nrm
       |  FROM embeddings),
       |bk AS (SELECT vec_id, e, nrm, ($bucket) AS bucket FROM emb),
       |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, bucket AS qbucket
       |  FROM bk WHERE vec_id < $NumQueries),
       |pairs AS (SELECT query_id, bk.vec_id AS neighbor_id,
       |    (${duckDot("qe", "e")}) / (sqrt(qn) * sqrt(nrm)) AS sim
       |  FROM bk JOIN q ON bk.bucket = q.qbucket AND bk.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM pairs)
       |SELECT query_id, neighbor_id, rank,
       |  CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim
       |FROM r WHERE rank <= 3""".stripMargin
  }

  // --- D5b: embedding-cosine near-dup pairs ---------------------------------

  val NearDupCos = 0.3

  /** Embedding near-duplicate pairs: vectors sharing an LSH bucket with
    * cosine ≥ threshold. The all-pairs comparison is confined to bucket
    * collisions — the dedup-by-embedding path for a 100 TB corpus. (This
    * synthetic corpus is near-orthogonal, so matches are sparse — the
    * operator's value is the plan shape, verified against the oracle.) */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    embedNearDup(spark, dir, Planes)

  /** Plane-parameterized variant — `planes ≈ log2(corpus)` keeps bucket
    * occupancy (and so the pair join) O(1) per vector at any corpus
    * size; the 8-plane gated query is this with the bench corpus's
    * knob. */
  def embedNearDup(spark: SparkSession, dir: String, planes: Int): DataFrame = {
    GraftFunctions.register(spark)
    val bucket = bucketExpr("embedding", sparkArray, sparkPlaneDot, planeIntsFor(planes))
    val emb = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding",
        s"${sparkDot("embedding", "embedding")} AS nrm", s"($bucket) AS bucket")
      .localCheckpoint()
    emb.as("x").join(emb.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .selectExpr("x.vec_id AS a", "y.vec_id AS b",
        s"(${sparkDot("x.embedding", "y.embedding")}) / (sqrt(x.nrm) * sqrt(y.nrm)) AS sim")
      .filter(col("sim") >= NearDupCos)
      .selectExpr("a", "b",
        "CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim")
  }

  val embedNearDupOracle: String = {
    val bucket = bucketExpr("e", duckArray, duckPlaneDot)
    s"""WITH emb AS (SELECT vec_id, embedding AS e,
       |    ${duckDot("embedding", "embedding")} AS nrm
       |  FROM embeddings),
       |bk AS MATERIALIZED (SELECT vec_id, e, nrm, ($bucket) AS bucket FROM emb)
       |SELECT x.vec_id AS a, y.vec_id AS b,
       |  CAST(round(CAST((${duckDot("x.e", "y.e")}) / (sqrt(x.nrm) * sqrt(y.nrm)) AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim
       |FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |WHERE (${duckDot("x.e", "y.e")}) / (sqrt(x.nrm) * sqrt(y.nrm)) >= $NearDupCos""".stripMargin
  }

  // --- D15: SemDeDup-style semantic near-dup -----------------------------------

  /** D15: semantic near-duplicate pairs, SemDeDup-style (Abbas et al.
    * 2023): cluster the corpus with the k-means substrate (E2's
    * exchange-free broadcast-argmax assignment — the trained-centroid
    * stand-in E4 updates), then compare pairs ONLY within a cluster and
    * keep cosine ≥ threshold. The semantic tier of the dedup stack:
    * D2/D4 catch lexical overlap, D14 catches containment, this catches
    * "same content, different words" — paraphrases, translations,
    * templated rewrites — which share no shingles but co-locate in
    * embedding space.
    *
    * Scale shape: candidates are bounded by the CLUSTER, never
    * all-pairs — the D5b LSH-bucket shape with learned buckets, and the
    * production knob is K ∝ corpus/target-cell-size so per-cell pair
    * work stays O(N·cell). Assignment itself never shuffles (broadcast
    * centroid row, one scan); the pair join clusters on cid. Output:
    * (cid, a, b, sim) under the fixed-point rounding protocol —
    * downstream canonicalization is D8's CC over these pairs. */
  def semanticNearDup(spark: SparkSession, dir: String): DataFrame =
    semanticNearDup(spark, dir, IvfCentroids)

  /** K-parameterized form — the production knob: K ∝ corpus size keeps
    * cell occupancy (and so the within-cell pair join) bounded at any N;
    * [[graft.EmbedScale]] measures this at a corpus-sized K. */
  def semanticNearDup(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val assigned = ivfAssignment(spark, dir, k).localCheckpoint()
    assigned.as("x").join(assigned.as("y"),
        col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
      .selectExpr("x.cid AS cid", "x.vec_id AS a", "y.vec_id AS b",
        s"(${sparkDot("x.embedding", "y.embedding")}) / (sqrt(x.nrm) * sqrt(y.nrm)) AS sim")
      .filter(col("sim") >= NearDupCos)
      .selectExpr("cid", "a", "b",
        "CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim")
  }

  // lazy: this section sits ABOVE IvfCentroids' declaration, and a plain
  // val here would interpolate the not-yet-initialized 0 (the oracles map
  // at the bottom of the object forces it after everything is set)
  lazy val semanticNearDupOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding AS e,
       |    ${duckDot("embedding", "embedding")} AS nrm
       |  FROM embeddings),
       |cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM emb
       |  WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCentroids}),
       |scored AS (SELECT emb.vec_id, emb.e, emb.nrm, cid,
       |    (${duckDot("e", "ce")}) / (sqrt(nrm) * sqrt(cn)) AS cs
       |  FROM emb CROSS JOIN cent),
       |assigned AS MATERIALIZED (SELECT vec_id, e, nrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rk
       |    FROM scored) WHERE rk = 1)
       |SELECT x.cid AS cid, x.vec_id AS a, y.vec_id AS b,
       |  CAST(round(CAST((${duckDot("x.e", "y.e")}) / (sqrt(x.nrm) * sqrt(y.nrm)) AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim
       |FROM assigned x JOIN assigned y ON x.cid = y.cid AND x.vec_id < y.vec_id
       |WHERE (${duckDot("x.e", "y.e")}) / (sqrt(x.nrm) * sqrt(y.nrm)) >= $NearDupCos""".stripMargin

  // --- D7: IVF-bucketed ANN -------------------------------------------------

  val IvfCentroids = 16 // vec_id in [NumQueries, NumQueries + IvfCentroids)

  /** IVF (inverted-file) ANN — the coarse-quantizer alternative to LSH
    * buckets: every vector is assigned to its nearest (max-cosine) centroid
    * cell, queries probe their own cell (nprobe = 1).
    *
    * Scale shape: centroid assignment is one corpus scan with zero
    * exchange — the K centroids are pivoted into a single broadcast row
    * (sorted array) and the per-row argmax is `greatest()` over K
    * (score, -cid) structs, each score a native codegen'd graft_dot; no
    * K-row expansion, no window shuffle, nothing moves but the scan.
    * The probe is then a broadcast join on the cell id. Centroids here
    * are a deterministic sample of the corpus itself (vec_id in [8, 24))
    * — a stand-in for k-means training, which a real deployment would
    * run offline.
    *
    * Determinism: cosine scores are bit-identical cross-engine (graft_dot
    * fold order), argmax ties break on centroid id (struct comparison:
    * score desc, then -cid max = cid min). */
  /** The IVF centroid-assignment stage, pre-checkpoint — factored out so
    * PlanShapeSpec asserts the exchange-free property on the SAME plan
    * ivfAnn executes (a test over a private copy would keep passing if
    * the production path regressed). */
  def ivfAssignment(spark: SparkSession, dir: String): DataFrame =
    ivfAssignment(spark, dir, IvfCentroids)

  /** K-parameterized assignment — K is the coarse quantizer's scale
    * knob (K ∝ corpus bounds cell occupancy, hence any within-cell pair
    * work); the gated queries pin [[IvfCentroids]], [[graft.EmbedScale]]
    * drives the same code at a corpus-sized K. */
  def ivfAssignment(spark: SparkSession, dir: String, k: Int): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding",
        s"${sparkDot("embedding", "embedding")} AS nrm")
    // all K centroids as ONE broadcast row: array_sort makes the
    // collect_list order deterministic (sorted by cid, the struct's
    // first field)
    val centRow = emb
      .filter(col("vec_id") >= NumQueries &&
        col("vec_id") < NumQueries + k)
      .agg(array_sort(collect_list(struct(
        col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))))
        .as("cents"))
    // argmax over the K centroids in one native call per row
    // (graft_ivf_argmax — IvfCentroidArgmax): semantically identical to
    // `greatest()` over K inline struct(score, -cid) expressions (max
    // cosine, ties to the smallest cid, same fold-order doubles), but
    // the generated row method stays tiny. The inline form's projection
    // grew with K×Dim past the JVM's huge-method JIT threshold — it
    // compiled without warning, then ran interpreted at ~50× the cost
    // (EmbedScale measured 108 s/1.25M rows; this scans 5M in seconds).
    emb.join(broadcast(centRow))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        expr("graft_ivf_argmax(embedding, nrm, cents)").as("cid"))
  }

  // --- E4: k-means centroid update -------------------------------------------

  /** Fixed-point scale for E4's component sums: 2^24. Embedding floats
    * widen to double exactly and a power-of-two scaling is exact too, so
    * `floor(x * 2^24)` is fully determined by the float bits — no
    * decimal/rounding-mode cross-engine hazard (DuckDB's CAST(double AS
    * BIGINT) ROUNDS where Spark's truncates; floor() first sidesteps
    * both). */
  val KmeansFp = 1 << 24

  /** E4: the k-means centroid UPDATE step — the training half the IVF
    * docstring defers "offline", run as the distributed aggregation it
    * actually is: every vector's cluster assignment (E2's exchange-free
    * broadcast-argmax scan) followed by per-(centroid, dimension) member
    * counts and exact fixed-point component sums. The new centroid is
    * `sum_fp / (n * 2^24)` — a driver-trivial division left to the
    * caller, exactly like the (count, sum) partials every distributed
    * Lloyd implementation ships between iterations.
    *
    * Scale shape: assignment never shuffles (broadcast centroid row);
    * the posexplode fans ×Dim rows but the groupBy is map-side combined,
    * so the one shuffle carries at most K×Dim rows per map partition —
    * corpus-size-independent. */
  def kmeansUpdate(spark: SparkSession, dir: String): DataFrame =
    ivfAssignment(spark, dir)
      .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("cid"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(expr(s"CAST(floor(CAST(x AS DOUBLE) * $KmeansFp) AS BIGINT)")).as("sum_fp"))
      .select(col("cid"), col("dim"), col("n"), col("sum_fp"))

  val kmeansUpdateOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding AS e,
       |    ${duckDot("embedding", "embedding")} AS nrm
       |  FROM embeddings),
       |cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM emb
       |  WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCentroids}),
       |scored AS (SELECT emb.vec_id, emb.e, cid,
       |    (${duckDot("e", "ce")}) / (sqrt(nrm) * sqrt(cn)) AS cs
       |  FROM emb CROSS JOIN cent),
       |assigned AS (SELECT vec_id, e, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rk
       |    FROM scored) WHERE rk = 1),
       |comp AS (SELECT cid, u.d AS dim, u.v AS x FROM (
       |  SELECT cid, unnest(list_transform(range($Dim), i ->
       |    struct_pack(d := i, v := e[i + 1]))) AS u FROM assigned))
       |SELECT cid, CAST(dim AS INT) AS dim, count(*) AS n,
       |  CAST(sum(CAST(floor(CAST(x AS DOUBLE) * $KmeansFp) AS BIGINT)) AS BIGINT) AS sum_fp
       |FROM comp GROUP BY cid, dim""".stripMargin

  def ivfAnn(spark: SparkSession, dir: String): DataFrame = {
    val assigned = ivfAssignment(spark, dir)
      .localCheckpoint() // one assignment pass, reused by both probe sides
    val q = assigned.filter(col("vec_id") < NumQueries)
      .selectExpr("vec_id AS query_id", "embedding AS qe", "nrm AS qn", "cid")
    assigned.join(broadcast(q), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id",
        s"(${sparkDot("qe", "embedding")}) / (sqrt(qn) * sqrt(nrm)) AS sim")
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC)"))
      .filter(col("rank") <= 3)
      .selectExpr("query_id", "neighbor_id", "rank",
        "CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim")
  }

  val ivfAnnOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding AS e,
       |    ${duckDot("embedding", "embedding")} AS nrm
       |  FROM embeddings),
       |cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM emb
       |  WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCentroids}),
       |scored AS (SELECT emb.vec_id, emb.e, emb.nrm, cid,
       |    (${duckDot("e", "ce")}) / (sqrt(nrm) * sqrt(cn)) AS cs
       |  FROM emb CROSS JOIN cent),
       |assigned AS MATERIALIZED (SELECT vec_id, e, nrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rk
       |    FROM scored) WHERE rk = 1),
       |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, cid
       |  FROM assigned WHERE vec_id < $NumQueries),
       |pairs AS (SELECT query_id, a.vec_id AS neighbor_id,
       |    (${duckDot("qe", "a.e")}) / (sqrt(qn) * sqrt(a.nrm)) AS sim
       |  FROM assigned a JOIN q USING (cid) WHERE a.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM pairs)
       |SELECT query_id, neighbor_id, rank,
       |  CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim
       |FROM r WHERE rank <= 3""".stripMargin

  /** nprobe for the multi-cell IVF probe (D7b). */
  val NProbe = 2

  /** D7b: IVF ANN with nprobe = 2 — the recall knob every IVF deployment
    * turns: each query probes its TWO highest-cosine centroid cells
    * instead of one, for strictly-no-worse top-k (the top-1 cell is
    * always among the two, so the candidate pool only grows — pinned in
    * SimilaritySpec). Corpus assignment is UNCHANGED: the same one-scan
    * `graft_ivf_argmax` relation [[ivfAnn]] reads, each vector in
    * exactly one cell (so the 2-cell probe cannot duplicate a pair).
    * The query-side cell ranking is an 8×16 broadcast cross —
    * corpus-size-free — and the probe stays a broadcast join on the
    * cell id: at 100 TB, nprobe multiplies only probe fan-in
    * (queries × cell occupancy), never the corpus exchange. */
  def ivfAnn2(spark: SparkSession, dir: String): DataFrame = {
    val assigned = ivfAssignment(spark, dir).localCheckpoint()
    val cent = assigned
      .filter(col("vec_id") >= NumQueries &&
        col("vec_id") < NumQueries + IvfCentroids)
      .selectExpr("vec_id AS cid", "embedding AS ce", "nrm AS cn")
    val q2 = assigned.filter(col("vec_id") < NumQueries)
      .selectExpr("vec_id AS query_id", "embedding AS qe", "nrm AS qn")
      .crossJoin(broadcast(cent))
      .selectExpr("query_id", "qe", "qn", "cid",
        s"(${sparkDot("qe", "ce")}) / (sqrt(qn) * sqrt(cn)) AS cs")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, cid ASC)"))
      .filter(col("rk") <= NProbe)
      .select("query_id", "qe", "qn", "cid")
    assigned.join(broadcast(q2), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id",
        s"(${sparkDot("qe", "embedding")}) / (sqrt(qn) * sqrt(nrm)) AS sim")
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC)"))
      .filter(col("rank") <= 3)
      .selectExpr("query_id", "neighbor_id", "rank",
        "CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim")
  }

  val ivfAnn2Oracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding AS e,
       |    ${duckDot("embedding", "embedding")} AS nrm
       |  FROM embeddings),
       |cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM emb
       |  WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCentroids}),
       |scored AS (SELECT emb.vec_id, emb.e, emb.nrm, cid,
       |    (${duckDot("e", "ce")}) / (sqrt(nrm) * sqrt(cn)) AS cs
       |  FROM emb CROSS JOIN cent),
       |assigned AS MATERIALIZED (SELECT vec_id, e, nrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rk
       |    FROM scored) WHERE rk = 1),
       |q2 AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rk
       |    FROM scored WHERE vec_id < $NumQueries) WHERE rk <= $NProbe),
       |pairs AS (SELECT query_id, a.vec_id AS neighbor_id,
       |    (${duckDot("qe", "a.e")}) / (sqrt(qn) * sqrt(a.nrm)) AS sim
       |  FROM assigned a JOIN q2 USING (cid) WHERE a.vec_id <> q2.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM pairs)
       |SELECT query_id, neighbor_id, rank,
       |  CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim
       |FROM r WHERE rank <= 3""".stripMargin

  /** Coarse prefix length and candidate pool for the truncated-dimension
    * rerank (D7c). */
  val CoarseDim = 16
  val RerankPool = 20

  /** Same fold as [[duckDot]] but over the first n dims only. */
  private def duckDotN(a: String, b: String, n: Int) =
    s"""list_reduce(list_transform(range($n),
       |  i -> CAST($a[i + 1] AS DOUBLE) * CAST($b[i + 1] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  /** D7c: coarse-to-fine reranked ANN over dimension-truncated prefixes —
    * the matryoshka-representation trick: score the whole corpus with
    * only the first [[CoarseDim]] of [[Dim]] dimensions (4× fewer
    * multiply-adds and, in a deployment that stores the prefix as its
    * own column, 4× less scan I/O), keep the top [[RerankPool]] per
    * query, and re-rank just that pool with full-precision cosine.
    *
    * Scale shape: the coarse pass is the SAME zero-exchange broadcast
    * scan as brute force, only cheaper per row — and its pool window
    * shuffles SCALARS ONLY (query_id, vec_id, coarse score): computing
    * the coarse score before the exchange keeps the 64-float vectors out
    * of the corpus×queries shuffle (the naive form that carries the
    * embedding columns through the window pays ~20× the shuffle bytes).
    * The surviving pool (queries × [[RerankPool]] ids — corpus-size-free)
    * is broadcast BACK onto the embeddings table as a hash semi-probe to
    * fetch full vectors for the rerank, so the corpus is scanned, never
    * exchanged. Both stages are `graft_dot` folds (the coarse stage over
    * `slice(embedding, 1, 16)`), so scores are bit-identical to the
    * oracle's range(16)/range(64) folds and the pool boundary (ties →
    * smaller vec_id) is exact cross-engine. */
  def mrlRerank(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding",
        s"slice(embedding, 1, $CoarseDim) AS pre",
        s"${sparkDot("embedding", "embedding")} AS nrm")
      .selectExpr("vec_id", "embedding", "pre", "nrm",
        s"${sparkDot("pre", "pre")} AS pnrm")
    val q = emb.filter(col("vec_id") < NumQueries)
      .selectExpr("vec_id AS query_id", "embedding AS qe", "nrm AS qn",
        "pre AS qpre", "pnrm AS qpn")
    // coarse pass: score against the broadcast queries, keep only the
    // three scalar columns across the window's exchange
    val pool = emb.select("vec_id", "pre", "pnrm")
      .join(broadcast(q.select("query_id", "qpre", "qpn")),
        col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id",
        s"(${sparkDot("qpre", "pre")}) / (sqrt(qpn) * sqrt(pnrm)) AS coarse")
      .withColumn("crk", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY coarse DESC, vec_id ASC)"))
      .filter(col("crk") <= RerankPool)
      .select("query_id", "vec_id")
      .localCheckpoint() // one coarse pass, reused by re-executions
    // rerank: broadcast the tiny pool onto the corpus to recover full
    // vectors, attach the query vectors (broadcast), full-precision sims
    emb.select("vec_id", "embedding", "nrm")
      .join(broadcast(pool), Seq("vec_id"))
      .join(broadcast(q.select("query_id", "qe", "qn")), Seq("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id",
        s"(${sparkDot("qe", "embedding")}) / (sqrt(qn) * sqrt(nrm)) AS sim")
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC)"))
      .filter(col("rank") <= 3)
      .selectExpr("query_id", "neighbor_id", "rank",
        "CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim")
  }

  val mrlRerankOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding AS e,
       |    ${duckDot("embedding", "embedding")} AS nrm,
       |    ${duckDotN("embedding", "embedding", CoarseDim)} AS pnrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, pnrm AS qpn
       |  FROM emb WHERE vec_id < $NumQueries),
       |coarse AS (SELECT query_id, emb.vec_id, emb.e, emb.nrm, qe, qn,
       |    (${duckDotN("qe", "e", CoarseDim)}) / (sqrt(qpn) * sqrt(emb.pnrm)) AS cs
       |  FROM emb CROSS JOIN q WHERE emb.vec_id <> q.query_id),
       |pool AS (SELECT query_id, vec_id, e, nrm, qe, qn FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id ASC) AS crk
       |    FROM coarse) WHERE crk <= $RerankPool),
       |r AS (SELECT query_id, vec_id AS neighbor_id,
       |    (${duckDot("qe", "e")}) / (sqrt(qn) * sqrt(nrm)) AS sim
       |  FROM pool),
       |w AS (SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM r)
       |SELECT query_id, neighbor_id, rank,
       |  CAST(round(CAST(sim AS DECIMAL(18,10)), 6) AS DOUBLE) AS sim
       |FROM w WHERE rank <= 3""".stripMargin

  // --- E1: int8-quantized ANN ----------------------------------------------

  /** E1: scalar-quantized (int8) cosine top-k — the storage-scale path: a
    * 64-dim float corpus quantized to unit-scaled int8 is 4× smaller on
    * disk and in shuffle, and the score loop becomes integer multiply-adds.
    * Each vector is normalized then mapped to `floor(u*127 + 0.5)`; the
    * approximate cosine is the integer dot of the two quantized vectors
    * (÷127² implicitly — ranking needs only the integer, so the score
    * column IS the exact BIGINT dot: bit-identical cross-engine by
    * construction, no float rounding protocol needed).
    *
    * The int dot runs through the same native codegen loop as the float
    * path: products ≤ 127² and 64-term sums stay far below 2^53, so
    * `graft_dot` over the int8 values cast to double is EXACT integer
    * arithmetic at float-path speed. */
  def quantizedAnn(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val qz = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding",
        s"${sparkDot("embedding", "embedding")} AS nrm")
      .filter(col("nrm") > 0)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / sqrt(nrm) * 127.0D + 0.5D) AS DOUBLE)) AS qv")
    val q = qz.selectExpr("vec_id AS query_id", "qv AS qq")
      .filter(col("query_id") < NumQueries)
    qz.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id",
        s"CAST(${sparkDot("qq", "qv")} AS BIGINT) AS qdot")
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id ASC)"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("qdot"))
  }

  val quantizedAnnOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding AS e,
       |    ${duckDot("embedding", "embedding")} AS nrm
       |  FROM embeddings),
       |qz AS MATERIALIZED (SELECT vec_id,
       |    list_transform(range($Dim),
       |      i -> CAST(floor(CAST(e[i + 1] AS DOUBLE) / sqrt(nrm) * 127.0 + 0.5) AS BIGINT)) AS qv
       |  FROM emb WHERE nrm > 0),
       |q AS (SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < $NumQueries),
       |pairs AS (SELECT query_id, qz.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range($Dim), i -> qq[i + 1] * qv[i + 1])) AS BIGINT) AS qdot
       |  FROM qz JOIN q ON qz.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, qdot,
       |    row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id ASC) AS rank
       |  FROM pairs)
       |SELECT query_id, neighbor_id, rank, qdot FROM r WHERE rank <= $TopK""".stripMargin

  // --- E2: product-quantized ANN (ADC) --------------------------------------

  /** PQ layout: [[PqM]] subspaces of [[PqSubDim]] dims, [[PqK]] codewords
    * per subspace. Codewords are the IVF centroid rows' subspace slices
    * (vec_id in [8, 24) — the same deterministic stand-in for offline
    * k-means training [[ivfAnn]] uses). */
  val PqM = 4
  val PqK = 16
  val PqSubDim = Dim / PqM

  /** Same fold as [[duckDot]] but over a [[PqSubDim]]-length slice. */
  private def duckSubDot(a: String, b: String) =
    s"""list_reduce(list_transform(range($PqSubDim),
       |  i -> CAST($a[i + 1] AS DOUBLE) * CAST($b[i + 1] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  /** E2: product-quantized ANN with asymmetric-distance scoring (the
    * FAISS-IVFPQ compression path): each corpus vector is encoded as
    * [[PqM]] code ids (its nearest codeword per subspace, L2), and a
    * query scores a vector by summing [[PqM]] precomputed query-to-
    * codeword distance-table entries — the corpus embeddings are read
    * ONCE at index build and never again at query time.
    *
    * Scale shape: the encode is one zero-exchange corpus scan (the M×K
    * codebook rides in as a single broadcast row; the per-row M×K×SubDim
    * argmin is the native `graft_pq_encode` call — the inline-SQL form
    * would regrow the IVF argmax's interpreted-projection JIT cliff).
    * The probe scans the CODES table only: 4 ints/vector vs 64 floats —
    * a 16× read-volume cut, which at 100 TB of embeddings is the
    * difference between an in-memory ANN index and re-scanning the
    * corpus per query batch. The per-query ADC tables (M×K = 64 longs)
    * are built from a queries×codebook broadcast cross and broadcast
    * back; the top-k window exchanges scalars only.
    *
    * Determinism: distances are `bn − 2·dot` (no division → no NaN),
    * with the dot the same index-order left fold both engines run; ADC
    * terms snap through `floor(x · 2^24)` into BIGINT, so scores are
    * integer-exact cross-engine and ranking ties (dist, then vec_id)
    * are unambiguous. */
  /** The M×K codebook rows of [[pqAnn]]: bid = m·K + code, be = the
    * codeword's subspace slice, bn = its self-dot (the L2 expansion's
    * constant term). */
  private[graft] def pqBookRows(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= NumQueries && col("vec_id") < NumQueries + PqK)
      .select(col("vec_id"), explode(expr(s"sequence(0, ${PqM - 1})")).as("m"),
        col("embedding"))
      .selectExpr(
        s"CAST(m * $PqK + (vec_id - $NumQueries) AS BIGINT) AS bid",
        s"slice(embedding, m * $PqSubDim + 1, $PqSubDim) AS be")
      .selectExpr("bid", "be", s"${sparkDot("be", "be")} AS bn")

  /** [[pqAnn]]'s index build — (vec_id, codes array<int> of length
    * [[PqM]]): one broadcast-join corpus scan through the native
    * `graft_pq_encode` (not checkpointed; callers decide reuse). */
  private[graft] def pqCodes(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val booksRow = pqBookRows(spark, dir)
      .agg(array_sort(collect_list(struct(col("bid"), col("be"), col("bn"))))
        .as("books"))
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      .join(broadcast(booksRow))
      .selectExpr("vec_id", s"graft_pq_encode(embedding, books, $PqK) AS codes")
  }

  def pqAnn(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val bookRows = pqBookRows(spark, dir)
    // index build: one broadcast-join corpus scan, 4 code ids per vector
    val codes = pqCodes(spark, dir)
      .localCheckpoint() // built once, probed by every query
    // per-query ADC table: fixed-point (bn − 2·dot(q_sub, be)) per
    // codeword, packed into one bid-ordered array
    val qtab = emb.filter(col("vec_id") < NumQueries)
      .selectExpr("vec_id AS query_id", "embedding AS qe")
      .crossJoin(broadcast(bookRows))
      .selectExpr("query_id", "bid",
        s"""CAST(floor((bn - 2.0D * ${sparkDot(
             s"slice(qe, CAST(bid DIV $PqK AS INT) * $PqSubDim + 1, $PqSubDim)", "be")})
           | * CAST($KmeansFp AS DOUBLE)) AS BIGINT) AS term""".stripMargin)
      .groupBy(col("query_id"))
      .agg(expr("transform(array_sort(collect_list(struct(bid, term))), s -> s.term)")
        .as("tbl"))
    val adc = (0 until PqM)
      .map(m => s"element_at(tbl, $m * $PqK + element_at(codes, ${m + 1}) + 1)")
      .mkString(" + ")
    codes.join(broadcast(qtab), col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id", s"($adc) AS dist_fp")
      .withColumn("rank", expr(
        "row_number() OVER (PARTITION BY query_id ORDER BY dist_fp ASC, neighbor_id ASC)"))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dist_fp"))
  }

  val pqAnnOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding AS e FROM embeddings),
       |books AS MATERIALIZED (SELECT m * $PqK + (vec_id - $NumQueries) AS bid,
       |    list_slice(e, m * $PqSubDim + 1, m * $PqSubDim + $PqSubDim) AS be
       |  FROM emb CROSS JOIN (SELECT unnest(range($PqM)) AS m) ms
       |  WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + PqK}),
       |books2 AS MATERIALIZED (SELECT bid, be, ${duckSubDot("be", "be")} AS bn FROM books),
       |enc AS (SELECT emb.vec_id, bid // $PqK AS m, bid % $PqK AS k,
       |    bn - 2.0 * ${duckSubDot(
             s"list_slice(e, (bid // $PqK) * $PqSubDim + 1, (bid // $PqK) * $PqSubDim + $PqSubDim)",
             "be")} AS dist
       |  FROM emb CROSS JOIN books2),
       |codes AS MATERIALIZED (SELECT vec_id, m, k FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, k ASC) AS rk
       |    FROM enc) WHERE rk = 1),
       |qtab AS (SELECT q.vec_id AS query_id, bid,
       |    CAST(floor((bn - 2.0 * ${duckSubDot(
             s"list_slice(q.e, (bid // $PqK) * $PqSubDim + 1, (bid // $PqK) * $PqSubDim + $PqSubDim)",
             "be")}) * CAST($KmeansFp AS DOUBLE)) AS BIGINT) AS term
       |  FROM emb q CROSS JOIN books2 WHERE q.vec_id < $NumQueries),
       |scored AS (SELECT query_id, c.vec_id AS neighbor_id,
       |    CAST(sum(term) AS BIGINT) AS dist_fp
       |  FROM codes c JOIN qtab t ON t.bid = c.m * $PqK + c.k AND c.vec_id <> t.query_id
       |  GROUP BY 1, 2),
       |r AS (SELECT query_id, neighbor_id, dist_fp,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dist_fp ASC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, dist_fp FROM r WHERE rank <= 3""".stripMargin

  // --- E5: embedding outlier score ------------------------------------------

  /** How many least-central vectors the outlier query publishes. */
  val OutlierK = 10

  /** E5: embedding-centroid outlier scoring — the embedding-space quality
    * filter of a curation pipeline: vectors far from the corpus centroid
    * (low cosine) are the off-distribution candidates a training-data
    * pass prunes or down-weights. Two passes, no corpus shuffle beyond a
    * Dim-bounded aggregation:
    *   1. exact centroid: per-dimension fixed-point sums (the same
    *      floor(x·2²⁴) protocol as E4 — float bits fully determine the
    *      integers, so the per-dim means are bit-identical cross-engine),
    *      collected into ONE broadcast array;
    *   2. cosine(e, centroid) per vector via the ordered-left-fold dot —
    *      the native codegen `graft_dot` (ArrayDotProduct handles the
    *      mixed float-corpus/double-centroid sides), snap through
    *      DECIMAL(18,10) → 6 dp, publish the bottom-K by (cos ASC, vec_id).
    * At 100 TB: pass 1's shuffle is Dim-bounded (map-side combined),
    * pass 2 is a stateless scan against a broadcast constant, and its
    * three dots per row run as compiled primitive loops — the same
    * per-core throughput as every other corpus scan in this stack
    * (the previous interpreted zip_with+aggregate fold allocated an
    * intermediate array per dot per row; see EmbedScale for the
    * measured before/after at soak scale). */
  def outlierScore(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val cent = emb
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(expr(s"CAST(floor(CAST(x AS DOUBLE) * $KmeansFp) AS BIGINT)")).as("sum_fp"))
      .agg(sort_array(collect_list(struct(col("dim"),
        (col("sum_fp").cast("double") / (col("n") * lit(KmeansFp.toDouble))).as("v"))))
        .as("cs"))
      .selectExpr("transform(cs, s -> s.v) AS cent")
    emb.join(broadcast(cent))
      .selectExpr("vec_id",
        s"""CAST(round(CAST((${sparkDot("embedding", "cent")})
           | / (sqrt(${sparkDot("embedding", "embedding")}) * sqrt(${sparkDot("cent", "cent")}))
           |AS DECIMAL(18,10)), 6) AS DOUBLE) AS centrality""".stripMargin)
      .orderBy(col("centrality").asc, col("vec_id"))
      .limit(OutlierK)
  }

  val outlierScoreOracle: String = {
    def fold(a: String, b: String) =
      s"""list_reduce(list_transform(range($Dim),
         |  i -> CAST($a[i + 1] AS DOUBLE) * CAST($b[i + 1] AS DOUBLE)), (x, y) -> x + y)""".stripMargin
    s"""WITH comp AS (SELECT u.d AS dim, u.v AS x FROM (
       |    SELECT unnest(list_transform(range($Dim), i ->
       |      struct_pack(d := i, v := embedding[i + 1]))) AS u FROM embeddings)),
       |sums AS (SELECT dim, count(*) AS n,
       |    sum(CAST(floor(CAST(x AS DOUBLE) * $KmeansFp) AS BIGINT)) AS sum_fp
       |  FROM comp GROUP BY dim),
       |c AS (SELECT list(CAST(sum_fp AS DOUBLE) / (n * CAST($KmeansFp AS DOUBLE))
       |    ORDER BY dim) AS cent FROM sums),
       |scored AS (SELECT vec_id,
       |    CAST(round(CAST((${fold("embedding", "cent")})
       |      / (sqrt(${fold("embedding", "embedding")}) * sqrt(${fold("cent", "cent")}))
       |    AS DECIMAL(18,10)), 6) AS DOUBLE) AS centrality
       |  FROM embeddings CROSS JOIN c)
       |SELECT vec_id, centrality FROM scored
       |ORDER BY centrality ASC, vec_id LIMIT $OutlierK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_outlier_score" -> outlierScore,
    "s_knn_label" -> knnLabel,
    "s_kmeans_update" -> kmeansUpdate,
    "s_cosine_topk" -> cosineTopK,
    "s_lsh_ann" -> lshAnn,
    "s_ivf_ann" -> ivfAnn,
    "s_ivf_probe2" -> ivfAnn2,
    "s_mrl_rerank" -> mrlRerank,
    "s_quantized_ann" -> quantizedAnn,
    "s_pq_ann" -> pqAnn,
    "d_embed_neardup" -> embedNearDup,
    "d_semantic_neardup" -> semanticNearDup)

  val oracles: Map[String, String] = Map(
    "s_outlier_score" -> outlierScoreOracle,
    "s_knn_label" -> knnLabelOracle,
    "s_kmeans_update" -> kmeansUpdateOracle,
    "s_quantized_ann" -> quantizedAnnOracle,
    "s_cosine_topk" -> cosineTopKOracle,
    "s_lsh_ann" -> lshAnnOracle,
    "s_ivf_ann" -> ivfAnnOracle,
    "s_ivf_probe2" -> ivfAnn2Oracle,
    "s_mrl_rerank" -> mrlRerankOracle,
    "s_pq_ann" -> pqAnnOracle,
    "d_embed_neardup" -> embedNearDupOracle,
    "d_semantic_neardup" -> semanticNearDupOracle)
}
