package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextAnalysis
import graft.operators.{CorpusIO, Dedup, GraphOps, Multimodal, Relational, Similarity}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory behind
  * `queries`; every key has a DuckDB oracle in `oracleSql` unless marked
  * rows-only in the survey.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ GraphOps.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Similarity.queries ++ Multimodal.queries ++
      CorpusIO.queries ++ Map(
        // S7: per-op single-insert bench (reference bench_add_single_*);
        // the timed path is a streaming append, but the admitted row set
        // is a pure function of the op id (S7c pins it), so both flavors
        // carry full DuckDB oracles. Independent of sfDir by design: the
        // reference's insert bench also measures ops, not data (per-op
        // cost is constant in corpus size).
        "g_insert_stream" -> ((s: SparkSession, _: String) =>
          graft.streaming.InsertBench.insertStream(s)),
        // S7 edge flavor (reference bench_add_single_edge): bare append,
        // no gate — times the pure per-op micro-batch floor.
        "g_insert_edges" -> ((s: SparkSession, _: String) =>
          graft.streaming.InsertBench.insertEdges(s)))

  /** Queries whose reference counterpart RETURNS ROWS TO THE CLIENT
    * (databases.py: `get_single_node`/`get_nodes_hops`/`ssp` hand row
    * lists back to the bench process) — for these the faithful timed
    * action is a `collect()` into the driver, not a sink write: the op's
    * deliverable IS the client fetch, and every result here is
    * client-sized by construction (a node, a hub's edge list, a bounded
    * traversal's frontier set). Everything else stays on the noop sink
    * (corpus-scale transforms whose deliverable is a dataset). Bench
    * matches on the base name, so the sweep's `@n`/`@h`/`@d`/`@dist`
    * twins of these rows inherit the client-fetch action. */
  val clientFetch: Set[String] = Set(
    "g_node_lookup", "g_node_lookup_fast", "g_wikivote_lookup",
    "g_khop_grid", "g_khop_bipartite", "g_wikivote_khop",
    "g_ssp_pair", "g_sssp_grid", "g_wsssp_grid")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ GraphOps.oracles ++ Dedup.oracles ++
      TextAnalysis.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      CorpusIO.oracles ++ Map(
        "g_insert_stream" -> graft.streaming.InsertBench.insertStreamOracle(),
        "g_insert_edges" -> graft.streaming.InsertBench.insertEdgesOracle())
}
