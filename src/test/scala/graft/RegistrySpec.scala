package graft

/** Whole-registry contract guards: properties every served query must
  * satisfy, enforced over `SparkEntry.queries` itself so a new
  * operator can't ship without them.
  */
class RegistrySpec extends SparkSpecBase {

  test("driver contract: every query has an oracle, every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries whose BroadcastNestedLoopJoin is the CORRECT plan, in
    * two documented classes: (a) brute-force scorers / API-contract
    * request sets — a non-equi join over a broadcast QUERY/REQUEST
    * side while the corpus side streams (documented correctness
    * baselines, bounded by contract); (b) scalar joins — a crossJoin
    * against a broadcast ONE-ROW aggregate (corpus totals, vocab
    * size, clamp constants), where BNLJ degenerates to "attach the
    * scalar to every row". Everything else must not BNLJ. */
  private val bnljAllowed = Set(
    // (a) broadcast query/request side, streaming corpus side
    "sim_topk_bruteforce", "sim_cosine_pairs", "sim_range_search",
    "sim_maxsim_multivec", "sim_filtered_search", "sim_pooled_search",
    "sim_recall_eval",
    "sim_pq_adc", "sim_lsh_ann", "sim_ivf_probe", "sim_ivf_kmeans",
    "dedup_embedding_neardup", "dedup_semdedup",
    "api_limit_clamp", "api_next_token", "dlq_redrive_batch",
    "k19_idle_customers", "audit_list_page",
    // (b) one-row broadcast scalar attach
    "corpus_mix_weights", "corpus_resample", "text_dsir_weights",
    "text_tfidf_top_terms", "text_unigram_surprisal",
    "text_perplexity_buckets")

  test("no query plans a cartesian product; BNLJ only where documented") {
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val nodes = flattenPlan(executedPlan(df))
      if (nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]))
        failures += s"$name: CartesianProduct"
      if (!bnljAllowed(name) && nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]))
        failures += s"$name: BroadcastNestedLoopJoin"
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
