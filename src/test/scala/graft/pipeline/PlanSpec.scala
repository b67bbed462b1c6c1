package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.QueryExecution
import graft.TestSpark

/** Physical-plan hygiene assertions (SURVEY.md §4: what must hold at 100 TB).
  * These guard the plans, not the results: a regression that silently turns
  * a broadcast join into a sort-merge join or widens a parquet scan passes
  * every value-level oracle and only shows up as a cluster bill.
  */
class PlanSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def physical(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString
  }

  test("q08/q09/q10: dimension joins broadcast, never sort-merge") {
    Seq("q08_priority_revenue", "q09_nation_revenue", "q10_segment_orders").foreach { q =>
      val plan = physical(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q fell back to sort-merge:\n$plan")
    }
  }

  test("q09: star join shuffles the fact table exactly once (for the agg)") {
    val plan = physical("q09_nation_revenue")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges:\n$plan")
  }

  test("q01: parquet scan prunes to the referenced columns only") {
    val plan = physical("q01_pricing_rollup")
    val read = "ReadSchema: [^\n]+".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"),
      s"expected pruned scan columns in: $read")
    assert(!read.contains("l_shipdate") && !read.contains("l_partkey"),
      s"scan reads unreferenced columns: $read")
  }

  test("q03: filter pushed down to the parquet scan") {
    val plan = physical("q03_click_users")
    val pushed = "PushedFilters: [^\n]+".r.findFirstIn(plan).getOrElse("")
    assert(pushed.contains("event_type"), s"filter not pushed: $pushed\n$plan")
  }

  test("q01/q07: partial (map-side) aggregation before the shuffle") {
    Seq("q01_pricing_rollup", "q07_lang_stats").foreach { q =>
      val plan = physical(q)
      val firstAgg = plan.indexOf("HashAggregate")
      val firstEx = plan.indexOf("Exchange")
      assert(firstAgg >= 0 && firstEx >= 0, s"$q plan missing agg/exchange:\n$plan")
      // toString prints top-down: final agg, exchange, then partial agg below
      assert(plan.indexOf("HashAggregate", firstEx) >= 0,
        s"$q has no partial aggregate under the exchange:\n$plan")
    }
  }

  test("x01: extraction adds no shuffle beyond the generator's input spread") {
    val pages = graft.io.SyntheticPages.fromDocuments(spark, sf)
    val plan = Extract.runNarrow(pages).toDF()
      .select("url", "doc_id", "status").queryExecution.executedPlan.toString
    // SyntheticPages round-robins the single-row-group parquet input once,
    // BEFORE the generative flatMap; extraction itself must stay narrow.
    assert(!plan.contains("Exchange hashpartitioning"),
      s"extraction gained a hash shuffle:\n$plan")
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected only the generator spread, got $exchanges:\n$plan")
  }

  test("dedup/similarity pipelines never fall back to cartesian joins") {
    // the LSH family's whole point is avoiding all-pairs work; a missing
    // join key or a non-equi condition would silently reintroduce O(n²)
    Seq("d02_minhash_pairs", "d04_ngram_verified_dups", "s04_cosine_near_dups",
      "d06_containment", "d07_incremental_dups")
      .foreach { q =>
        val plan = physical(q)
        assert(!plan.contains("CartesianProduct"), s"$q went cartesian:\n$plan")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$q joins without keys:\n$plan")
      }
  }

  test("d02: signatures cached — one tokenize pass feeds banding AND verify") {
    // minhashCandidates reads the signature frame three times (banding +
    // both sides of the verify join); without the persist each read would
    // re-tokenize and re-minhash the whole corpus
    val plan = physical("d02_minhash_pairs")
    assert(plan.contains("InMemoryTableScan"),
      s"d02 signatures not cached — corpus would tokenize 3x:\n$plan")
    spark.catalog.clearCache()
  }

  test("q13: top-k per group is a partial aggregate, not a window") {
    // a row_number window's sort parallelism is bounded by the 25 distinct
    // nations; the bounded Aggregator reduces map-side on every partition
    val plan = physical("q13_top_customers_per_nation")
    assert(!plan.contains("Window"), s"q13 regressed to a window:\n$plan")
    assert(plan.contains("partial_topkbyscore"),
      s"q13 lost its map-side partial top-k:\n$plan")
  }

  test("t09: paragraph winner is a partial aggregate, not a window over para") {
    // a window partitioned by paragraph funnels a universal boilerplate
    // paragraph's whole occurrence list through one partition; the
    // min(struct) hash-aggregate combines map-side on every input partition
    val plan = physical("t09_paragraph_dedup")
    assert(!plan.contains("Window"), s"t09 regressed to a window:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("min(struct"),
      s"t09 lost its map-side partial min:\n$plan")
  }

  test("t10: decontamination probes the eval n-gram set via broadcast") {
    val plan = physical("t10_decontaminate")
    assert(plan.contains("BroadcastHashJoin"),
      s"t10 lost the broadcast probe:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"t10 grew a cartesian:\n$plan")
  }

  test("whole-stage codegen spans cover the oracle rollups") {
    val df = graft.SparkEntry.queries("q01_pricing_rollup")(spark, sf)
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString
    // codegen spans print as "*(n) Operator" in the condensed plan string
    assert(plan.contains("*(1)") && plan.contains("HashAggregate"),
      s"codegen disabled:\n$plan")
  }
}
