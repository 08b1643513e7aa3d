package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan assertions: the optimizations the engine relies on at
  * 100 TB must actually appear in the plans — filter pushdown reaching
  * the parquet scan, column pruning in ReadSchema, broadcast for small
  * dims, whole-stage codegen on the hot path (SURVEY.md §4.1-4.3).
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  override def afterAll(): Unit = spark.stop()

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString()

  test("q01 scan: filters pushed to parquet, columns pruned") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters:"), p.take(800))
    assert(p.contains("GreaterThan(l_quantity") || p.contains("LessThan(l_shipdate"),
      "expected quantity/shipdate predicates in PushedFilters")
    // projection pruning: ReadSchema carries only the needed columns
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_comment") && !read.contains("l_extendedprice"),
      s"scan reads too many columns: $read")
  }

  test("q30 ANN: probe side broadcast, no shuffle of the big side") {
    val p = plan("q30_ann_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "expected the 3-probe side to broadcast")
  }

  test("q06 join+agg: whole-stage codegen covers the aggregate") {
    val df = SparkEntry.queries("q06_join_agg")(spark, sf)
    df.collect() // finalize the adaptive plan — codegen spans appear post-execution
    val p = df.queryExecution.executedPlan.toString()
    // "*(n)" is the compact WholeStageCodegen marker in plan toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("), "hot path fell out of codegen")
    assert(p.contains("HashAggregate"), "expected hash aggregation")
  }

  test("partial aggregation (map-side combine) present in groupBy") {
    val df = SparkEntry.queries("q02_agg_groupby")(spark, sf)
    val p = df.queryExecution.executedPlan.toString()
    // two HashAggregate nodes: partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no map-side partial aggregation")
  }

  test("decode-pruned query: part_source filter applies before decode") {
    // on the written chunks table the filter becomes partition pruning;
    // in-flight it must at least precede the deserialize/decode stage
    val df = SparkEntry.queries("q23_decode_pruned")(spark, sf)
    val p = df.queryExecution.optimizedPlan.toString()
    assert(p.contains("part_source"), "part_source filter missing from plan")
  }
}
