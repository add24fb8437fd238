package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for the named queries (or a
  * curated audit set) so the scan/pushdown/broadcast/codegen claims in
  * SURVEY §5 can be checked against the actual plans.
  *
  * Usage: runMain graft.ExplainAudit [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("b1_pricing_summary", "b2_top_revenue", "b3_region_revenue",
        "b12_window_funnel", "b14_top_k", "c2_dedup_minhash",
        "c3_dedup_simhash", "c6_ann_topk", "c9_quality", "c14_tfidf")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // audit the real computational plan, not the self-release wrapper's
    // localized copy (TrainingQueries.materialized) — same switch
    // PlanAuditSpec uses
    spark.conf.set("spark.graft.materialize", "false")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain() // simple mode: *(id) marks codegen spans
    }
    spark.stop()
  }
}
