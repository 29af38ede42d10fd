package graft.api

import org.apache.spark.sql.DataFrame

/** Plan-shape audit for the explain-audit loop, programmatically: counts
  * the wide stages and checks what reached the scan. Use in tests to pin
  * a plan property ("this join must not shuffle", "this filter must push
  * down") so a regression fails CI instead of quietly costing a shuffle
  * at 100 TB.
  */
object PlanAudit {
  final case class Summary(
      exchanges: Int,          // shuffle exchanges (each is a wide stage)
      broadcasts: Int,         // broadcast exchanges
      scans: Int,              // file scans
      pushedFilters: Seq[String], // PushedFilters: [...] payloads, one per scan
      wholeStageSpans: Int,    // whole-stage codegen regions
      sorts: Int)

  def summarize(df: DataFrame): Summary = {
    val plan = df.queryExecution.executedPlan.toString
    def count(token: String): Int =
      plan.sliding(token.length).count(_ == token)
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    Summary(
      exchanges = count("Exchange hashpartitioning")
        + count("Exchange rangepartitioning"),
      broadcasts = count("BroadcastExchange"),
      scans = count("FileScan"),
      pushedFilters = pushed,
      wholeStageSpans = count("WholeStageCodegen"),
      sorts = count("+- Sort "))
  }

  /** True when the plan contains no shuffle exchange (fully narrow or
    * broadcast-only — the shape a co-partitioned/bucketed join should
    * have). */
  def isShuffleFree(df: DataFrame): Boolean = summarize(df).exchanges == 0
}
