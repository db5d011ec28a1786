package graft

import org.apache.spark.sql.SparkSession

/** Sweep every registered query's physical plan and print a one-line
  * audit: shuffle-exchange count, broadcast count, whole-stage-codegen
  * spans, and whether parquet scans carry pushed filters / pruned
  * schemas. `runMain graft.PlanAudit [sfDir]` — the output is the
  * evidence that plans stay the plans we want (see docs/PLANS.md).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // Pre-checkpoint mode: localCheckpoint tails become the identity
    // (PlanMode.checkpointTail), so the audit sees each query's REAL
    // plan instead of "1 cached scan" — and plan construction stays
    // lazy (eager checkpoints would execute at build time).
    System.setProperty("graft.plan.audit", "1")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("| query | shuffles | 1-part exch | broadcasts | codegen spans | scans (pruned cols) |")
    println("|---|---|---|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // execute THIS plan so AQE finalizes it
        // AQE's toString appends an "== Initial Plan ==" section that
        // would double-count every node — audit the final plan only.
        val executed = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val lines = executed.linesIterator.toSeq
        val shuffles = lines.count(l => l.contains("Exchange hashpartitioning") ||
                                        l.contains("Exchange rangepartitioning"))
        // The corpus-cardinality anti-pattern detector: an Exchange
        // SinglePartition funnels EVERY row to one task (constant-group
        // windows, un-limited global sorts). Bounded inputs excuse it
        // (≤K-row tails); a nonzero count on a corpus-sized input is a
        // scale bug. TakeOrderedAndProject does NOT show up here — that
        // is the point of cutting top-K via orderBy().limit().
        val singles = lines.count(_.contains("Exchange SinglePartition"))
        val bcasts = lines.count(_.contains("BroadcastExchange"))
        // whole-stage-codegen spans show as `*(n)` prefixes in the tree
        val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(executed)
          .map(_.group(1)).toSet.size
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val scanCols = formatted.linesIterator
          .filter(_.trim.startsWith("ReadSchema:"))
          .map(l => l.count(_ == ':') - 1) // fields in struct<a:t,b:t,...>
          .toSeq
        println(s"| $name | $shuffles | $singles | $bcasts | $codegen | " +
                s"${scanCols.length} (${scanCols.mkString("/")}) |")
      } catch {
        case e: Throwable =>
          println(s"| $name | ERROR ${String.valueOf(e.getMessage).take(60)} |")
      }
    }
    spark.stop()
  }
}
