package graft.sources

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.ResolvedTable
import org.apache.spark.sql.catalyst.plans.logical.{AnalyzeTable, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.storage.GraftTable

/** Session extensions for graft: routes SQL `ANALYZE TABLE` on a graft
  * catalog table through [[GraftTable.analyze]] — the reference hooks
  * ANALYZE via its FDW `AnalyzeForeignTable` callback
  * (`cstore_fdw.c:2061-2082`); Spark has no DSv2 ANALYZE contract, so a
  * resolution rule substitutes the command.
  *
  * {{{
  *   spark.sql.extensions = graft.sources.GraftExtensions
  *   ANALYZE TABLE graft.db.t COMPUTE STATISTICS          -- full column stats
  *   ANALYZE TABLE graft.db.t COMPUTE STATISTICS NOSCAN   -- row count + size only
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => GraftAnalyzeRule)
  }
}

object GraftAnalyzeRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case AnalyzeTable(r: ResolvedTable, partitionSpec, noScan)
        if r.table.isInstanceOf[GraftSparkTable] =>
      require(partitionSpec.isEmpty, "graft tables are not partitioned")
      GraftAnalyzeCommand(r.table.asInstanceOf[GraftSparkTable].tableLocation, noScan)
  }
}

/** Runs ANALYZE on the graft table: distributed min/max/ndv/null
  * collection committed to `_graft_stats.json`, which the scan's
  * statistics hook then serves to Catalyst. */
case class GraftAnalyzeCommand(location: String, noScan: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftTable.open(session, location).analyze(noScan = noScan)
    Seq.empty
  }
}
