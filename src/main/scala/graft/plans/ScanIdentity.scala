package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Filesystem identity of a scan leaf, for rewrite rules that must know
  * WHICH table a plan reads — a column-name subset test is not identity
  * (any lineitem-derived parquet, or the bucketed twin, has a superset of
  * the base columns and would be silently retargeted). [[MvRewrite]] and
  * [[JoinElimination]] both compare the leaf's root paths against the
  * path recorded at registration; an unidentifiable leaf (non-V1-file
  * relation) yields the empty set, which callers treat as "refuse".
  */
object ScanIdentity {

  /** Root paths of a V1 file scan, normalized to bare URI paths (scheme
    * and authority dropped, so `file:/x/y` and `/x/y` agree). Empty for
    * anything that is not a file-based `LogicalRelation`.
    */
  def pathsOf(leaf: LogicalPlan): Set[String] = leaf match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(p => p.toUri.getPath).toSet
      case _ => Set.empty
    }
    case _ => Set.empty
  }

  /** Normalize a registration-time path string the same way. */
  def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath
}
