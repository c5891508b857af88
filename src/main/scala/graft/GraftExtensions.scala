package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Official library entry point for Spark's extension mechanism:
  *
  * {{{ spark-submit --conf spark.sql.extensions=graft.GraftExtensions ... }}}
  *
  * injects the native function surface (`graft_dot`) into the session's
  * function registry and installs the
  * [[graft.plans.DotProductRewrite]] optimizer rule, so a cluster user
  * gets the fused kernels with zero code changes — both the `graft_dot`
  * SQL spelling and the built-in `aggregate(zip_with(...))` spelling
  * compile to the codegen'd expression. The harness mains and the test
  * fixture build their sessions through this config, so the injection
  * path itself is exercised by every verify/bench run.
  *
  * [[graft.functions.GraftFunctions.register]] remains the programmatic
  * equivalent for sessions the caller has already built.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(graft.functions.GraftFunctions.dotDescription)
    ext.injectFunction(graft.functions.GraftFunctions.chunksDescription)
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    ext.injectOptimizerRule(_ => graft.plans.JoinElimination)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectResolutionRule(s => new graft.plans.ResolveV2Views(s))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
