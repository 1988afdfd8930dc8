package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-deployable registration of the engine's custom Catalyst
  * expressions (`public` Spark API: `spark.sql.extensions`).
  *
  * `VectorExprs.register` covers the in-process case (query bodies calling
  * `expr("graft_dot(...)")` after an explicit register call); this class is
  * the zero-code-change path for a cluster user: submitting with
  *
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * injects the same functions into every session built on that context, so
  * plain `spark.sql("SELECT graft_dot(a, b) ...")` works from SQL-only
  * clients (JDBC/Thrift, notebooks) with no `graft` import on the user
  * side. Both paths share one canonical function table below — a function
  * added here is automatically available to both.
  *
  * The injected builders construct codegen'd expressions (VectorExprs.scala)
  * — no UDF wrapping, so SQL callers get the same whole-stage-codegen plans
  * as the DataFrame API (PlanSpec pins the hot paths inside codegen).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  type Builder = Seq[Expression] => Expression

  /** The canonical (name, info, builder) table — single source of truth
    * for both the extension injection and the in-process temp-function
    * registration (VectorExprs.register). */
  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      exprs => DotProduct(exprs(0), exprs(1))),
    ("graft_adc",
      new ExpressionInfo(classOf[AdcSum].getName, "graft_adc"),
      exprs => AdcSum(exprs(0), exprs(1))),
    ("graft_agree",
      new ExpressionInfo(classOf[ArrayAgreeCount].getName, "graft_agree"),
      exprs => ArrayAgreeCount(exprs(0), exprs(1))),
    ("graft_icount",
      new ExpressionInfo(classOf[SortedInterCount].getName, "graft_icount"),
      exprs => SortedInterCount(exprs(0), exprs(1))),
    ("graft_emit_once",
      new ExpressionInfo(classOf[EmitOnceMin].getName, "graft_emit_once"),
      exprs => EmitOnceMin(exprs(0), exprs(1), exprs(2))),
    ("graft_pq_argmin",
      new ExpressionInfo(classOf[PqArgmin].getName, "graft_pq_argmin"),
      exprs => PqArgmin.fromArgs(exprs)),
    ("graft_pq_dists",
      new ExpressionInfo(classOf[PqDistRow].getName, "graft_pq_dists"),
      exprs => PqDistRow.fromArgs(exprs)),
    ("graft_pq_argmin_r4",
      new ExpressionInfo(classOf[PqArgmin].getName, "graft_pq_argmin_r4"),
      exprs => PqArgmin.fromArgsR4(exprs)),
    ("graft_cms_est",
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_est"),
      exprs => CmsEstimate(exprs(0), exprs(1))),
    ("graft_bloom_might",
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_might"),
      exprs => BloomMightContain(exprs(0), exprs(1))),
    ("graft_bloom_probe",
      new ExpressionInfo(classOf[BloomProbe].getName, "graft_bloom_probe"),
      exprs => BloomProbe.fromArgs(exprs)),
  )
}
