package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Back-compat alias of the canonical extension class: some deployments
  * configured `--conf spark.sql.extensions=graft.GraftExtensions` before
  * the class moved beside its function table. Delegates to
  * [[graft.functions.GraftExtensions]] — the ONE (name, info, builder)
  * table — so the two registration paths cannot drift (a hand-copied
  * list here silently missed graft_adc when it was added; review r10). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    new graft.functions.GraftExtensions().apply(ext)
}
