package graft.tools

import graft.SparkEntry
import graft.queries.AnnMediaQueries

/** Doc-count gate backend (VERDICT r10 item 7): prints the registry's
  * machine truth on one `[counts]` line so `scripts/check_counts.sh` can
  * compare it against the claims in SURVEY.md / README.md mechanically —
  * every round so far re-audited "N queries, M oracle-checked" by hand.
  *
  * oracle_checked = statically declared oracles + the dynamic-oracle
  * queries (q_ivf/q_ivf_idx record literal-centroid SQL at run time, so a
  * cold registry shows them oracle-less but the driver's compare checks
  * them). rows_only is the declared SQL-inexpressible remainder.
  * No SparkSession: the registry is pure construction.
  */
object RegistryCounts {
  def main(args: Array[String]): Unit = {
    val reg      = SparkEntry.registry
    val names    = reg.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate registry names: ${names.diff(names.distinct).mkString(",")}")
    val static   = reg.filter(_.oracle.isDefined).map(_.name).toSet
    val dynamic  = AnnMediaQueries.dynamicOracleNames.filter(n =>
      names.contains(n) && !static.contains(n))
    val rowsOnly = names.filterNot(static).filterNot(dynamic.contains).sorted
    println(s"[counts] registry=${reg.size} " +
      s"oracle_checked=${static.size + dynamic.size} " +
      s"rows_only=${rowsOnly.size} rows_only_names=${rowsOnly.mkString(",")}")
  }
}
