package graft

import graft.queries.AnnMediaQueries
import org.scalatest.funsuite.AnyFunSuite

/** Pins the assumptions scripts/check_counts.sh builds on: unique names,
  * the dynamic-oracle list naming real registry entries that are indeed
  * oracle-less when cold, and the rows-only remainder being exactly the
  * three declared SQL-inexpressible sketches. A registry edit that breaks
  * any of these would silently skew the doc-count gate's arithmetic. */
class RegistryCountsSpec extends AnyFunSuite {

  private val reg = SparkEntry.registry

  test("registry names are unique") {
    val names = reg.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct).mkString(",")}")
  }

  test("dynamic-oracle names are registry entries, oracle-less when cold") {
    val byName = reg.map(d => d.name -> d).toMap
    AnnMediaQueries.dynamicOracleNames.foreach { n =>
      assert(byName.contains(n), s"$n not in registry")
      assert(byName(n).oracle.isEmpty,
        s"$n has a static oracle — drop it from dynamicOracleNames")
    }
  }

  test("rows-only remainder is exactly the declared sketch trio") {
    val static  = reg.filter(_.oracle.isDefined).map(_.name).toSet
    val rowsOnly = reg.map(_.name)
      .filterNot(static)
      .filterNot(AnnMediaQueries.dynamicOracleNames.contains)
      .toSet
    assert(rowsOnly == Set("q_approxd", "q_approxq", "q_hll"),
      s"rows-only set drifted: $rowsOnly")
  }
}
