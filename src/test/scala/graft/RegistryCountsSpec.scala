package graft

import graft.queries.AnnMediaQueries
import org.scalatest.funsuite.AnyFunSuite

/** Pins the assumptions scripts/check_counts.sh builds on: unique names,
  * the dynamic-oracle list naming real registry entries that are indeed
  * oracle-less when cold, and the rows-only remainder being exactly the
  * declared SQL-inexpressible set (sketch trio + BPE trainer). A registry edit that breaks
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

  test("rows-only remainder is exactly the declared sketch trio + BPE trainer") {
    val static  = reg.filter(_.oracle.isDefined).map(_.name).toSet
    val rowsOnly = reg.map(_.name)
      .filterNot(static)
      .filterNot(AnnMediaQueries.dynamicOracleNames.contains)
      .toSet
    assert(rowsOnly == Set("q_approxd", "q_approxq", "q_hll", "q_bpe_train"),
      s"rows-only set drifted: $rowsOnly")
  }

  // ------------------------------------------------------------------
  // Doc-count sync (VERDICT r12 item 2): the claims written in SURVEY.md
  // and README.md must match the registry. scripts/check_counts.sh checks
  // the same anchors, but a standalone script can be forgotten — asserting
  // here makes `sbt test` itself go red on drift. Same regex anchors as
  // the script (files collapsed to one line first, multi-line-claim safe).
  // ------------------------------------------------------------------

  private val registrySize = reg.size
  private val oracleChecked = {
    val static  = reg.filter(_.oracle.isDefined).map(_.name).toSet
    val dynamic = AnnMediaQueries.dynamicOracleNames
      .filter(n => reg.exists(_.name == n) && !static.contains(n))
    static.size + dynamic.size
  }

  private def docLine(path: String): String = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.mkString.replace('\n', ' ') finally src.close()
  }

  private def claims(text: String, re: scala.util.matching.Regex): Seq[Int] =
    re.findAllMatchIn(text).map(_.group(1).toInt).toSeq

  test("SURVEY.md count claims match the registry") {
    val t = docLine("SURVEY.md")
    val regClaims = claims(t, raw"declares (\d+) queries".r)
    val orcClaims = claims(t, raw"queries \((\d+) oracle-checked\)".r)
    assert(regClaims.nonEmpty && regClaims.forall(_ == registrySize),
      s"SURVEY.md 'declares N queries' claims $regClaims != $registrySize")
    assert(orcClaims.nonEmpty && orcClaims.forall(_ == oracleChecked),
      s"SURVEY.md '(M oracle-checked)' claims $orcClaims != $oracleChecked")
    val pairs = raw"(\d+) queries, (\d+) oracle-checked".r
      .findAllMatchIn(t).map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    assert(pairs.nonEmpty && pairs.forall(_ == (registrySize, oracleChecked)),
      s"SURVEY.md paired claims $pairs != ($registrySize, $oracleChecked)")
  }

  test("README.md count claims match the registry") {
    val t = docLine("README.md")
    val regClaims = claims(t, raw"(\d+) declared queries".r)
    val orcClaims = claims(t, raw"(\d+) are hash-checked".r)
    assert(regClaims.nonEmpty && regClaims.forall(_ == registrySize),
      s"README.md 'N declared queries' claims $regClaims != $registrySize")
    assert(orcClaims.nonEmpty && orcClaims.forall(_ == oracleChecked),
      s"README.md 'M are hash-checked' claims $orcClaims != $oracleChecked")
  }
}
