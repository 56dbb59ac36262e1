package graft

import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("registerViews memoizes per dir but re-registers on a dir change") {
    val sf1 = "/root/testdata/sf0.001"
    val sf2 = "/root/testdata/sf0.01"
    Engine.registerViews(spark, sf1, force = true)
    val n1 = Engine.sql(spark, sf1, "SELECT count(*) AS n FROM events").head().getLong(0)
    // same dir again: the memo must keep the views valid (this is the
    // per-execution path every SQL-facade query takes)
    val n1b = Engine.sql(spark, sf1, "SELECT count(*) AS n FROM events").head().getLong(0)
    assert(n1 === n1b)
    // DIFFERENT dir: the memo key includes the dir, so the views must
    // re-point — a session-only key would silently keep serving sf0.001
    val n2 = Engine.sql(spark, sf2, "SELECT count(*) AS n FROM events").head().getLong(0)
    assert(n2 > n1, s"dir change must re-register views (sf0.001=$n1, sf0.01=$n2)")
    // and back
    val n1c = Engine.sql(spark, sf1, "SELECT count(*) AS n FROM events").head().getLong(0)
    assert(n1c === n1)
  }
}
