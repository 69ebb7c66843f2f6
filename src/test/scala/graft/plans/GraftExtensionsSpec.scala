package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.plans.GraftExtensions` must give a STOCK
  * session the whole engine surface — SQL functions resolvable with no
  * imperative registration, plus the planner additions. The spec builds a
  * separate SparkSession (sharing the JVM's SparkContext) and restores
  * the default session afterwards so sibling suites are unaffected.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a fresh session with the extension resolves the custom SQL functions") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions rather than the spark.sql.extensions conf: the conf
    // is a STATIC one read from the SparkContext, so it only applies on a
    // fresh context — this spec runs in a JVM whose context sibling
    // suites already created. Same extension class either way.
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT graft_dot_f(array(cast(1.0 as float), cast(2.0 as float)), " +
          "array(cast(3.0 as float), cast(4.0 as float))) AS d").head().getDouble(0)
      assert(dot === 11.0)
      val parity = spark.sql("SELECT graft_parity_vec('ab') AS p").head()
        .getSeq[Int](0)
      assert(parity === Seq(1, -1))
      val sh = spark.sql(
        "SELECT graft_shingles(array('x', 'y', 'z'), 2) AS s").head()
        .getSeq[String](0)
      assert(sh === Seq("x y", "y z"))
    } finally {
      // do NOT stop(): the SparkContext is shared with sibling suites
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }
}
