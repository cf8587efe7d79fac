package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions installs dot_product on a session built WITHOUT any
  * imperative registration — the spark.sql.extensions deployment path.
  *
  * Extensions bind only at session CREATION: getOrCreate would silently
  * hand back the suite-shared session and ignore withExtensions, so this
  * spec clears the default/active session, builds a genuinely new one,
  * and restores the shared one afterwards (the SparkContext is reused —
  * only the session layer is new, which is exactly what extensions bind
  * to).
  */
class ExtensionsInstallSpec extends AnyFunSuite {

  test("spark.sql.extensions-style install exposes dot_product to pure SQL") {
    val previous = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect().head.getDouble(0)
      assert(r === 32.0)
      // Resolvable catalog function, not a temp registration.
      assert(spark.catalog.functionExists("dot_product"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      previous.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
