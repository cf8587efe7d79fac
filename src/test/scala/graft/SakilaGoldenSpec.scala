package graft

import graft.sakila.{Sakila, SakilaTables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** Golden-output fidelity against the reference's committed results
  * (/root/reference/data/dw.csv, q1.csv..q11.csv) on the real Sakila
  * fixtures. Comparison contract (SURVEY.md §5.2, FIXTURES.md §3):
  * decimal-exact values, order-insensitive (golden sort ties are MySQL-
  * arbitrary), and tie-tolerant for the mode column (golden embeds
  * arbitrary tie picks for 233 of 599 customers).
  */
class SakilaGoldenSpec extends SparkSuite {
  import spark.implicits._

  private val fixtures = getClass.getResource("/sakila").getPath
  private val goldenDir = "/root/reference/data"

  private lazy val t = SakilaTables(spark, fixtures)
  private lazy val dw = Sakila.revenueView(t).cache()
  private lazy val q = Sakila.queries(dw)

  /** Render every column as the golden CSV renders it. */
  private def rendered(df: DataFrame): Seq[String] = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType => date_format(col(f.name), "yyyy-MM-dd HH:mm:ss")
        case _: DecimalType => col(f.name).cast("string")
        case _ => col(f.name).cast("string")
      }
    }
    df.select(cols: _*).collect().map(_.mkString("")).toSeq
  }

  private def golden(name: String, drop: Set[Int] = Set.empty): Seq[String] = {
    val lines = scala.io.Source.fromFile(s"$goldenDir/$name.csv")("UTF-8").getLines().toList
    lines.tail.map { l =>
      // Quoted-field-aware CSV split (golden quotes only when needed).
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inQ = false
      var i = 0
      while (i < l.length) {
        val c = l(i)
        if (inQ) {
          if (c == '"' && i + 1 < l.length && l(i + 1) == '"') { sb.append('"'); i += 1 }
          else if (c == '"') inQ = false
          else sb.append(c)
        } else if (c == '"') inQ = true
        else if (c == ',') { out += sb.result(); sb.clear() }
        else sb.append(c)
        i += 1
      }
      out += sb.result()
      out.zipWithIndex.filterNot { case (_, ix) => drop(ix) }
        .map(_._1).mkString("")
    }
  }

  private def assertMultisetEqual(ours: Seq[String], gold: Seq[String], what: String): Unit = {
    val extra = ours.diff(gold)
    val missing = gold.diff(ours)
    assert(extra.isEmpty && missing.isEmpty,
      s"$what: ${extra.size} extra / ${missing.size} missing;" +
        s" e.g. extra=${extra.take(2)} missing=${missing.take(2)}")
  }

  test("dw.csv: all 13 columns match (mode column tie-tolerant)") {
    // Winner sets for the mode column, derived from the fixtures.
    val counts = t.rental.select("customer_id", "inventory_id")
      .join(t.inventory.select("inventory_id", "film_id"), "inventory_id")
      .join(t.filmCategory.select("film_id", "category_id"), "film_id")
      .join(t.category.select("category_id", "name"), "category_id")
      .groupBy("customer_id", "name").agg(count(lit(1)).as("cnt"))
    val winners = counts
      .withColumn("mx", max("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy("customer_id")))
      .filter(col("cnt") === col("mx"))
      .groupBy("customer_id").agg(collect_set("name").as("ws"))
      .as[(Int, Seq[String])].collect().toMap

    val goldRows = golden("dw").map(_.split(""))
    val ourRows = rendered(dw).map(_.split(""))
    assert(ourRows.length === 599 && goldRows.length === 599)
    val ourById = ourRows.map(r => r(0).toInt -> r).toMap
    goldRows.foreach { g =>
      val id = g(0).toInt
      val o = ourById(id)
      (0 until 13).foreach { i =>
        if (i == 6) { // Most_Frequent_Category: tie-tolerant
          assert(winners(id).contains(g(6)), s"golden mode ${g(6)} not a winner for $id")
          assert(winners(id).contains(o(6)), s"our mode ${o(6)} not a winner for $id")
        } else assert(o(i) === g(i), s"customer $id col $i: ours=${o(i)} golden=${g(i)}")
      }
    }
  }

  test("q1/q2/q3/q5/q7 match golden as multisets") {
    assertMultisetEqual(rendered(q("q1")), golden("q1"), "q1")
    assertMultisetEqual(rendered(q("q2")), golden("q2"), "q2")
    assertMultisetEqual(rendered(q("q3")), golden("q3"), "q3")
    assertMultisetEqual(rendered(q("q5")), golden("q5"), "q5")
    assertMultisetEqual(rendered(q("q7")), golden("q7"), "q7")
  }

  test("q4/q8/q9/q10/q11 match golden as multisets") {
    assertMultisetEqual(rendered(q("q4")), golden("q4"), "q4")
    assertMultisetEqual(rendered(q("q8")), golden("q8"), "q8")
    assertMultisetEqual(rendered(q("q9")), golden("q9"), "q9")
    assertMultisetEqual(rendered(q("q10")), golden("q10"), "q10")
    assertMultisetEqual(rendered(q("q11")), golden("q11"), "q11")
  }

  test("q6: self-consistent with our dw; conserves golden totals") {
    // q6 groups customers by their mode pick — 233 ties make per-category
    // counts depend on the arbitrary pick, so cross-engine equality is
    // only defined on the conserved aggregates (SURVEY.md §2.9.2).
    val ours = q("q6")
    assert(ours.count() === 16)
    assert(ours.agg(sum("Customers_Who_Rent_This_Genre")).first().getLong(0) === 599)
    val ourTotal = ours.agg(sum("Total_Revenue")).first().getDecimal(0)
    val goldTotal = golden("q6").map(_.split("")(2))
      .map(new java.math.BigDecimal(_)).reduce(_ add _)
    assert(ourTotal.compareTo(goldTotal) === 0)
  }

  test("known smoke values from SURVEY.md §5.2") {
    val top = q("q1").limit(1).as[(String, java.math.BigDecimal)].first()
    assert(top._1 === "KARL SEAL" && top._2.toString === "221.55")
    assert(dw.agg(sum("Total_Rentals")).first().getLong(0) === 16044L)
    assert(dw.agg(sum("Total_Late_Fees")).first().getDecimal(0).toString === "10096.00")
  }
}
