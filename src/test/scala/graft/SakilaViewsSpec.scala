package graft

import graft.sakila.{SakilaTables, Views}
import org.apache.spark.sql.Row

/** The seven stock Sakila views on the real fixtures. Expected values are
  * computed independently from the reference data dump (DuckDB replay of
  * the view SQL with the same pinned concat orders), embedded as
  * constants.
  */
class SakilaViewsSpec extends SparkSuite {

  private val fixtures = getClass.getResource("/sakila").getPath
  private lazy val t = SakilaTables(spark, fixtures)

  test("customer_list: 599 rows, exact row for customer 1") {
    val cl = Views.customerList(t).cache()
    assert(cl.count() === 599)
    val r = cl.filter(cl("ID") === 1).collect().head
    assert(r === Row(1, "MARY SMITH", "1913 Hanoi Way", "35200", "28303384290",
      "Sasebo", "Japan", "active", 1))
  }

  test("staff_list: both staff with their store geography") {
    val rows = Views.staffList(t).orderBy("ID")
      .select("ID", "name", "address", "city", "country", "SID").collect()
    assert(rows(0) === Row(1, "Mike Hillyer", "23 Workhaven Lane", "Lethbridge", "Canada", 1))
    assert(rows(1) === Row(2, "Jon Stephens", "1411 Lillydale Drive", "Woodridge", "Australia", 2))
  }

  test("film_list: 1000 rows; film 1 carries category and actor_id-ordered actors") {
    val fl = Views.filmList(t).cache()
    assert(fl.count() === 1000)
    val r = fl.filter(fl("FID") === 1).collect().head
    assert(r.getAs[String]("title") === "ACADEMY DINOSAUR")
    assert(r.getAs[String]("category") === "Documentary")
    assert(r.getAs[java.math.BigDecimal]("price").toString === "0.99")
    assert(r.getAs[Int]("length") === 86)
    assert(r.getAs[String]("rating") === "PG")
    assert(r.getAs[String]("actors") ===
      "PENELOPE GUINESS, CHRISTIAN GABLE, LUCILLE TRACY, SANDRA PECK, JOHNNY CAGE, " +
      "MENA TEMPLE, WARREN NOLTE, OPRAH KILMER, ROCK DUKAKIS, MARY KEITEL")
  }

  test("nicer_but_slower_film_list: title-cased actor names, same grain") {
    val fl = Views.nicerButSlowerFilmList(t).cache()
    assert(fl.count() === 1000)
    val r = fl.filter(fl("FID") === 1).collect().head
    assert(r.getAs[String]("actors") ===
      "Penelope Guiness, Christian Gable, Lucille Tracy, Sandra Peck, Johnny Cage, " +
      "Mena Temple, Warren Nolte, Oprah Kilmer, Rock Dukakis, Mary Keitel")
  }

  test("sales_by_store: two stores, country-ordered, exact totals") {
    val rows = Views.salesByStore(t).collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("store") === "Woodridge,Australia")
    assert(rows(0).getAs[String]("manager") === "Jon Stephens")
    assert(rows(0).getAs[java.math.BigDecimal]("total_sales").toString === "33726.77")
    assert(rows(1).getAs[String]("store") === "Lethbridge,Canada")
    assert(rows(1).getAs[String]("manager") === "Mike Hillyer")
    assert(rows(1).getAs[java.math.BigDecimal]("total_sales").toString === "33679.79")
  }

  test("sales_by_film_category: 16 categories, Sports leads") {
    val rows = Views.salesByFilmCategory(t).collect()
    assert(rows.length === 16)
    assert(rows(0).getAs[String]("category") === "Sports")
    assert(rows(0).getAs[java.math.BigDecimal]("total_sales").toString === "5314.21")
    assert(rows(1).getAs[String]("category") === "Sci-Fi")
    assert(rows(2).getAs[String]("category") === "Animation")
  }

  test("actor_info: 200 actors; nested ordered group-concat matches the reference shape") {
    val ai = Views.actorInfo(t).cache()
    assert(ai.count() === 200)
    val r = ai.filter(ai("actor_id") === 1).collect().head
    assert(r.getAs[String]("first_name") === "PENELOPE")
    assert(r.getAs[String]("last_name") === "GUINESS")
    assert(r.getAs[String]("film_info") ===
      "Animation: ANACONDA CONFESSIONS; Children: LANGUAGE COWBOY; " +
      "Classics: COLOR PHILADELPHIA, WESTWARD SEABISCUIT; Comedy: VERTIGO NORTHWEST; " +
      "Documentary: ACADEMY DINOSAUR; Family: KING EVOLUTION, SPLASH GUMP; " +
      "Foreign: MULHOLLAND BEAST; Games: BULWORTH COMMANDMENTS, HUMAN GRAFFITI; " +
      "Horror: ELEPHANT TROJAN, LADY STAGE, RULES HUMAN; Music: WIZARD COLDBLOODED; " +
      "New: ANGELS LIFE, OKLAHOMA JUMANJI; Sci-Fi: CHEAPER CLYDE; " +
      "Sports: GLEAMING JAWBREAKER")
  }
}
