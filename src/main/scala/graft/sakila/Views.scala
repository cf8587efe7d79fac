package graft.sakila

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The seven stock Sakila views (/root/reference/sql/sakila-schema.sql:
  * 351-471), re-expressed Spark-first. These are the periphery a user of
  * the reference's database would also expect to keep working.
  *
  * Determinism note: MySQL's GROUP_CONCAT without ORDER BY emits rows in
  * whatever order the join produced — nondeterministic in general. Spark's
  * collect_list is likewise shuffle-order-dependent, so every concatenated
  * list here is pinned to an explicit deterministic order (actor_id for
  * the film lists, title/category-name for actor_info, matching its
  * explicit ORDER BY clauses). Values are otherwise byte-faithful.
  *
  * Scale shape: dimensions broadcast; the per-group ordered concat is
  * collect_list + array_sort at group grain (one shuffle per aggregate),
  * never a windowed row_number over the full fan-out.
  */
object Views {

  private def fullName(first: Column, last: Column): Column =
    concat_ws(" ", first, last)

  /** UCASE(SUBSTR(x,1,1)) || LCASE(SUBSTR(x,2)) — the
    * nicer_but_slower_film_list title-casing (sakila-schema.sql:365-367).
    */
  private def titleCase(c: Column): Column =
    concat(upper(c.substr(lit(1), lit(1))), lower(c.substr(lit(2), length(c))))

  /** Ordered GROUP_CONCAT: collect (sortKey, text) structs, sort by the
    * struct (key first), join the texts. Empty groups yield NULL like
    * MySQL's GROUP_CONCAT over no rows (callers reach this via left joins
    * against the aggregated frame, so absent groups are NULL already).
    */
  private def orderedConcat(sortKey: Column, text: Column, sep: String): Column =
    array_join(
      transform(array_sort(collect_list(struct(sortKey.as("k"), text.as("v")))),
        x => x.getField("v")),
      sep)

  /** customer_list (sakila-schema.sql:392-401). */
  def customerList(t: SakilaTables): DataFrame =
    t.customer.select("customer_id", "first_name", "last_name", "address_id", "active", "store_id")
      .join(broadcast(t.address.select("address_id", "address", "postal_code", "phone", "city_id")), "address_id")
      .join(broadcast(t.city.select("city_id", "city", "country_id")), "city_id")
      .join(broadcast(t.country.select("country_id", "country")), "country_id")
      .select(
        col("customer_id").as("ID"),
        fullName(col("first_name"), col("last_name")).as("name"),
        col("address"),
        col("postal_code").as("zip code"),
        col("phone"), col("city"), col("country"),
        when(col("active") === 1, "active").otherwise("").as("notes"),
        col("store_id").as("SID"))

  /** staff_list (sakila-schema.sql:376-390) — same shape, staff side. */
  def staffList(t: SakilaTables): DataFrame =
    t.staff.select("staff_id", "first_name", "last_name", "address_id", "store_id")
      .join(broadcast(t.address.select("address_id", "address", "postal_code", "phone", "city_id")), "address_id")
      .join(broadcast(t.city.select("city_id", "city", "country_id")), "city_id")
      .join(broadcast(t.country.select("country_id", "country")), "country_id")
      .select(
        col("staff_id").as("ID"),
        fullName(col("first_name"), col("last_name")).as("name"),
        col("address"),
        col("postal_code").as("zip code"),
        col("phone"), col("city"), col("country"),
        col("store_id").as("SID"))

  /** Shared shape of film_list / nicer_but_slower_film_list
    * (sakila-schema.sql:351-374): film LEFT category LEFT actor-list.
    * The actor list is pre-aggregated per film (ordered by actor_id) and
    * left-joined, which reproduces MySQL's GROUP BY (film_id, category)
    * grain for any category multiplicity; actor-less films keep NULL
    * actors exactly like GROUP_CONCAT over no rows.
    */
  private def filmListShape(t: SakilaTables, displayName: (Column, Column) => Column): DataFrame = {
    val actors = t.actor.select(col("actor_id"),
      displayName(col("first_name"), col("last_name")).as("aname"))
    val perFilm = t.filmActor.select("film_id", "actor_id")
      .join(broadcast(actors), "actor_id")
      .groupBy("film_id")
      .agg(orderedConcat(col("actor_id"), col("aname"), ", ").as("actors"))
    t.film.select(col("film_id"), col("title"), col("description"),
        col("rental_rate"), col("length"), col("rating"))
      .join(broadcast(t.filmCategory.select("film_id", "category_id")), Seq("film_id"), "left")
      .join(broadcast(t.category.select("category_id", "name")), Seq("category_id"), "left")
      .join(perFilm, Seq("film_id"), "left")
      .select(
        col("film_id").as("FID"), col("title"), col("description"),
        col("name").as("category"), col("rental_rate").as("price"),
        col("length"), col("rating"), col("actors"))
  }

  /** film_list (sakila-schema.sql:351-359). */
  def filmList(t: SakilaTables): DataFrame = filmListShape(t, fullName)

  /** nicer_but_slower_film_list (sakila-schema.sql:362-374): identical
    * but actor names are title-cased via the UCASE/LCASE/SUBSTR chain.
    */
  def nicerButSlowerFilmList(t: SakilaTables): DataFrame =
    filmListShape(t, (f, l) => concat_ws(" ", titleCase(f), titleCase(l)))

  /** sales_by_store (sakila-schema.sql:403-418): revenue per store with
    * the manager's name; grouped at store grain (city/country/manager are
    * functionally dependent on the store and ride along in the key).
    */
  def salesByStore(t: SakilaTables): DataFrame =
    t.payment.select("rental_id", "amount")
      .join(t.rental.select("rental_id", "inventory_id"), "rental_id")
      .join(broadcast(t.inventory.select("inventory_id", "store_id")), "inventory_id")
      .join(broadcast(t.store.select("store_id", "manager_staff_id", "address_id")), "store_id")
      .join(broadcast(t.address.select("address_id", "city_id")), "address_id")
      .join(broadcast(t.city.select("city_id", "city", "country_id")), "city_id")
      .join(broadcast(t.country.select("country_id", "country")), "country_id")
      .join(broadcast(t.staff.select(col("staff_id").as("manager_staff_id"),
        col("first_name"), col("last_name"))), "manager_staff_id")
      .groupBy(col("store_id"),
        concat(col("city"), lit(","), col("country")).as("store"),
        fullName(col("first_name"), col("last_name")).as("manager"),
        col("country"), col("city"))
      .agg(sum(col("amount")).as("total_sales"))
      .orderBy(col("country"), col("city"))
      .select("store", "manager", "total_sales")

  /** sales_by_film_category (sakila-schema.sql:420-431). A film in n
    * categories counts its payments n times — the reference documents
    * that totals exceed 100% by design.
    */
  def salesByFilmCategory(t: SakilaTables): DataFrame =
    t.payment.select("rental_id", "amount")
      .join(t.rental.select("rental_id", "inventory_id"), "rental_id")
      .join(broadcast(t.inventory.select("inventory_id", "film_id")), "inventory_id")
      .join(broadcast(t.filmCategory.select("film_id", "category_id")), "film_id")
      .join(broadcast(t.category.select("category_id", "name")), "category_id")
      .groupBy(col("name").as("category"))
      .agg(sum(col("amount")).as("total_sales"))
      .orderBy(col("total_sales").desc)

  /** actor_info (sakila-schema.sql:445-471) — the nested ordered
    * GROUP_CONCAT: per (actor, category), the actor's titles in that
    * category ordered by title; per actor, the "Category: t1, t2"
    * segments ordered by category name, '; '-separated.
    *
    * The correlated scalar subquery is decorrelated into two grouped
    * aggregates (per-(actor,category) title list, then per-actor segment
    * list) and left-joined back to actor — same two-level shape as the
    * revenue view's mode decorrelation, no per-row subquery execution.
    */
  def actorInfo(t: SakilaTables): DataFrame = {
    val perCat = t.filmActor.select("film_id", "actor_id")
      .join(broadcast(t.filmCategory.select("film_id", "category_id")), "film_id")
      .join(broadcast(t.film.select("film_id", "title")), "film_id")
      .join(broadcast(t.category.select("category_id", "name")), "category_id")
      .groupBy("actor_id", "name")
      .agg(orderedConcat(col("title"), col("title"), ", ").as("titles"))
    val perActor = perCat
      .groupBy("actor_id")
      .agg(orderedConcat(col("name"),
        concat(col("name"), lit(": "), col("titles")), "; ").as("film_info"))
    t.actor.select("actor_id", "first_name", "last_name")
      .join(perActor, Seq("actor_id"), "left")
  }
}
