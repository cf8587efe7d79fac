package graft.model

import graft.io.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Load-time constraint assertions — the Spark form of the reference DDL's
  * PRIMARY KEY / FOREIGN KEY / NOT NULL (sql/sakila-schema.sql:115-131).
  * Each check is one distributed aggregate or anti-join; a violation is a
  * count, never a row fetch, so checks are safe to run at any scale.
  */
object Validate {

  final case class Violation(table: String, rule: String, count: Long)

  /** Fields declared non-nullable must contain no nulls. */
  def notNull(df: DataFrame, table: String, schema: StructType): Seq[Violation] =
    schema.fields.filterNot(_.nullable).toSeq.flatMap { f =>
      val n = df.filter(col(f.name).isNull).count()
      if (n > 0) Some(Violation(table, s"NOT NULL ${f.name}", n)) else None
    }

  /** Primary-key uniqueness. */
  def unique(df: DataFrame, table: String, keys: Seq[String]): Seq[Violation] = {
    val dupes = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    if (dupes > 0) Seq(Violation(table, s"UNIQUE(${keys.mkString(",")})", dupes)) else Nil
  }

  /** Referential integrity: child keys with no parent (anti-join). */
  def foreignKey(child: DataFrame, childTable: String, childKey: String,
      parent: DataFrame, parentKey: String): Seq[Violation] = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey)), col(childKey) === col(parentKey), "left_anti")
      .count()
    if (orphans > 0) Seq(Violation(childTable, s"FK $childKey", orphans)) else Nil
  }

  /** The constraint audit as ONE DataFrame — every check emits its row
    * (violations = 0 when clean), so the result is a fixed-shape report
    * rather than driver-side assertions: the form a data-quality
    * dashboard reads, and the form the driver's DuckDB oracle can gate
    * (x52). Each check is a tiny aggregate/anti-join subplan unioned at
    * the end; nothing collects to the driver.
    */
  def auditFrame(t: Tables): DataFrame = {
    def check(tbl: String, rule: String, cnt: DataFrame): DataFrame =
      cnt.select(lit(tbl).as("tbl"), lit(rule).as("rule"), col("violations"))
    def nulls(df: DataFrame, tbl: String, c: String): DataFrame =
      check(tbl, s"not_null_$c",
        df.agg(count(when(col(c).isNull, 1)).as("violations")))
    def pk(df: DataFrame, tbl: String, key: String): DataFrame =
      check(tbl, s"pk_unique_$key",
        df.groupBy(key).agg(count(lit(1)).as("n")).filter(col("n") > 1)
          .agg(count(lit(1)).as("violations")))
    def fk(child: DataFrame, tbl: String, ck: String,
        parent: DataFrame, pk_ : String): DataFrame =
      check(tbl, s"fk_$ck",
        child.select(col(ck))
          .join(parent.select(col(pk_)), col(ck) === col(pk_), "left_anti")
          .agg(count(lit(1)).as("violations")))
    Seq(
      nulls(t.orders, "orders", "o_custkey"),
      nulls(t.lineitem, "lineitem", "l_orderkey"),
      nulls(t.customer, "customer", "c_custkey"),
      pk(t.customer, "customer", "c_custkey"),
      pk(t.orders, "orders", "o_orderkey"),
      pk(t.nation, "nation", "n_nationkey"),
      pk(t.region, "region", "r_regionkey"),
      fk(t.orders, "orders", "o_custkey", t.customer, "c_custkey"),
      fk(t.lineitem, "lineitem", "l_orderkey", t.orders, "o_orderkey"),
      fk(t.lineitem, "lineitem", "l_partkey", t.part, "p_partkey"),
      fk(t.customer, "customer", "c_nationkey", t.nation, "n_nationkey"),
      fk(t.nation, "nation", "n_regionkey", t.region, "r_regionkey"))
      .reduce(_.unionAll(_))
      .orderBy("tbl", "rule")
  }

  /** The star schema's full constraint set in one pass. */
  def validateStar(t: Tables): Seq[Violation] =
    notNull(t.customer, "customer", Schemas.customer) ++
      notNull(t.orders, "orders", Schemas.orders) ++
      notNull(t.lineitem, "lineitem", Schemas.lineitem) ++
      unique(t.customer, "customer", Seq("c_custkey")) ++
      unique(t.orders, "orders", Seq("o_orderkey")) ++
      // NOTE: unlike TPC-H proper, the synthetic generator does NOT make
      // (l_orderkey, l_linenumber) unique (1161 duplicate pairs at
      // sf0.001) — lineitem has no declared PK here; queries treat it as
      // a pure fact log, never as an entity keyed by line number.
      unique(t.nation, "nation", Seq("n_nationkey")) ++
      unique(t.region, "region", Seq("r_regionkey")) ++
      foreignKey(t.orders, "orders", "o_custkey", t.customer, "c_custkey") ++
      foreignKey(t.lineitem, "lineitem", "l_orderkey", t.orders, "o_orderkey") ++
      foreignKey(t.lineitem, "lineitem", "l_partkey", t.part, "p_partkey") ++
      foreignKey(t.customer, "customer", "c_nationkey", t.nation, "n_nationkey") ++
      foreignKey(t.nation, "nation", "n_regionkey", t.region, "r_regionkey")
}
