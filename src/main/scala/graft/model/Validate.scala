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
