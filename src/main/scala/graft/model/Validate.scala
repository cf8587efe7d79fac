package graft.model

import graft.io.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Load-time constraint assertions — the Spark form of the reference DDL's
  * PRIMARY KEY / FOREIGN KEY / NOT NULL (sql/sakila-schema.sql:115-131).
  * Each check is one distributed aggregate or anti-join; a violation is a
  * count, never a row fetch, so checks are safe to run at any scale.
  *
  * ONE kernel per rule kind ([[nullsCheck]]/[[pkCheck]]/[[fkCheck]]):
  * the itemized API (notNull/unique/foreignKey), the gated audit report
  * ([[auditFrame]], x52), and the star-wide sweep ([[validateStar]]) all
  * consume the same subplans, so the rule semantics cannot drift between
  * surfaces — and every multi-rule entry point unions its subplans into
  * ONE job instead of launching a Spark job per field.
  *
  * FK semantics follow SQL: a NULL child key REFERENCES NOTHING and is
  * NOT a violation (it is the not-null check's business, where declared)
  * — counting NULLs as orphans would fail perfectly valid data with
  * optional references.
  */
object Validate {

  final case class Violation(table: String, rule: String, count: Long)

  /** (tbl, rule, violations) one-row subplan. */
  private def check(tbl: String, rule: String, cnt: DataFrame): DataFrame =
    cnt.select(lit(tbl).as("tbl"), lit(rule).as("rule"), col("violations"))

  private def nullsCheck(df: DataFrame, tbl: String, c: String): DataFrame =
    check(tbl, s"not_null_$c",
      df.agg(count(when(col(c).isNull, 1)).as("violations")))

  private def pkCheck(df: DataFrame, tbl: String, keys: Seq[String]): DataFrame =
    check(tbl, s"pk_unique_${keys.mkString(",")}",
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .agg(count(lit(1)).as("violations")))

  private def fkCheck(child: DataFrame, tbl: String, ck: String,
      parent: DataFrame, pk: String): DataFrame =
    check(tbl, s"fk_$ck",
      child.select(col(ck))
        .filter(col(ck).isNotNull) // SQL FK: NULL references nothing
        .join(parent.select(col(pk)), col(ck) === col(pk), "left_anti")
        .agg(count(lit(1)).as("violations")))

  /** Union the subplans into ONE job and keep only actual violations. */
  private def collectViolations(checks: Seq[DataFrame]): Seq[Violation] =
    checks.reduce(_.unionAll(_)).filter(col("violations") > 0)
      .collect()
      .map(r => Violation(r.getString(0), r.getString(1), r.getLong(2))).toSeq

  /** Fields declared non-nullable must contain no nulls — one fused job
    * over all fields, not a count() per field. */
  def notNull(df: DataFrame, table: String, schema: StructType): Seq[Violation] = {
    val fields = schema.fields.filterNot(_.nullable).toSeq
    if (fields.isEmpty) Nil
    else collectViolations(fields.map(f => nullsCheck(df, table, f.name)))
  }

  /** Primary-key uniqueness. */
  def unique(df: DataFrame, table: String, keys: Seq[String]): Seq[Violation] =
    collectViolations(Seq(pkCheck(df, table, keys)))

  /** Referential integrity: NON-NULL child keys with no parent. */
  def foreignKey(child: DataFrame, childTable: String, childKey: String,
      parent: DataFrame, parentKey: String): Seq[Violation] =
    collectViolations(Seq(fkCheck(child, childTable, childKey, parent, parentKey)))

  /** The constraint audit as ONE DataFrame — every check emits its row
    * (violations = 0 when clean), so the result is a fixed-shape report
    * rather than driver-side assertions: the form a data-quality
    * dashboard reads, and the form the driver's DuckDB oracle can gate
    * (x52). Each check is a tiny aggregate/anti-join subplan unioned at
    * the end; nothing collects to the driver.
    */
  def auditFrame(t: Tables): DataFrame =
    Seq(
      nullsCheck(t.orders, "orders", "o_custkey"),
      nullsCheck(t.lineitem, "lineitem", "l_orderkey"),
      nullsCheck(t.customer, "customer", "c_custkey"),
      pkCheck(t.customer, "customer", Seq("c_custkey")),
      pkCheck(t.orders, "orders", Seq("o_orderkey")),
      pkCheck(t.nation, "nation", Seq("n_nationkey")),
      pkCheck(t.region, "region", Seq("r_regionkey")),
      fkCheck(t.orders, "orders", "o_custkey", t.customer, "c_custkey"),
      fkCheck(t.lineitem, "lineitem", "l_orderkey", t.orders, "o_orderkey"),
      fkCheck(t.lineitem, "lineitem", "l_partkey", t.part, "p_partkey"),
      fkCheck(t.customer, "customer", "c_nationkey", t.nation, "n_nationkey"),
      fkCheck(t.nation, "nation", "n_regionkey", t.region, "r_regionkey"))
      .reduce(_.unionAll(_))
      .orderBy("tbl", "rule")

  /** The star schema's full constraint set — every non-nullable field of
    * the three big tables, the four entity PKs, and the five FK edges —
    * fused into ONE collected job. */
  def validateStar(t: Tables): Seq[Violation] = {
    val nn = Seq(
      ("customer", t.customer, Schemas.customer),
      ("orders", t.orders, Schemas.orders),
      ("lineitem", t.lineitem, Schemas.lineitem)).flatMap {
      case (tbl, df, sch) =>
        sch.fields.filterNot(_.nullable).toSeq.map(f => nullsCheck(df, tbl, f.name))
    }
    val pks = Seq(
      pkCheck(t.customer, "customer", Seq("c_custkey")),
      pkCheck(t.orders, "orders", Seq("o_orderkey")),
      // NOTE: unlike TPC-H proper, the synthetic generator does NOT make
      // (l_orderkey, l_linenumber) unique (1161 duplicate pairs at
      // sf0.001) — lineitem has no declared PK here; queries treat it as
      // a pure fact log, never as an entity keyed by line number.
      pkCheck(t.nation, "nation", Seq("n_nationkey")),
      pkCheck(t.region, "region", Seq("r_regionkey")))
    val fks = Seq(
      fkCheck(t.orders, "orders", "o_custkey", t.customer, "c_custkey"),
      fkCheck(t.lineitem, "lineitem", "l_orderkey", t.orders, "o_orderkey"),
      fkCheck(t.lineitem, "lineitem", "l_partkey", t.part, "p_partkey"),
      fkCheck(t.customer, "customer", "c_nationkey", t.nation, "n_nationkey"),
      fkCheck(t.nation, "nation", "n_regionkey", t.region, "r_regionkey"))
    collectViolations(nn ++ pks ++ fks)
  }
}
