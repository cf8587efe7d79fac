package graft.model

import graft.io.Tables
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed Dataset surface for the star schema — case-class Encoders give
  * compile-checked field access where the query shape is static (the
  * loader layer; SURVEY.md §1.3). The untyped DataFrame registry remains
  * the dynamic-schema path; both share the same scans.
  *
  * Field nullability MIRRORS [[Schemas]]: columns the schema declares
  * nullable (the money/measure doubles) are `Option[Double]` here — a
  * primitive `Double` would make the typed surface STRICTER than the
  * contract it claims to mirror, crashing the decode
  * ("Null value appeared in non-nullable field") on the first NULL the
  * declared schema permits.
  */
object Typed {

  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Option[Double], c_mktsegment: String)

  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Option[Double], o_orderdate: java.sql.Timestamp,
      o_orderpriority: String)

  final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Option[Double],
      l_extendedprice: Option[Double], l_discount: Option[Double],
      l_tax: Option[Double], l_returnflag: String,
      l_linestatus: String, l_shipdate: java.sql.Timestamp)

  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables(spark, dir).customer.as[Customer]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables(spark, dir).orders.as[Order]
  }

  def lineitems(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables(spark, dir).lineitem.as[Lineitem]
  }
}
