package graft.model

import graft.io.Tables
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed Dataset surface for the star schema — case-class Encoders give
  * compile-checked field access where the query shape is static (the
  * loader layer; SURVEY.md §1.3). The untyped DataFrame registry remains
  * the dynamic-schema path; both share the same scans.
  */
object Typed {

  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp, o_orderpriority: String)

  final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
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
