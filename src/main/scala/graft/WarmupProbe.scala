package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object WarmupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val t = graft.io.Tables(spark, dir)
    timed("raw scans (count orders+lineitem)") {
      t.orders.count(); t.lineitem.count()
    }
    val liOrders = t.lineitem.join(t.orders.select("o_orderkey","o_custkey","o_orderdate"),
      col("l_orderkey") === col("o_orderkey"))
    timed("fact join + rev agg") {
      liOrders.groupBy("o_custkey").agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    val withCat = liOrders.join(broadcast(t.part.select("p_partkey","p_type")), col("l_partkey")===col("p_partkey"))
    timed("cat agg with DeterministicMode") {
      withCat.groupBy("o_custkey").agg(graft.functions.DeterministicMode(col("p_type"))).write.format("noop").mode("overwrite").save()
    }
    timed("cat agg with window-mode") {
      val c = withCat.groupBy("o_custkey", "p_type").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey")).orderBy(col("cnt").desc, col("p_type").asc)
      c.withColumn("rn", row_number().over(w)).filter(col("rn")===1).write.format("noop").mode("overwrite").save()
    }
    timed("full view build + cache") {
      graft.warehouse.View.dw(spark, dir).count()
    }
    spark.stop()
  }
}
