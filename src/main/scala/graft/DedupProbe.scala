package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.io.Tables(spark, dir).documents
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[dprobe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s (rows=$n)")
    }
    timed("shingles (cached build)") { graft.ext.Dedup.shingles(docs).count() }
    timed("shingles again (cache hit)") { graft.ext.Dedup.shingles(docs).count() }
    timed("signatures (cached build)") { graft.ext.Dedup.minhashSignatures(docs).count() }
    timed("lsh pairs") { graft.ext.Dedup.lshDedupPairs(docs, 0.3).count() }
    timed("clusters") {
      val (labels, rounds) = graft.ext.Dedup.duplicateClustersWithRounds(docs, 0.3)
      val n = labels.count()
      println(s"[dprobe] cluster rounds to convergence: $rounds")
      n
    }
    timed("ann clusters (x60 path)") {
      val emb = graft.io.Tables(spark, dir).embeddings
      val (labels, rounds) = graft.ext.Similarity.annClustersWithRounds(emb, 0.4)
      val n = labels.count()
      println(s"[dprobe] ann cluster rounds to convergence: $rounds")
      n
    }
    spark.stop()
  }
}
