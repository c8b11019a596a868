package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway r6 diagnostics main (not part of the driver surface). */
object QProbe {
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
  def t(tag: String)(f: => Unit): Unit = {
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag rep$i ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    t("full_lsh") { noop(graft.operators.Ann.cosineLsh(e, q, 5, bits = 5, tables = 16, dimHint = Some(64))) }

    // manual stages
    val bp = spark.sparkContext.broadcast(graft.operators.Ann.planes(16, 5, 64))
    def buckets = udf { (vec: Seq[Float]) =>
      val pl = bp.value
      val out = new Array[Long](16)
      var tt = 0
      while (tt < 16) {
        var b = 0L; var p = 0
        while (p < 5) {
          val plane = pl(tt * 5 + p)
          var s = 0.0; var i = 0
          while (i < 64) { s += vec(i).toDouble * plane(i); i += 1 }
          if (s > 0) b |= (1L << p)
          p += 1
        }
        out(tt) = b; tt += 1
      }
      out
    }
    val dSide = e.repartition(32).withColumn("__bs", buckets(col("embedding")))
      .select(col("*"), posexplode(col("__bs")).as(Seq("__t", "__bucket"))).drop("__bs")
    val qSide = q.withColumn("__bs", buckets(col("qvec")))
      .select(col("*"), posexplode(col("__bs")).as(Seq("__t", "__bucket"))).drop("__bs")

    t("scan_only") { noop(e) }
    t("scan_repart") { noop(e.repartition(32)) }
    t("scan_udf") { noop(e.withColumn("__bs", buckets(col("embedding")))) }
    t("scan_repart_udf") { noop(e.repartition(32).withColumn("__bs", buckets(col("embedding")))) }
    t("scan_udf_explode") { noop(e.withColumn("__bs", buckets(col("embedding"))).select(col("*"), posexplode(col("__bs")).as(Seq("__t", "__bucket"))).drop("__bs")) }
    t("d_side_only") { noop(dSide) }
    val joined = dSide.join(broadcast(qSide), Seq("__t", "__bucket"))
      .where(col("vec_id") =!= col("qid"))
    t("join_only") { noop(joined) }
    val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
      var s = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        s += x * y; na += x * x; nb += y * y
        i += 1
      }
      s / (math.sqrt(na) * math.sqrt(nb))
    }
    val scored = joined.withColumn("cosine", cosineUdf(col("embedding"), col("qvec")))
    t("scored") { noop(scored) }
    val grouped = scored.groupBy(col("qid"), col("vec_id")).agg(max(col("cosine")).as("cosine"))
    t("grouped") { noop(grouped) }
    spark.stop()
  }
}
