package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway r6 diagnostics main (not part of the driver surface). */
object QProbe {
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
  def t(tag: String)(f: => Unit): Unit = {
    (1 to 4).foreach { i =>
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

    val sm = udf((i: Long) => graft.model.Fixtures.splitmix64(i))
    def events = spark.read.parquet(s"$d/events.parquet")
    def base = events.select(col("event_id").as("image_id"),
      sm(col("event_id")).as("phash"))
    def clones = base.where(col("image_id") % 101 === 0)
      .select((col("image_id") + 10000000L).as("image_id"),
        col("phash").bitwiseXOR(lit(3L)).as("phash"))
    def imgs = base.unionByName(clones)

    // warm
    noop(graft.operators.ImageOps.phashNearDupPairs(imgs, maxHamming = 3)
      .orderBy("id_a", "id_b"))

    t("phash_full") {
      noop(graft.operators.ImageOps.phashNearDupPairs(imgs, maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b"))
    }

    def sproj = imgs.select(col("image_id").as("__id"), col("phash").as("__sig"))
    def banded = sproj.select(col("__id"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("b"),
        call_function("shiftrightunsigned", col("__sig"), lit(b * 16))
          .bitwiseAND(lit(0xffffL)).as("k"))): _*)).as("band"), col("__sig"))
      .select(col("__id"), col("band.b").as("__bb"), col("band.k").as("__bk"), col("__sig"))

    def candWith = graft.operators.TextOps.bucketCandidatesCarrying(
      banded, Seq("__bb", "__bk"), 1024, Seq("__sig"))
    t("cand_observe") { noop(candWith) }

    // identical pipeline minus the observe node
    locally {
      import org.apache.spark.sql.types._
      val np = 32
      val parted = banded.select(col("__id"), col("__bb"), col("__bk"), col("__sig"))
        .repartition(np, col("__bb"), col("__bk"))
        .sortWithinPartitions(col("__bb"), col("__bk"), col("__id"))
      val outSchema = StructType(Seq(
        StructField("id_a", LongType, false), StructField("id_b", LongType, false),
        StructField("__bn", LongType, false),
        StructField("__sig_a", LongType, false), StructField("__sig_b", LongType, false)))
      def pairs = parted.mapPartitions { it =>
        val ids = new scala.collection.mutable.ArrayBuffer[Long](64)
        val sigs = new scala.collection.mutable.ArrayBuffer[Long](64)
        var curB = -1; var curK = -1L; var started = false
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        def flush(): Unit = {
          val n = ids.length
          if (n > 1) {
            var i = 0
            while (i < n) { var j = i + 1; while (j < n) {
              out += org.apache.spark.sql.Row(ids(i), ids(j), 0L, sigs(i), sigs(j)); j += 1 }; i += 1 }
          }
          ids.clear(); sigs.clear()
        }
        new Iterator[org.apache.spark.sql.Row] {
          private def fill(): Unit = {
            while (out.isEmpty && (it.hasNext || started)) {
              if (it.hasNext) {
                val r = it.next()
                val b = r.getInt(1); val k = r.getLong(2)
                if (!started || b != curB || k != curK) {
                  if (started) flush()
                  curB = b; curK = k; started = true
                }
                ids += r.getLong(0); sigs += r.getLong(3)
              } else { flush(); started = false }
            }
          }
          def hasNext: Boolean = { fill(); out.nonEmpty }
          def next(): org.apache.spark.sql.Row = { fill(); out.remove(out.length - 1) }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      t("cand_noobserve") {
        noop(pairs.where(col("__bn") === 0).drop("__bn").dropDuplicates("id_a", "id_b"))
      }
      t("cand_nodedup") {
        noop(pairs.where(col("__bn") === 0).drop("__bn"))
      }
      t("parted_only") { noop(parted) }
    }
    spark.stop()
  }
}
