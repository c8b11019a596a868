package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{SpatialJoins, TextOps}

/**
 * Direct scale-path evidence for the two operators round 4 flagged as
 * driver-ceilinged, at sizes far beyond any gate fixture — committed as a
 * main so the BENCH.md numbers are reproducible, not ad-hoc:
 *
 *  1. knnJoinDistributed, 500,000 sites x 1,000,000 points, k=1, level 15
 *     (5x the 1e5-site correctness spec; the retired driver mode would hold
 *     500k site rows + result rows on the heap and re-broadcast every ring —
 *     the distributed loop's driver state is per-ring counters only).
 *  2. dedupClusters distributed pointer-doubling mode, 5,000,000 vertices
 *     in 100 scrambled-id chains of 50k pairwise-merged into 50 components
 *     (diameter ~100k — label propagation's worst case; real dedup graphs
 *     are star/clique-dominated with diameter 2-4). The assertion is the
 *     ROUND COUNT staying O(log diameter) and the component count exact.
 *
 * Run: SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.ScalePathRunner [knn|cc]"
 */
object ScalePathRunner {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("both")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-path")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.CellExprs.install(spark)
    import graft.functions.CellExprs._

    if (which == "both" || which == "knn") {
      // the 1e5-site spec's lattice generalized as WEAK scaling: points =
      // ~2x sites and the span grows with sqrt(sites), so POINT DENSITY PER
      // LEVEL-15 CELL stays constant (a bigger metro, same building density)
      // and ring-1 settles nearly everything. Keeping the span fixed instead
      // quadruples density at 4x sites and blows the ring-1 candidate set up
      // 24x (measured: 380s vs the expected ~4x of 11s) — density, not site
      // count, is what the ring join's cost tracks.
      // SPARK_GRAFT_KNN_SITES=500000 (default) reproduces the recorded runs;
      // 2000000 is the 4x weak-scaling stretch point.
      val nSites = sys.env.getOrElse("SPARK_GRAFT_KNN_SITES", "500000").toLong
      val span = 5.0 * math.sqrt(nSites / 500000.0)
      val nSide = math.sqrt(nSites * 2.0).round.toInt
      val pSpacing = span / nSide
      val sSide = math.ceil(math.sqrt(nSites.toDouble)).toInt
      val sSpacing = span / sSide
      val pts = spark.range(nSide.toLong * nSide)
        .withColumn("point_id", col("id"))
        .withColumn("lat", lit(50.0) + (col("id") % nSide).cast("double") * lit(pSpacing))
        .withColumn("lng", lit(0.0) + floor(col("id") / nSide).cast("double") * lit(pSpacing))
        .withColumn("cell16", cell_of(col("lat"), col("lng"), lit(16)))
        .drop("id")
      val sites = spark.range(nSites)
        .withColumn("site_id", col("id"))
        .withColumn("site_lat", lit(50.002) + (col("id") % sSide).cast("double") * lit(sSpacing))
        .withColumn("site_lng", lit(0.002) + floor(col("id") / sSide).cast("double") * lit(sSpacing))
        .drop("id")
      val t0 = System.nanoTime()
      val rows = SpatialJoins.knnJoinDistributed(pts, sites, k = 1, level = 15).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"RESULT knn sites=$nSites points=${nSide.toLong * nSide} rows=$rows sec=$sec%.1f")
      assert(rows == nSites, s"expected one settled row per site, got $rows")
    }

    if (which == "pack") {
      // distributed prefix sum at 100M rows: the driver holds O(partitions)
      // longs; a global Window would funnel all 100M rows through one task
      val n = 100000000L
      val df = spark.range(n).select(col("id").as("doc_id"),
        (col("id") % 1000).as("n_tokens"))
      val t0 = System.nanoTime()
      val out = graft.operators.TextOps.packPlan(df, "doc_id", "n_tokens", 8192)
      val agg = out.agg(count(lit(1)).as("rows"), max(col("chunk_last")).as("maxc"),
        sum(col("n_tokens")).as("toks")).head
      val sec = (System.nanoTime() - t0) / 1e9
      val (rows, maxc, toks) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      println(f"RESULT pack rows=$rows maxChunk=$maxc tokens=$toks sec=$sec%.1f")
      assert(rows == n, s"row count $rows")
      assert(maxc == (toks - 1) / 8192, s"last chunk $maxc vs ${(toks - 1) / 8192}")
    }

    if (which == "batchprep") {
      // SDXL batch plan at 100M rows: the per-bucket dense rank is the
      // packPlan distributed-rank shape — driver state is O(partitions x
      // buckets) longs (352 here); a Window.partitionBy(bucket_id) would
      // funnel all 100M rows through 11 tasks. Invariants asserted from ONE
      // aggregate over the output: per bucket the rank is dense (max ==
      // count-1) and the unassigned tail is exactly count mod batchSize.
      val n = 100000000L
      val df = spark.range(n).select(col("id").as("img_no"),
        (lit(16) + (col("id") * 7919) % 4096).cast("int").as("w"),
        (lit(16) + (col("id") * 104729) % 4096).cast("int").as("h"))
      val B = 1024
      val t0 = System.nanoTime()
      val out = graft.operators.ImageOps.bucketBatches(df, B, idCol = "img_no")
      val per = out.groupBy("bucket_id").agg(
        count(lit(1)).as("nb"), max(col("bk_rank")).as("maxr"),
        sum(when(col("batch_id").isNull, 1L).otherwise(0L)).as("tail")).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = per.map(_.getLong(1)).sum
      println(f"RESULT batchprep rows=$rows buckets=${per.length} sec=$sec%.1f")
      assert(rows == n, s"row count $rows")
      per.foreach { r =>
        val (nb, maxr, tail) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(maxr == nb - 1, s"dense rank broken: max rank $maxr of $nb")
        assert(tail == nb % B, s"drop_last tail $tail vs ${nb % B}")
      }
    }

    if (which == "both" || which == "cc") {
      // 100 chains of 50k vertices with ids SCRAMBLED along the chain by an
      // arithmetic permutation (pos -> pos*48271 mod 50000, coprime stride),
      // so the component's min id sits at a pseudo-random chain position;
      // chains 2j and 2j+1 merge by one edge -> exactly 50 components of
      // 100k vertices, diameter ~100k (label propagation's worst case).
      // Pure range arithmetic: no window/self-join lineage in the input.
      val nChains = 100L
      val chainLen = 50000L
      def vertexAt(chain: org.apache.spark.sql.Column, pos: org.apache.spark.sql.Column) =
        chain * lit(chainLen) + (pos * lit(48271L)) % lit(chainLen)
      val e = spark.range(nChains * (chainLen - 1))
        .withColumn("chain", col("id") % nChains)
        .withColumn("pos", floor(col("id") / nChains))
      val chainEdges = e.select(
        vertexAt(col("chain"), col("pos")).as("id_a"),
        vertexAt(col("chain"), col("pos") + 1).as("id_b"))
      val m = spark.range(nChains / 2)
      val mergeEdges = m.select(
        vertexAt(col("id") * 2, lit(17L)).as("id_a"),
        vertexAt(col("id") * 2 + 1, lit(23L)).as("id_b"))
      val pairs = chainEdges.unionByName(mergeEdges)
      val vertices = spark.range(nChains * chainLen).select(col("id").as("doc_id"))
      println(s"[scale-path] cc pairs=${pairs.count()}")
      val t0 = System.nanoTime()
      val (labels, rounds) = TextOps.dedupClustersWithRounds(pairs, vertices)
      val nComponents = labels.select(countDistinct("cluster")).head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"RESULT cc vertices=${nChains * chainLen} rounds=$rounds components=$nComponents sec=$sec%.1f")
      assert(nComponents == nChains / 2, s"expected ${nChains / 2} components, got $nComponents")
    }
    spark.stop()
  }
}
