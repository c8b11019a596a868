package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSuite {
  import spark.implicits._

  lazy val data = spark.read.parquet(s"$sf001/embeddings.parquet")
  lazy val queries = data.where(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  def bruteForce(k: Int): Set[(Long, Int, Long)] = {
    val vecs = data.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val qs = vecs.filter(_._1 < 5)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    qs.flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(v, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).zipWithIndex
        .map { case ((id, _), i) => (qid, i + 1, id) }
    }.toSet
  }

  test("approximate paths observe their candidate-set size (no-silent-recall discipline)") {
    val lsh = Ann.cosineLsh(data, queries, 5, bits = 5, tables = 16)
      .select("qid", "rank", "neighbor_id")
    lsh.collect()
    val cands = Ann.candidateMetrics(lsh)
    assert(cands > 0, "LSH candidate metric must fire")
    // candidates are a strict subset of the 5 x (n-1) cross pairs — that gap
    // IS the approximation being reported
    assert(cands < 5L * (data.count() - 1))
  }

  test("PQ: codes are m small ints; ADC recalls far above chance; clone ranks top") {
    val cbs = Ann.trainPqCodebooks(data, m = 8, k = 16, iters = 3, sampleN = 256)
    assert(cbs.length == 8 && cbs.forall(_.length == 16) && cbs(0)(0).length == 8)
    val codes = Ann.pqEncode(data, cbs).collect()
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 16)))
    // 64 floats -> 8 codes: the memory-bounded storage claim
    val got = Ann.cosinePq(data, queries, 5, cbs)
      .select("qid", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val truth = bruteForce(5).map { case (q, _, id) => (q, id) }
    val gotPairs = got.map { case (q, _, id) => (q, id) }
    val recall = gotPairs.count(truth.contains).toDouble / truth.size
    // this fixture is near-isotropic (no cluster structure), the hardest
    // case for quantization: measured recall@5 ~0.16 vs ~0.01 by chance.
    // The assertion pins >= 10x chance — the MECHANISM carrying signal —
    // and the clone test below pins the planted-structure behavior.
    val chance = 5.0 / (data.count() - 1).toDouble
    info(f"PQ recall@5 = $recall%.2f (chance $chance%.3f) over ${truth.size} truth pairs")
    assert(recall >= 10 * chance, f"PQ recall at chance level: $recall%.2f")

    // planted structure: a near-clone encodes to its source's codes, so ADC
    // ranks the source at the top for the clone query
    val clone = data.where(col("vec_id") === 7)
      .select(lit(70007L).as("vec_id"),
        transform(col("embedding"), x => x * 1.0001f).as("embedding"), col("label"))
    val all = data.unionByName(clone)
    val cq = clone.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top1 = Ann.cosinePq(all, cq, 1, cbs)
      .select("neighbor_id").head.getLong(0)
    assert(top1 == 7L, s"clone query should retrieve its source, got $top1")
  }

  test("cosineTopK matches brute force exactly") {
    val got = Ann.cosineTopK(data, queries, 5)
      .select("qid", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == bruteForce(5))
  }

  test("cosineNearDupPairs finds injected embedding near-dups, not unrelated vectors") {
    // clone a few vectors with tiny noise -> cosine ~ 1; unrelated pairs stay low
    val base = data.where(col("vec_id") < 200)
    val dupes = base.where(col("vec_id") < 3)
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"), x => x * 1.0001f).as("embedding"),
        col("label"))
    val all = base.unionByName(dupes)
    val pairs = Ann.cosineNearDupPairs(all, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 3L).foreach { i =>
      assert(pairs.contains((i, i + 10000L)), s"clone pair $i missing: $pairs")
    }
    // everything reported really is >= threshold (exact verify built in)
    val verified = Ann.cosineNearDupPairs(all, threshold = 0.99)
      .select("cosine").as[Double].collect()
    assert(verified.forall(_ >= 0.99))
  }

  test("ann_neardup gate is derandomized: brute >= 0.99 set IS the clone set and LSH finds it all") {
    // replicates the GATE's exact data: full sf0.01 embeddings + x1.0001f
    // clones of vec_id < 10. SRP-LSH recall is < 1 in general; the gate's
    // equality with full brute force holds because on THIS fixture the only
    // pairs >= 0.99 are the clones (angle at float-rounding scale, so the
    // deterministic splitmix64 planes cannot separate them). This spec
    // pins that property — if the fixture ever grows a borderline
    // non-clone pair, this fails before the gate does.
    val dupes = data.where(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.0001f)).as("embedding"), col("label"))
    val all = data.unionByName(dupes)
    val vecs = all.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      if cos(vecs(i)._2, vecs(j)._2) >= 0.99
    } yield (math.min(vecs(i)._1, vecs(j)._1), math.max(vecs(i)._1, vecs(j)._1))).toSet
    val cloneSet = (0L until 10L).map(i => (i, i + 100000L)).toSet
    assert(brute == cloneSet, s"fixture grew non-clone >=0.99 pairs: ${brute -- cloneSet}")
    val lsh = Ann.cosineNearDupPairs(all, 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == cloneSet)
  }

  test("cosineNearDupPairs bounds degenerate buckets with representative stars") {
    // 600 identical vectors (bucket size far beyond the 64 cap used here)
    // must produce n-1 star pairs, not n^2/2 — and all still verify at ~1.0
    val n = 600
    val ident = spark.range(n).select(col("id").as("vec_id"),
      array((0 until 16).map(i => lit((i + 1).toFloat)): _*).as("embedding"))
    val pairs = Ann.cosineNearDupPairs(ident, 0.99, maxBucketSize = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == (1L until n.toLong).map(i => (0L, i)).toSet,
      s"expected ${n - 1} star pairs, got ${pairs.size}")
  }

  test("cosineIvf with trained centroids achieves reasonable recall vs brute force") {
    val cents = Ann.trainIvfCentroids(data, nLists = 16, iters = 5)
    assert(cents.length == 16 && cents.head.length == 64)
    // deterministic training: same inputs -> identical centroids
    val cents2 = Ann.trainIvfCentroids(data, nLists = 16, iters = 5)
    assert(cents.zip(cents2).forall { case (a, b) => a.sameElements(b) })
    val exact = bruteForce(5).map { case (q, _, n) => (q, n) }
    val got = Ann.cosineIvf(data, queries, 5, cents, nProbe = 6)
      .select("qid", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("cosineLsh achieves reasonable recall vs brute force") {
    val exact = bruteForce(5).map { case (q, _, n) => (q, n) }
    val got = Ann.cosineLsh(data, queries, 5, bits = 5, tables = 16)
      .select("qid", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }
}
