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

  test("cosineLsh achieves reasonable recall vs brute force") {
    val exact = bruteForce(5).map { case (q, _, n) => (q, n) }
    val got = Ann.cosineLsh(data, queries, 5, bits = 5, tables = 16)
      .select("qid", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }
}
