package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Ann

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("bruteForceTopK matches a driver-side exact computation") {
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (a.indices).foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = emb.where(col("vec_id") < 5)
    val got = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    (0L until 5L).foreach { q =>
      val want = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(got(q) == want, s"query $q")
    }
  }

  test("lshTopK: results are a subset of true candidates with exact scores; recall reported") {
    val queries = emb.where(col("vec_id") < 8)
    val brute = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(s"LSH recall@5 = $recall (bucketed candidates only)")
    assert(lsh.nonEmpty)
    assert(recall > 0.05) // deterministic; LSH trades recall for scan cost
  }

  test("ivfTopK: probes a corpus fraction; exact scores; recall reported") {
    val queries = emb.where(col("vec_id") < 8)
    val brute = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(s"IVF recall@5 = $recall (nprobe/nlist = 4/16 of the corpus)")
    assert(ivf.nonEmpty && recall > 0.05)
    // nprobe == nlist degenerates to exhaustive search == brute force
    val full = Ann.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == brute)
    // determinism: same result on re-run (hash-derived centroids)
    val again = Ann.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(again == ivf)
  }

  test("cosineNearDupPairs: only high-cosine pairs, symmetric-free, exact") {
    val pairs = Ann.cosineNearDupPairs(emb, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, c) =>
      assert(a < b); assert(c >= 0.9)
    }
  }
}
