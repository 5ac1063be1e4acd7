package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-search quality beyond oracle parity: ANN recall against
  * brute-force ground truth, and vector-math sanity.
  */
class SimilaritySpec extends AnyFunSuite {
  import TestSession._

  private def topkSet(name: String): Map[Long, Set[Long]] = {
    import spark.implicits._
    SparkEntry.queries(name)(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
  }

  test("ANN recall vs brute force is useful (LSH and IVF)") {
    val exact = topkSet("sim_bruteforce_topk") // top-5 ground truth
    val lsh = topkSet("sim_ann_lsh")           // top-3 from candidates
    val ivf = topkSet("sim_ann_ivf")
    def recall(ann: Map[Long, Set[Long]]): Double = {
      val per = exact.keys.toSeq.map { q =>
        val hits = ann.getOrElse(q, Set.empty).count(exact(q).contains)
        hits.toDouble / 3.0
      }
      per.sum / per.size
    }
    val (rl, ri) = (recall(lsh), recall(ivf))
    info(s"recall@3 vs exact top-5: lsh=$rl ivf=$ri")
    assert(rl >= 0.45, s"LSH recall too low: $rl")
    // Lloyd-trained centroids (2 deterministic iterations) measure
    // 0.633 here vs the 0.3 floor the untrained medoids were held to
    assert(ri >= 0.6, s"IVF recall too low: $ri")
    assert(exact.size == 10 && lsh.size == 10 && ivf.size == 10,
      "every query must return neighbors")
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq((Seq(1f, 0f, 3f, 4f), Seq(1f, 0f, 3f, 4f), Seq(0f, 5f, 0f, 0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorOps.cosine($"a", $"b").as("self"),
      VectorOps.cosine($"a", $"c").as("orth")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    import spark.implicits._
    val pairs = SparkEntry.queries("dedup_embedding")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, c) => a < b && c >= 0.4 })
  }
}
