package graft

import graft.functions.MisraGries.misra_gries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized property checks — many generated cases per
  * invariant (fixed seeds, so failures reproduce). Complements the
  * single-case kernels in SketchMaintSpec/CorpusSpec.
  */
class PropertySpec extends AnyFunSuite {
  import TestSession._

  test("Misra-Gries invariants hold across random streams and partitionings") {
    import spark.implicits._
    val rng = new scala.util.Random(424242)
    for (trial <- 1 to 8) {
      val m = 3 + rng.nextInt(6)                     // 3..8 counters
      val nKeys = m + 1 + rng.nextInt(30)            // always more keys than counters
      val weights = (0 until nKeys)
        .map(i => s"k$i" -> (1 + rng.nextInt(60))).toMap
      val keys = rng.shuffle(
        weights.toSeq.flatMap { case (k, w) => Seq.fill(w)(k) })
      val n = keys.size
      val parts = 1 + rng.nextInt(9)
      val mg = keys.toDF("k").repartition(parts)
        .agg(misra_gries($"k", m).as("mg"))
        .selectExpr("mg").as[Map[String, Long]].head()
      assert(mg.size <= m, s"trial $trial: ${mg.size} counters > m=$m")
      for ((k, w) <- weights if w > n / (m + 1))
        assert(mg.contains(k),
          s"trial $trial (m=$m, n=$n, parts=$parts): heavy hitter $k (freq $w) missing")
      for ((k, est) <- mg) {
        assert(est <= weights(k), s"trial $trial: $k overestimated ($est > ${weights(k)})")
        assert(weights(k) - est <= n / (m + 1),
          s"trial $trial: $k error ${weights(k) - est} > n/(m+1)=${n / (m + 1)}")
      }
    }
  }

  test("text_chunk invariants hold for random document lengths") {
    import spark.implicits._
    val rng = new scala.util.Random(31337)
    val docs = (1L to 40L).map(i => (i, (0 until (1 + rng.nextInt(120)))
      .map(t => s"d${i}t$t").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft_propchunk").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_chunk")(spark, dir)
      .as[(Long, Long, Long, String)].collect().groupBy(_._1)
    val C = 32; val S = 24
    for ((id, text) <- docs) {
      val words = text.split(" ").toSeq
      val n = words.size
      val chunks = out(id).sortBy(_._2).toSeq
      // chunk k covers words [k*S, k*S + C)
      for ((_, cid, nt, ct) <- chunks) {
        val expect = words.slice(cid.toInt * S, cid.toInt * S + C)
        assert(ct.split(" ").toSeq == expect && nt == expect.size,
          s"doc $id chunk $cid content mismatch (n=$n)")
      }
      // full coverage, contiguous ids, no redundant tail
      assert(chunks.map(_._2) == chunks.indices.map(_.toLong),
        s"doc $id: chunk ids not contiguous")
      assert(chunks.flatMap(_._4.split(" ")).toSet == words.toSet,
        s"doc $id: coverage gap (n=$n)")
      val last = chunks.last._2.toInt
      if (last > 0)
        assert((last - 1) * S + C < n,
          s"doc $id: redundant tail chunk (n=$n, last=$last)")
    }
  }
}
