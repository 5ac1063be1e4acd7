package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-15 gates: the last three legacy ANN demo rows become
  * corpus-independent (r14 verdict "What's wrong" #1/#2) — a FIXED
  * coarse codebook for sim_ann_ivf and the pinned evalPanel query sets
  * for sim_ann_lsh / sim_ann_pq / sim_ann_ivf — so no broadcast or
  * exhaustive scan in their plans grows with the corpus.
  */
class Round15Spec extends AnyFunSuite {
  import TestSession._

  private val sfSmall = "/root/testdata/sf0.01"
  private val sfBig = "/root/testdata/sf0.1"

  test("r15: sim_ann_ivf coarse codebook is fixed-size at every corpus") {
    def cells(d: String): Set[Long] =
      Similarity.ivfCodebook(spark, d).select("cell_id")
        .collect().map(_.getLong(0)).toSet
    val small = cells(sfSmall)
    val big = cells(sfBig)
    assert(small == big, "codebook must not grow with the corpus")
    // the capped seed grid: vec_id % 50 == 7 AND vec_id < 500
    assert(small == (7L until 500L by 50L).toSet, s"unexpected cells: $small")
  }

  test("r15: legacy ANN query panels are pinned at sf0.01 and sf0.1") {
    for (k <- Seq("sim_ann_lsh", "sim_ann_ivf", "sim_ann_pq")) {
      def ids(d: String): Set[Long] =
        SparkEntry.queries(k)(spark, d).select("query_id").distinct()
          .collect().map(_.getLong(0)).toSet
      val small = ids(sfSmall)
      val big = ids(sfBig)
      assert(small == big, s"$k: panel must not grow with the corpus")
      // ⊆ rather than ==: LSH may legitimately return no candidate rows
      // for a panel query whose bands collide with nothing
      assert(small.subsetOf((0L until 500L by 50L).toSet),
        s"$k: panel outside the pinned evalPanel id set: $small")
      assert(small.nonEmpty, s"$k: empty panel")
    }
  }
}
