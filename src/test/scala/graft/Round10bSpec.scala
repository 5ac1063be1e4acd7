package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 additions, second batch: sketch/accounting operators
  * (Count-Min, minhash candidate recall), behavioral transitions,
  * equi-depth profiling, PMI collocations, curriculum ordering.
  */
class Round10bSpec extends AnyFunSuite {
  import TestSession._

  // ---- Count-Min Sketch ----------------------------------------------------

  test("q_cms_freq: estimates never undercount and bound the error") {
    val rows = SparkEntry.queries("q_cms_freq")(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.length == math.min(20L, users))
    for (r <- rows) {
      val (exact, est, over) =
        (r.getAs[Long]("n_exact"), r.getAs[Long]("est"), r.getAs[Long]("overcount"))
      assert(est >= exact, s"CMS undercounted: est=$est < exact=$exact")
      assert(over == est - exact)
    }
    // heaviest-first presentation, deterministic ties
    val exacts = rows.map(_.getAs[Long]("n_exact")).toSeq
    assert(exacts == exacts.sorted.reverse)
  }

  // ---- minhash candidate recall -------------------------------------------

  test("dedup_minhash_recall: accounting is coherent and bands trade recall") {
    def one(rowsPerBand: Int) = {
      val r = operators.Dedup.minhashRecallOn(spark, sf, rowsPerBand).head()
      (r.getAs[Long]("n_truth"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))
    }
    val (t4, c4, h4, r4) = one(4)
    assert(t4 > 0, "corpus should contain J >= 0.8 pairs")
    assert(h4 <= t4 && h4 <= c4)
    assert(r4 == h4.toDouble / t4)
    // wider bands collide strictly less: the candidate set shrinks and
    // recall can only drop — the S-curve the operator exists to measure
    val (t16, c16, h16, r16) = one(16)
    assert(t16 == t4, "truth side must not depend on the band shape")
    assert(c16 <= c4 && h16 <= h4 && r16 <= r4)
  }

  // ---- transition matrix ---------------------------------------------------

  test("q_transition_matrix: rows are a distribution per prev_type") {
    val rows = SparkEntry.queries("q_transition_matrix")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPrev = rows.groupBy(_.getAs[String]("prev_type"))
    for ((p, rs) <- byPrev) {
      val psum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-9, s"P(.|$p) sums to $psum")
    }
    // pair count identity: transitions = events - one per user timeline
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  // ---- equi-depth histogram ------------------------------------------------

  test("q_equidepth_histogram: buckets are contiguous, complete, near-equal") {
    val rows = SparkEntry.queries("q_equidepth_histogram")(spark, sf).collect()
    assert(rows.length == 10)
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    // value ranges are disjoint and ordered
    val his = rows.map(_.getAs[Double]("hi"))
    val los = rows.map(_.getAs[Double]("lo"))
    for (i <- 1 until rows.length)
      assert(los(i) > his(i - 1), s"bucket $i overlaps its predecessor")
    // depth balance: within one value-group of ideal
    val maxTie = Tables.lineitem(spark, sf)
      .groupBy("l_extendedprice").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    val ideal = total / 10.0
    for (r <- rows)
      assert(math.abs(r.getAs[Long]("n_rows") - ideal) <= maxTie + 10,
        s"bucket ${r.getAs[Long]("bucket")} depth ${r.getAs[Long]("n_rows")} vs ideal $ideal")
  }

  // ---- PMI collocations ----------------------------------------------------

  test("text_pmi: scaled PMI matches a from-scratch recomputation") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("text_pmi")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val docs = Tables.documents(spark, sf)
      .select(operators.TextPrep.words(col("text")).as("w"))
    val n = docs.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS u, w[i + 1] AS v2))")).as("b"))
      .filter(col("b.u") =!= "" && col("b.v2") =!= "").count()
    for (r <- rows) {
      val (cuv, cu, cv) = (r.getAs[Long]("c_uv"), r.getAs[Long]("c_u"), r.getAs[Long]("c_v"))
      assert(cuv >= 5)
      val want = math.floor(math.log(cuv.toDouble * n / (cu.toDouble * cv)) * 1e6 + 0.5).toLong
      assert(r.getAs[Long]("pmi6") == want, s"PMI mismatch for ${r.getAs[String]("u")} ${r.getAs[String]("v2")}")
    }
  }

  // ---- curriculum ordering -------------------------------------------------

  test("q_curriculum_order: a deterministic permutation, clean tiers first") {
    val rows = SparkEntry.queries("q_curriculum_order")(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.length == total)
    val positions = rows.map(_.getAs[Long]("position")).toSeq
    assert(positions == (1L to total).toSeq, "positions must be 1..N in order")
    // tier blocks are contiguous and ascending (0 = clean first)
    val tiers = rows.map(_.getAs[Int]("tier_rank")).toSeq
    assert(tiers == tiers.sorted, "curriculum must emit whole tiers in order")
    // deterministic: a second run reproduces the byte-identical order
    val again = SparkEntry.queries("q_curriculum_order")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
