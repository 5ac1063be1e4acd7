package graft

import graft.operators.Maintenance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operators: PageRank closed forms on crafted graphs, RRF
  * fusion invariants, snapshot rollback as pure manifest arithmetic,
  * per-source boilerplate scoping, and DSIR target/off-target
  * separation on a crafted bilingual corpus.
  */
class Round7Spec extends AnyFunSuite {
  import TestSession._

  /** Crafted documents table with per-doc lang/source, staged under a
    * temp sf-dir so driver-contract query fns read it like testdata. */
  private def corpusDir(docs: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r7").toString
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- q_pagerank ---------------------------------------------------------

  test("q_pagerank: clique converges to teleport-free fixpoint, isolated nodes keep exactly the teleport term") {
    // 3 identical docs → Jaccard-1 clique; 2 docs with disjoint
    // vocabulary → isolated. Closed forms with n = 5, scale 10^12:
    // r0 = 2e11, base = (15·r0)/100 = 3e10.
    //  - isolated: no in-edges, so every round gives exactly `base`;
    //  - clique of size k: each node receives (k−1)·(r/(k−1)) = r, the
    //    fixpoint r = base + 0.85·r ⇒ r = base/0.15 = r0 — floor
    //    truncation loses at most a few units per round.
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = corpusDir(Seq(
      (0L, dup, "en", "s0"), (1L, dup, "en", "s0"), (2L, dup, "en", "s0"),
      (3L, "one two three four five six seven eight", "en", "s0"),
      (4L, "uno dos tres cuatro cinco seis siete ocho", "en", "s0")))
    val out = SparkEntry.queries("q_pagerank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = 5L
    val r0 = 1000000000000L / n
    val base = (15L * r0) / 100L
    val byId = out.map(t => t._1 -> t).toMap
    for (iso <- Seq(3L, 4L)) {
      assert(byId(iso)._2 == 0L, "isolated nodes have degree 0")
      assert(byId(iso)._3 == base, s"isolated rank must be exactly base=$base")
    }
    val clique = Seq(0L, 1L, 2L).map(byId(_))
    assert(clique.forall(_._2 == 2L), "clique nodes have degree k-1")
    assert(clique.map(_._3).distinct.size == 1, "symmetric nodes rank equally")
    val cr = clique.head._3
    assert(math.abs(cr - r0) < 1000L,
      s"clique fixpoint ≈ r0=$r0 up to floor truncation, got $cr")
    assert(cr > byId(3L)._3, "connected mass outranks teleport-only")
  }

  test("q_pagerank: total mass never exceeds the injected mass (lossy dangling variant)") {
    val out = SparkEntry.queries("q_pagerank")(spark, sf)
    val total = out.agg(sum("rank_scaled")).head().getLong(0)
    val n = out.count()
    assert(total <= 1000000000000L / n * n, "floor division only loses mass")
    assert(total > 0L)
  }

  // ---- q_hybrid_rrf -------------------------------------------------------

  test("q_hybrid_rrf: fused score is exactly the scaled reciprocal-rank sum and ordering is consistent") {
    val rows = SparkEntry.queries("q_hybrid_rrf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    def leg(r: Long): Long = if (r > 0) 1000000000000L / (60L + r) else 0L
    for ((q, rank, doc, lr, vr, rrf) <- rows) {
      assert(rrf == leg(lr) + leg(vr),
        s"rrf mismatch for query=$q doc=$doc: $rrf vs ${leg(lr) + leg(vr)}")
      assert(lr >= 0 && vr >= 0 && (lr > 0 || vr > 0),
        "a fused doc must come from at least one leg")
    }
    rows.groupBy(_._1).foreach { case (q, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to g.length).toSeq,
        s"ranks for query $q must be consecutive from 1")
      // ordering follows (rrf desc, doc_id) exactly
      val resorted = g.sortBy(t => (-t._6, t._3)).map(_._3).toSeq
      assert(sorted.map(_._3).toSeq == resorted,
        s"fused order for query $q must be (rrf desc, doc_id)")
    }
  }

  test("q_hybrid_rrf: a doc strong in both legs outranks docs strong in only one") {
    val rows = SparkEntry.queries("q_hybrid_rrf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // within each query, if the top doc has both legs > 0 it must beat
    // every single-leg doc — definitional, but pins the fill(0) path
    rows.groupBy(_._1).foreach { case (_, g) =>
      val top = g.minBy(_._2)
      val singles = g.filter(t => t._3 == 0 || t._4 == 0)
      singles.foreach(sg => assert(top._2 <= sg._2))
    }
  }

  // ---- io_rollback --------------------------------------------------------

  test("io_rollback: rollback is manifest-only — v3 lists exactly v1's groups and no data file changes") {
    import spark.implicits._
    val root = "/tmp/graft_q/rollback_sf0.001"
    SparkEntry.queries("io_rollback")(spark, sf).collect() // stages + rolls back
    val v1 = Maintenance.manifestPaths(root, 1).toSet
    val v2 = Maintenance.manifestPaths(root, 2).toSet
    val v3 = Maintenance.manifestPaths(root, 3).toSet
    assert(v3 == v1, "rollback manifest must re-list the target's groups")
    assert(v2 != v1, "the churn version must differ")
    assert(Maintenance.currentSnapshotVersion(root) == 3)
    // rolled-back read is row-identical to the original snapshot
    val a = Maintenance.readSnapshot(spark, root, 1)
    val b = Maintenance.readSnapshot(spark, root, 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // history preserved: the bad version stays queryable and differs
    val v2df = Maintenance.readSnapshot(spark, root, 2)
    assert(!v2df.exceptAll(a).isEmpty, "v2 must contain the churned rows")
    // the rollback commit wrote no data file: every path in v3 existed
    // before the rollback (they ARE v1's paths) — nothing new under root
    // except manifests
    val files = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(files.count(_.startsWith("manifest_v")) == 3)
  }

  // ---- io_branching -------------------------------------------------------

  test("io_branching: a failing audit leaves main untouched and the branch unpublished") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wap").toString
    // main v1: two clean rows
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price")
      .coalesce(1).write.parquet(s"$root/clean")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "manifest_v1.txt"),
      s"$root/clean".getBytes("UTF-8"))
    // branch stages a batch violating the audit constraint (price <= 0)
    Seq((3L, -5.0)).toDF("k", "price").coalesce(1).write.parquet(s"$root/bad_batch")
    Maintenance.writeBranch(root, "wap",
      Maintenance.manifestPaths(root, 1) :+ s"$root/bad_batch")
    val branchView = spark.read.parquet(Maintenance.branchPaths(root, "wap"): _*)
    val bad = branchView.filter($"price" <= 0.0).count()
    assert(bad == 1L, "audit must see the violation on the branch view")
    // audit failed → drop, never publish
    Maintenance.dropBranch(root, "wap")
    assert(Maintenance.currentSnapshotVersion(root) == 1,
      "main's version listing never observed the branch")
    assert(Maintenance.readSnapshot(spark, root, 1).count() == 2,
      "main still reads only the clean rows")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "branch_wap.txt")))
  }

  test("io_branching: publish appends the staged groups through one OCC commit, zero data movement") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wap2").toString
    Seq((1L, 10.0)).toDF("k", "price").coalesce(1).write.parquet(s"$root/clean")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "manifest_v1.txt"),
      s"$root/clean".getBytes("UTF-8"))
    Seq((2L, 30.0)).toDF("k", "price").coalesce(1).write.parquet(s"$root/batch")
    Maintenance.writeBranch(root, "wap",
      Maintenance.manifestPaths(root, 1) :+ s"$root/batch")
    val mtimeBefore = new java.io.File(s"$root/batch").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val v = Maintenance.publishBranch(root, "wap", 1)
    assert(v == 2)
    assert(Maintenance.manifestPaths(root, 2).toSet ==
      Set(s"$root/clean", s"$root/batch"))
    val mtimeAfter = new java.io.File(s"$root/batch").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(mtimeAfter == mtimeBefore, "publish moves zero data bytes")
    assert(Maintenance.readSnapshot(spark, root, 2).count() == 2)
  }

  // ---- dedup_incremental --------------------------------------------------

  test("dedup_incremental: batch docs classify as exact-dup, near-dup, or accepted against the index") {
    // index = doc_id % 10 != 0; batch = % 10 == 0. Doc 10 is a
    // verbatim copy of index doc 1; doc 20 differs from index doc 2 in
    // one word of twenty (J ≈ 0.86 on 3-gram shingles ≥ 0.8); doc 30
    // is vocabulary-disjoint from everything.
    val base = (0 until 20).map(i => s"w$i").mkString(" ")
    val near = (0 until 20).map(i => if (i == 19) "CHANGED" else s"w$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, base, "en", "s"),
      (2L, (0 until 20).map(i => s"v$i").mkString(" "), "en", "s"),
      (10L, base, "en", "s"),
      (20L, (0 until 20).map(i => if (i == 19) "CHANGED" else s"v$i").mkString(" "), "en", "s"),
      (30L, (0 until 20).map(i => s"z$i").mkString(" "), "en", "s")))
    val out = SparkEntry.queries("dedup_incremental")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(out(10L) == ((1L, 1L, 0)), s"verbatim copy: ${out(10L)}")
    assert(out(20L)._1 == 0L && out(20L)._2 >= 1L && out(20L)._3 == 0,
      s"one-word edit is a near-dup: ${out(20L)}")
    assert(out(30L) == ((0L, 0L, 1)), s"novel doc accepted: ${out(30L)}")
    assert(!out.contains(1L) && !out.contains(2L),
      "index docs never appear in the batch report")
  }

  // ---- io_shallow_clone ---------------------------------------------------

  test("io_shallow_clone: clone shares the source's files, divergence never touches the source") {
    val src = Maintenance.snapshotRoot(spark, sf)
    val srcManifestBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(src, s"manifest_v2.txt")).toSeq
    SparkEntry.queries("io_shallow_clone")(spark, sf).collect()
    val dst = "/tmp/graft_q/clone_sf0.001"
    // v1 of the clone lists EXACTLY the source's live groups — zero copy
    assert(Maintenance.manifestPaths(dst, 1).toSet ==
      Maintenance.manifestPaths(src, 2).toSet)
    // the diverged commit replaced only the touched group; untouched
    // groups remain the SOURCE's paths (shared, not copied)
    val v2 = Maintenance.manifestPaths(dst, 2)
    assert(v2.exists(_.startsWith(dst)), "the clone's own rewrite lands under dst")
    assert(v2.count(_.startsWith(src)) == 3, "untouched groups stay shared")
    // source manifest bytes unchanged by everything the clone did
    val after = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(src, s"manifest_v2.txt")).toSeq
    assert(after == srcManifestBytes, "clone activity must not touch source manifests")
  }

  // ---- text_boilerplate ---------------------------------------------------

  test("text_boilerplate: a source-frequent banner is removed from its source only, not from other sources") {
    // banner = one aligned 8-token segment. Source A: 5 docs, all carry
    // it (5/5 > 1/5 → boilerplate). Source B: 5 docs, ONE carries it
    // (1/5 not > 1/5 → kept), pinning the per-source scoping that
    // corpus-global seg-dedup cannot express (globally the banner
    // appears in 6 docs).
    val banner = "cookie notice accept all terms privacy policy close"
    def uniq(i: Int) = (0 until 8).map(j => s"u${i}x$j").mkString(" ")
    val docs =
      (0 until 5).map(i => (i.toLong, s"$banner ${uniq(i)}", "en", "A")) ++
        Seq((5L, s"$banner ${uniq(5)}", "en", "B")) ++
        (6 until 10).map(i => (i.toLong, uniq(i) + " " + uniq(i + 10), "en", "B"))
    val dir = corpusDir(docs)
    val out = SparkEntry.queries("text_boilerplate")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    for (i <- 0L until 5L) {
      assert(out(i)._2 == 1L, s"doc $i: banner segment removed")
      assert(!out(i)._3.contains("cookie"), s"doc $i: no banner text survives")
    }
    assert(out(5L)._2 == 0L, "source B's lone banner copy is NOT boilerplate")
    assert(out(5L)._3.contains("cookie notice"), "source B keeps the banner")
    for (i <- 6L until 10L) assert(out(i)._2 == 0L)
  }

  // ---- q_k_anonymity ------------------------------------------------------

  test("q_k_anonymity: every released row covers >= K people and the population is conserved") {
    val rows = SparkEntry.queries("q_k_anonymity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val released = rows.filter(_._4 < 2)
    assert(released.forall(_._3 >= 10L),
      "k-anonymity guarantee: no released cell smaller than K")
    val total = rows.map(_._3).sum
    val customers = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(total == customers,
      s"released + generalized + suppressed must conserve the population: $total vs $customers")
    assert(rows.count(t => t._4 == 2) == 1, "exactly one suppression bucket")
    assert(rows.filter(_._4 == 1).forall(_._2 == "ANY"),
      "level-1 rows are segment-generalized")
  }

  // ---- q_length_batching --------------------------------------------------

  test("q_length_batching: per-doc padding is bounded by the bucket width, batches are full except per-bucket tails") {
    val rows = SparkEntry.queries("q_length_batching")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((bucket, _, nDocs, batchMax, waste) <- rows) {
      assert(waste <= nDocs * 15L,
        s"bucket $bucket: waste $waste exceeds the (W-1) per-doc bound")
      assert(batchMax >= bucket * 16L && batchMax < (bucket + 1) * 16L,
        "batch max stays inside its bucket's length range")
    }
    // at most one non-full batch per bucket, and it is the LAST slot
    rows.groupBy(_._1).foreach { case (bucket, g) =>
      val partial = g.filter(_._3 < 8L)
      assert(partial.size <= 1, s"bucket $bucket has ${partial.size} partial batches")
      partial.foreach(p => assert(p._2 == g.map(_._2).max,
        s"bucket $bucket: the partial batch must be the tail slot"))
    }
  }

  // ---- stream_drift -------------------------------------------------------

  test("stream_drift: per-window PSI rows are non-negative and counts reconcile with the reference total") {
    val rows = SparkEntry.queries("stream_drift")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 >= 0.0), "PSI contributions are non-negative")
    val streamed = rows.map(_._3).sum
    val total = Tables.events(spark, sf).count()
    assert(streamed == total,
      s"every event lands in exactly one (window, type) row: $streamed vs $total")
  }

  // ---- q_mixture_apply ----------------------------------------------------

  test("q_mixture_apply: over-represented sources downsample toward uniform, under-represented keep everything") {
    // A has 40 docs, B has 10: target = N/S = 25 per source, so A's
    // keep-rate is 25/40 and B's is 1. The keep test hashes doc_id
    // (md5 first 32 bits) before the mod-997 residue, so the id
    // pattern is irrelevant — Round8Spec drives the adversarial cases.
    val docs =
      (0 until 40).map(i => ((i * 251).toLong, s"alpha beta g$i", "en", "A")) ++
        (0 until 10).map(i => ((100000 + i * 251).toLong, s"x y z$i", "en", "B"))
    val dir = corpusDir(docs)
    val out = SparkEntry.queries("q_mixture_apply")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("B") == ((10L, 10L)), s"under-represented source keeps all: ${out("B")}")
    val (inA, keptA) = out("A")
    assert(inA == 40L)
    assert(keptA < 40L, "over-represented source must drop documents")
    assert(keptA >= 15L && keptA <= 35L,
      s"kept count should approximate the 25/40 rate: $keptA")
    // determinism: a second run reproduces the identical sample counts
    val again = SparkEntry.queries("q_mixture_apply")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == out)
  }

  // ---- q_skyline ----------------------------------------------------------

  test("q_skyline: the staircase window equals the brute-force NOT-EXISTS skyline") {
    import spark.implicits._
    val out = SparkEntry.queries("q_skyline")(spark, sf)
      .select("c_custkey").as[Long].collect().toSet
    // brute force: r is in the skyline iff nobody weakly dominates it
    // with at least one strict dimension
    val act = Tables.orders(spark, sf).groupBy($"o_custkey")
      .agg(count(lit(1)).as("act"))
    val cust = Tables.customer(spark, sf)
      .join(act, $"c_custkey" === $"o_custkey")
      .select($"c_custkey".as[Long], $"c_acctbal".as[Double], $"act".as[Long])
      .collect()
    val brute = cust.filter { case (_, b, a) =>
      !cust.exists { case (_, b2, a2) =>
        b2 >= b && a2 >= a && (b2 > b || a2 > a)
      }
    }.map(_._1).toSet
    assert(out == brute,
      s"staircase vs brute force differ: only-staircase=${out -- brute}, only-brute=${brute -- out}")
    assert(out.nonEmpty)
  }

  // ---- q_kfold_split ------------------------------------------------------

  test("q_kfold_split: exact stratification — within every source, fold sizes differ by at most 1") {
    val rows = SparkEntry.queries("q_kfold_split")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      val sizes = g.map(_._3)
      assert(sizes.max - sizes.min <= 1L,
        s"source $src folds unbalanced: ${g.map(t => t._2 -> t._3).toSeq.sortBy(_._1)}")
    }
    val total = rows.map(_._3).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs, "every document lands in exactly one fold")
  }

  // ---- pipeline_llm_mix ---------------------------------------------------

  test("pipeline_llm_mix: dedup runs on CLEANED text — docs differing only in template collapse") {
    // banner in 9/10 docs of source A (> 1/5 → removed); the shared
    // body sits in exactly 2/10 (2·5 = 10 ≯ 10 → kept). Doc 8 =
    // banner+body, doc 9 = body alone: distinct raw, identical after
    // cleaning → keep-first drops doc 9. Pre-clean dedup provably
    // misses this pair. All-en corpus ⇒ target model == raw model ⇒
    // every logw is exactly 0 ⇒ nothing strictly positive is selected.
    val banner = "cookie notice accept all terms privacy policy close"
    val body = "alpha beta gamma delta epsilon zeta eta theta"
    def uniq(i: Int) = (0 until 8).map(j => s"u${i}x$j").mkString(" ")
    val docs =
      (0 until 8).map(i => (i.toLong, s"$banner ${uniq(i)}", "en", "A")) ++
        Seq((8L, s"$banner $body", "en", "A"), (9L, body, "en", "A"))
    val dir = corpusDir(docs)
    val out = SparkEntry.queries("pipeline_llm_mix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == 1)
    val (src, in, kept, sel, tokSel) = out.head
    assert(src == "A" && in == 10L)
    assert(kept == 9L, s"docs 8 and 9 must collapse after cleaning, kept=$kept")
    assert(sel == 0L && tokSel == 0L,
      "pure-target corpus: logw == 0 everywhere, nothing strictly positive")
  }

  // ---- q_drift_psi --------------------------------------------------------

  test("q_drift_psi: a shifted distribution flags, a balanced bucket is exactly zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    // ref half ts 0..999, cur half ts 2000..2999 (split lands at 1499);
    // A flips 80/20 -> 20/80, B the reverse, C stays 50/50. Totals are
    // equal (150/150), so C's smoothed p == q exactly -> psi == 0.
    def rows(n: Int, tpe: String, base: Long) =
      (0 until n).map(i => (base + i, tpe))
    val events =
      rows(80, "A", 0L) ++ rows(20, "B", 100L) ++ rows(50, "C", 200L) ++
        rows(20, "A", 2000L) ++ rows(80, "B", 2100L) ++ rows(50, "C", 2200L)
    events.toDF("ts", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_drift_psi")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("A")._1 == 80L && out("A")._2 == 20L)
    assert(out("C")._3 == 0.0, s"balanced bucket must be exactly 0, got ${out("C")._3}")
    assert(out("A")._3 > 0.2 && out("B")._3 > 0.2,
      s"an 80/20 flip is actionable drift: A=${out("A")._3} B=${out("B")._3}")
    assert(out.values.forall(_._3 >= 0.0), "PSI contributions are non-negative")
  }

  // ---- text_dsir ----------------------------------------------------------

  test("text_dsir: target-domain docs score positive, off-target negative, selected flag consistent") {
    // target = lang 'en'. The en slice shares a phrasebook; the zh docs
    // use disjoint bigrams, so their features have target-count 0 and
    // every contribution is negative.
    val en = "the quick brown fox jumps over the lazy dog again"
    val zh = "shan shui feng yue hua niao yu chong shi ge"
    val dir = corpusDir(Seq(
      (0L, en, "en", "s"), (1L, en, "en", "s"), (2L, en, "en", "s"),
      (3L, zh, "zh", "s"), (4L, zh, "zh", "s")))
    val out = SparkEntry.queries("text_dsir")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
    for (i <- 0L until 3L) {
      assert(out(i)._2 > 0.0, s"en doc $i must be target-like, got ${out(i)._2}")
      assert(out(i)._3 == 1)
    }
    for (i <- 3L until 5L) {
      assert(out(i)._2 < 0.0, s"zh doc $i must be off-target, got ${out(i)._2}")
      assert(out(i)._3 == 0)
    }
  }

  test("text_dsir: more off-target mass raises a target doc's weight; an all-target corpus drives it to ~0") {
    // log w = ln(p_target/p_raw): the raw model INCLUDES the target
    // slice, so (a) diluting the corpus with more off-target docs makes
    // target docs look MORE target-like (weight rises), and (b) as the
    // corpus approaches pure-target, p_raw → p_target and weights
    // collapse toward 0 from above. Pins that the model comes from the
    // corpus split, not per-doc counts.
    val en = "the quick brown fox jumps over the lazy dog again"
    val zh = "shan shui feng yue hua niao yu chong shi ge"
    def run(nEn: Int, nZh: Int): Double = {
      val dir = corpusDir(
        (0 until nEn).map(i => (i.toLong, en, "en", "s")) ++
          (0 until nZh).map(i => (90L + i, zh, "zh", "s")))
      SparkEntry.queries("text_dsir")(spark, dir)
        .filter(col("doc_id") === 0L).head().getDouble(2)
    }
    val diluted = run(3, 6)
    val balanced = run(3, 2)
    val nearPure = run(9, 1)
    assert(diluted > balanced,
      s"more off-target mass must raise a target doc's weight: $balanced -> $diluted")
    assert(balanced > nearPure,
      s"a purer-target corpus must shrink the weight: $balanced -> $nearPure")
    assert(nearPure > 0.0, "weights approach 0 from above, never cross")
  }
}
