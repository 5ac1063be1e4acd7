package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance

/** Round-14 gates: the pinned (corpus-independent) eval panels for the
  * brute-force similarity gold legs, and the DSv2 front door's
  * behavioral contracts (MoR parity, change-feed exactness and
  * fail-closed shapes, timestamp resolution).
  */
class Round14Spec extends AnyFunSuite {
  import TestSession._

  private val sfSmall = "/root/testdata/sf0.01"
  private val sfBig = "/root/testdata/sf0.1"

  // ---- eval panels (r13 verdict "What's wrong" #1) -------------------------

  test("eval panel is pinned: identical query ids at sf0.01 and sf0.1") {
    def ids(name: String, d: String): Set[Long] =
      SparkEntry.queries(name)(spark, d).select("query_id").distinct()
        .collect().map(_.getLong(0)).toSet
    val small = ids("sim_bruteforce_topk", sfSmall)
    val big = ids("sim_bruteforce_topk", sfBig)
    assert(small == big, "panel must not grow with the corpus")
    assert(small == (0L until 500L by 50L).toSet, s"unexpected panel: $small")
    // mrl's four brute-force legs share evalPanel at stride 100; its
    // n_queries column pins the panel size at both scales
    def mrlQ(d: String): Set[Long] =
      SparkEntry.queries("sim_mrl_recall")(spark, d)
        .select("n_queries").distinct().collect().map(_.getLong(0)).toSet
    assert(mrlQ(sfSmall) == Set(5L) && mrlQ(sfBig) == Set(5L),
      "mrl panel must be corpus-independent")
    // the corpora differ 4x (500 vs 2000 vectors), so with a constant
    // panel every gold leg's scored-row count — panel x (N-1) by
    // construction — scales linearly in N, never quadratically
    val n1 = Tables.embeddings(spark, sfSmall).count()
    val n2 = Tables.embeddings(spark, sfBig).count()
    assert(n1 == 500L && n2 == 2000L, s"scale assumption moved: $n1/$n2")
  }

  // ---- DSv2 front door ------------------------------------------------------

  private def freshRoot(name: String): String = {
    val root = s"/tmp/graft_q/${name}_spec"
    graft.Staging.rmTree(new java.io.File(root))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    root
  }

  test("DSv2 MoR read equals the library MoR path at every version") {
    val data = Maintenance.morData(spark, sf)
    val root = freshRoot("r14_mor")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "manifest_v1.txt"),
      (0 to 3).map(g => s"$data/base/g=$g").mkString("\n").getBytes("UTF-8"))
    val v2 = Maintenance.commitSnapshot(root, 1, Seq.empty,
      Seq(s"$data/newfile", s"dv:$data/dv"))
    val v3 = Maintenance.commitSnapshot(root, v2, Seq.empty,
      Seq(s"$data/newfile2", s"dv:$data/dv2"))
    for (v <- Seq(1, v2, v3)) {
      val dsv2 = spark.read.format("graft").option("versionAsOf", v).load(root)
        .select("o_orderkey", "o_totalprice").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      val lib = Maintenance.readSnapshotMoR(spark, root, v)
        .select("o_orderkey", "o_totalprice").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      assert(dsv2 == lib, s"DSv2 and library MoR reads diverge at v$v")
    }
  }

  test("DSv2 change feed is exact and fails closed on a compaction pair") {
    val data = Maintenance.morData(spark, sf)
    val root = freshRoot("r14_cdf")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "manifest_v1.txt"),
      (0 to 3).map(g => s"$data/base/g=$g").mkString("\n").getBytes("UTF-8"))
    val v2 = Maintenance.commitSnapshot(root, 1, Seq.empty,
      Seq(s"$data/newfile", s"dv:$data/dv"))
    val feed = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", 1).option("endingVersion", v2).load(root)
    val counts = feed.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute-force oracle: deletes = the DV's positions; inserts = the
    // added file's rows
    assert(counts("delete") == spark.read.parquet(s"$data/dv").count())
    assert(counts("insert") == spark.read.parquet(s"$data/newfile").count())
    // delete pre-images carry base values: join back onto v1 by key
    val delKeys = feed.filter(col("_change_type") === "delete")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val v1Keys = Maintenance.readSnapshotMoR(spark, root, 1)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(delKeys.subsetOf(v1Keys), "delete pre-images must exist in v1")
    // a compaction commit replaces base groups — data-neutral, so the
    // row-level feed must refuse rather than fabricate deletes/inserts
    val v3 = Maintenance.commitSnapshot(root, v2,
      (0 to 3).map(g => s"$data/base/g=$g") ++ Seq(s"dv:$data/dv"),
      (0 to 3).map(g => s"$data/compact/g=$g"))
    val bad = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", v2).option("endingVersion", v3).load(root)
    val e = intercept[Exception] { bad.count() }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: causes(x.getCause))
    assert(causes(e).exists(m => m != null && m.contains("removed data groups")),
      s"compaction pair should fail closed, got: ${e.getMessage}")
  }

  test("DSv2 timestampAsOf resolves commits and fails closed before the first") {
    val root = Maintenance.snapshotRoot(spark, sf)
    // ensure the commit log exists (io_time_travel_ts writes it
    // atomically; replicate the content here for test isolation)
    val log = java.nio.file.Paths.get(root, "commits_ts.txt")
    if (!java.nio.file.Files.exists(log))
      java.nio.file.Files.write(log, "1=1767261600\n2=1767265200".getBytes("UTF-8"))
    val v1 = spark.read.format("graft")
      .option("timestampAsOf", 1767263400L).load(root)
    val v2 = spark.read.format("graft")
      .option("timestampAsOf", 1767272400L).load(root)
    val s1 = v1.agg(sum("o_totalprice")).collect()(0).getDouble(0)
    val s2 = v2.agg(sum("o_totalprice")).collect()(0).getDouble(0)
    assert(s1 != s2, "the two probes must resolve different snapshots")
    val e = intercept[Exception] {
      spark.read.format("graft").option("timestampAsOf", 1L).load(root).count()
    }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: causes(x.getCause))
    assert(causes(e).exists(m => m != null && m.contains("no commit at or before")),
      s"pre-first-commit probe must fail closed, got: ${e.getMessage}")
  }

  // ---- staged tokenizer (r13 verdict "Next round" #3) ----------------------

  test("warm BPE paths read the staged model: zero training jobs") {
    import graft.operators.Corpus
    // prime the store (trains at most once per corpus fingerprint)
    Corpus.bpeModelRoot(spark, sf)
    val before = Corpus.bpeTrainRuns.get()
    val enc = SparkEntry.queries("text_bpe_encode")(spark, sf).collect()
    val fert = SparkEntry.queries("text_fertility")(spark, sf).collect()
    val train = SparkEntry.queries("text_bpe")(spark, sf).collect()
    assert(enc.nonEmpty && fert.nonEmpty && train.length == Corpus.BpeRounds)
    assert(Corpus.bpeTrainRuns.get() == before,
      "warm encode/fertility/train must NOT retrain the tokenizer")
    // the staged state must reproduce the trainer's invariant: encoding
    // compresses (tokens <= chars) and covers every word
    fert.foreach { r =>
      val (nw, nt, nc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nt >= nw && nt <= nc, s"fertility row out of bounds: $r")
    }
  }

  test("DSv2 rejects contradictory version options") {
    val root = Maintenance.snapshotRoot(spark, sf)
    val e = intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", 1)
        .option("timestampAsOf", 1767263400L).load(root).count()
    }
    assert(e.getMessage.contains("mutually exclusive"), e.getMessage)
  }
}
