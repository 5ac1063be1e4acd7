package graft

import graft.functions.GraftFunctions._
import graft.operators.{Dedup, TextPrep}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup + text-analysis behavior beyond the DuckDB oracles:
  * simhash (not SQL-expressible) is cross-checked against exact n-gram
  * Jaccard; custom expressions are checked for interpreted-vs-codegen
  * agreement and basic hash properties.
  */
class DedupTextSpec extends AnyFunSuite {
  import TestSession._

  /** Ground-truth near-dup pairs: exact 3-gram Jaccard ≥ 0.8 (the
    * corpus's seeded duplicates all sit at J ≥ 0.9). */
  private lazy val exactPairs: Set[(Long, Long)] = {
    import spark.implicits._
    val grams = Tables.documents(spark, sf)
      .select($"doc_id", explode(TextPrep.shingleSet($"text", 3)).as("g"))
    val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    grams.as("a").join(grams.as("b"), $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("da"), $"b.doc_id".as("db")).agg(count(lit(1)).as("c"))
      .join(sizes.as("sa"), $"da" === $"sa.doc_id")
      .join(sizes.as("sb"), $"db" === $"sb.doc_id")
      .filter($"c" / ($"sa.sz" + $"sb.sz" - $"c") >= 0.8)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
  }

  test("simhash finds exactly the seeded near-dup pairs (vs exact Jaccard)") {
    import spark.implicits._
    val found = Dedup.simhashPairs(spark, sf, maxHamming = 15)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(exactPairs.nonEmpty, "corpus should contain seeded near-dups")
    // hamming 15 (multi-probe side) separates the seeded pairs cleanly
    // in this corpus (dups reach 14, the nearest non-dup pair sits at
    // 16): exact recovery.
    assert(found == exactPairs,
      s"missed=${exactPairs -- found} extra=${found -- exactPairs}")
  }

  test("custom expressions: codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Tables.documents(spark, sf).limit(50)
      .select($"doc_id", TextPrep.shingleSet($"text", 3).as("grams"),
        TextPrep.norm($"text").as("norm"))
      .select($"doc_id", minhash_sig($"grams", 16).as("mh"),
        simhash64($"grams").as("sh"), fingerprint64($"norm").as("fp"))
    val withCodegen = df.collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2), r.getLong(3)))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2), r.getLong(3)))
      assert(withCodegen.sortBy(_._1).toSeq == interpreted.sortBy(_._1).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
  }

  test("fingerprint64: equal normalized texts collide, different don't (FNV-1a vectors)") {
    import spark.implicits._
    val df = Seq("hello  World", "hello world", "hello worlds", "")
      .toDF("text").select(fingerprint64(TextPrep.norm($"text")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1))          // whitespace+case normalize to equal
    assert(fps(1) != fps(2))
    assert(fps(3) == 0xcbf29ce484222325L) // FNV-1a empty-string basis
  }

  test("simhash multi-probe is complete at hamming 16 (vs brute-force all pairs)") {
    import spark.implicits._
    // ground truth: all-pairs hamming over the corpus signatures (fine
    // at spec scale; the operator exists precisely so production never
    // does this)
    val sigs = Tables.documents(spark, sf)
      .select($"doc_id", simhash64(TextPrep.shingleSet($"text", 3)).as("sig"))
      .as[(Long, Long)].collect()
    val expected = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 16
    } yield (ia, ib)).toSet
    val got = Dedup.simhashPairs(spark, sf, maxHamming = 16)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"multi-probe candidates must be exactly the hamming<=16 pairs: " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(expected.nonEmpty, "corpus should contain hamming<=16 pairs to make this spec real")
  }

  test("fingerprint128: lanes are multiplier-independent and collision-free on the corpus") {
    import spark.implicits._
    // (1) structural independence. A seed-only second FNV lane satisfies
    // h1(x) − h0(x) = (s1 − s0)·p^len for ALL inputs, i.e. the lane
    // DELTA is a function of length alone — same-length lane-0
    // collisions would then always co-collide in lane 1. Distinct
    // multipliers break that: assert the delta varies across
    // same-length texts.
    val texts = (0 until 32).map(i => f"payload-$i%04d") // all same length
    val lanes = texts.toDF("t").select(fingerprint128($"t").as("fp"))
      .select($"fp.h0", $"fp.h1").as[(Long, Long)].collect()
    val deltas = lanes.map { case (h0, h1) => h1 - h0 }.toSet
    assert(deltas.size == texts.size,
      s"lane delta collapsed to ${deltas.size} values over ${texts.size} same-length " +
        "texts — lanes behave like seed-only variants of one hash")
    // (2) the 128-bit key is collision-free where the oracle can check:
    // distinct combined fingerprints == distinct normalized texts
    val docs = Tables.documents(spark, sf)
    val nText = docs.select(TextPrep.norm($"text")).distinct().count()
    val nFp = docs.select(fingerprint128(TextPrep.norm($"text"))).distinct().count()
    assert(nFp == nText, s"fingerprint collisions: $nFp keys for $nText texts")
  }

  test("duplicate clusters equal brute-force union-find over the near-dup pairs") {
    import spark.implicits._
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus should contain near-dup pairs")
    // reference union-find on the driver (fine at spec scale)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.groupBy(find).map { case (_, ms) =>
      val sorted = ms.sorted
      (sorted.min, sorted.size.toLong, sorted.mkString(","))
    }.toSet
    val got = SparkEntry.queries("dedup_components")(spark, sf)
      .as[(Long, Long, String)].collect().toSet
    assert(got == expected, s"components mismatch:\n got=$got\n exp=$expected")
    // a transitive cluster exists iff some component spans > 1 pair —
    // otherwise this spec degenerates to echoing the pairs
    assert(expected.exists(_._2 > 2) || pairs.length == expected.size,
      "expected at least one transitive (>2 docs) cluster or all-disjoint pairs")
  }

  test("tfidf: corpus-wide terms rank below doc-distinctive terms") {
    import spark.implicits._
    val top = SparkEntry.queries("text_tfidf")(spark, sf)
      .as[(Long, Long, String, Double)].collect()
    assert(top.nonEmpty)
    // per-doc invariants: ranks are 1..k, scores non-increasing
    top.groupBy(_._1).foreach { case (doc, rows) =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to rows.length),
        s"doc $doc ranks not contiguous")
      assert(byRank.sliding(2).forall {
        case Array(hi, lo) => hi._4 >= lo._4; case _ => true
      }, s"doc $doc scores not monotone")
    }
    // df discrimination: a term present in (nearly) every doc should
    // never be a top term — 'the' is in every seeded document
    val nDocs = Tables.documents(spark, sf).count()
    val dfOfThe = Tables.documents(spark, sf)
      .select($"doc_id", explode(graft.operators.TextPrep.words($"text")).as("w"))
      .filter($"w" === "the").select($"doc_id").distinct().count()
    if (dfOfThe > nDocs * 9 / 10)
      assert(!top.exists(_._3 == "the"), "'the' (df≈N) must not out-rank distinctive terms")
  }

  test("minhash signature estimates Jaccard (lane agreement ≈ J)") {
    import spark.implicits._
    val a = (1 to 100).map(i => s"tok$i")
    val b = (11 to 110).map(i => s"tok$i") // true J = 90/110 ≈ 0.818
    val df = Seq(a, b).toDF("toks").select(minhash_sig($"toks", 256).as("sig"))
    val Array(sa, sb) = df.collect().map(_.getSeq[Long](0))
    val agree = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    assert(math.abs(agree - 0.818) < 0.12, s"minhash agreement $agree far from J=0.818")
  }

  test("shingles: short docs yield empty sets, not wrap-around garbage") {
    import spark.implicits._
    val df = Seq("one two", "one two three four").toDF("text")
      .select(TextPrep.shingleSet($"text", 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0).isEmpty)
    assert(rows(1) == Seq("one two three", "two three four"))
  }

  test("langid is deterministic and covers all docs") {
    val out = SparkEntry.queries("text_langid")(spark, sf)
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("pii scrub: detects and redacts emails, phones, IPv4s on crafted text") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rows = Seq(
      ("reach john.doe+x@corp.io or jane@sub.example.org", 2, 0, 0,
        "reach [EMAIL] or [EMAIL]"),
      ("call 555-123-4567 now", 0, 1, 0, "call [PHONE] now"),
      ("host 192.168.0.1 and 10.0.0.255", 0, 0, 2, "host [IP] and [IP]"),
      ("clean text, no pii at all", 0, 0, 0, "clean text, no pii at all"),
      // all three types in one string, each hit exactly once
      ("a@b.co 1.2.3.4 999-000-1111", 1, 1, 1, "[EMAIL] [IP] [PHONE]"))
    val out = rows.map(_._1).toDF("t")
      .select(TextAnalysis.piiScrub($"t").as("p"))
      .select($"p.n_emails", $"p.n_phones", $"p.n_ips", $"p.redacted")
      .collect()
    rows.zip(out).foreach { case ((in, e, ph, ip, red), r) =>
      assert(r.getInt(0) == e && r.getInt(1) == ph && r.getInt(2) == ip,
        s"counts for '$in': ${r.toSeq}")
      assert(r.getString(3) == red, s"redaction for '$in': ${r.getString(3)}")
    }
  }

  test("pii driver query plants and finds >=1 of each type per doc") {
    import spark.implicits._
    val out = SparkEntry.queries("text_pii")(spark, sf)
    assert(out.filter($"n_emails" < 1 || $"n_phones" < 1 || $"n_ips" < 1).count() == 0)
  }

  test("repetition removal keeps first-occurrence order") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "b a b c a b"),
      (2L, "x x x"),
      (3L, "one two three")).toDF("doc_id", "text")
    val out = TextAnalysis.repRemovalOf(docs)
      .orderBy($"doc_id")
      .select($"n_unique", $"cleaned").as[(Long, String)].collect()
    assert(out(0) == ((3L, "b a c")), out(0)) // first-seen order, not sorted
    assert(out(1) == ((1L, "x")))
    assert(out(2) == ((3L, "one two three"))) // no dups -> unchanged
  }

  test("text_novelty: per-source novelty matches a sequential replay") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] = {
      val w = t.replaceAll("\\s+", " ").trim.toLowerCase.split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val baseDict = docs.filter(_._1 % 2 == 0).flatMap(d => shingles(d._3)).toSet
    val expected = docs.filter(_._1 % 2 == 1)
      .map { case (_, src, t) =>
        val sh = shingles(t)
        (src, sh.size.toLong, sh.count(g => !baseDict.contains(g)).toLong)
      }
      .groupBy(_._1).map { case (src, g) =>
        val ng = g.map(_._2).sum; val nn = g.map(_._3).sum
        src -> (g.length.toLong, ng, nn, nn * 1000000L / ng)
      }
    val got = SparkEntry.queries("text_novelty")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("dedup_blocking: two-pass SNM audit matches a sequential replay") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def norm(t: String) = t.replaceAll("\\s+", " ").trim.toLowerCase
    def shingles(t: String): Set[String] = {
      val w = norm(t).split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val ids = docs.map(_._1).sorted
    val truth = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      c = (sh(a) & sh(b)).size
      if c >= 1 && 9L * c >= 4L * (sh(a).size + sh(b).size)
    } yield (a, b)).toSet
    def candPairs(key: String => String): Set[(Long, Long)] = {
      val order = docs.map { case (id, t) => (key(t), id) }
        .sortBy(identity).map(_._2)
      (for {
        i <- order.indices
        j <- (i + 1) until math.min(i + 6, order.length)
      } yield {
        val (a, b) = (order(i), order(j))
        (a min b, a max b)
      }).toSet
    }
    val cand = candPairs(t => norm(t).take(24)) ++
      candPairs(t => norm(t).reverse.take(24))
    val found = truth & cand
    val r = SparkEntry.queries("dedup_blocking")(spark, sf).head()
    assert(r.getAs[Long]("n_docs") == docs.length.toLong)
    assert(r.getAs[Long]("n_candidates") == cand.size.toLong)
    assert(r.getAs[Long]("n_truth") == truth.size.toLong)
    assert(r.getAs[Long]("n_found") == found.size.toLong)
    assert(r.getAs[Long]("recall_micro") ==
      (if (truth.isEmpty) -1L else found.size.toLong * 1000000L / truth.size))
  }
}
