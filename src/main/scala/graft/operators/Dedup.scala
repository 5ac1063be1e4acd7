package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text normalization + shingling shared by dedup/text operators.
  * Canonical form matches the DuckDB oracle expressions exactly:
  * lower → collapse whitespace → trim → split on single space.
  */
object TextPrep {
  def norm(text: Column): Column = lower(trim(regexp_replace(text, "\\s+", " ")))
  def words(text: Column): Column = split(norm(text), " ")

  /** Distinct word n-grams (the shingle set for Jaccard), via the
    * one-pass codegen'd [[graft.functions.Shingles]] expression —
    * equivalent to array_distinct(transform(sequence(...), ...)) over
    * the normalized words, but without the per-element regex re-split
    * that higher-order lambdas incur. Docs shorter than n words get an
    * empty set. */
  def shingleSet(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.shingles(norm(text), n)

  /** DuckDB SQL fragments for the same canonical forms. */
  val normSql = """lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"""
  val wordsSql = s"string_split($normSql, ' ')"
}

/** Deduplication operators (SURVEY.md §2.3 #29-32) over the documents
  * corpus. Scale shapes:
  *  - exact dedup shuffles a 16-byte (128-bit, two-lane) fingerprint,
  *    never the text: past ~5×10⁹ docs a 64-bit key hits its birthday
  *    bound and silently merges distinct documents, so the group key is
  *    two multiplier-independent 64-bit hashes (see
  *    [[graft.functions.Fingerprint64]]);
  *  - near-dup candidate generation is always an equi-join on LSH keys
  *    (minhash bands / simhash bands / shared n-grams), never a cross
  *    join: shuffle volume is O(docs × bands), and band keys can be
  *    salted if a bucket ever grows hot;
  *  - exact verification (set Jaccard / Hamming) runs only on candidate
  *    pairs.
  */
object Dedup {

  // -- exact dedup on content fingerprint ----------------------------------
  // The oracle groups by the normalized TEXT; equality of results proves
  // the 128-bit fingerprint is collision-free on the corpus.
  private def exact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", fingerprint128(TextPrep.norm($"text")).as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies")
      .orderBy($"keep_id")
  }
  private val exactSql =
    s"""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
       |FROM documents
       |GROUP BY ${TextPrep.normSql}
       |ORDER BY keep_id""".stripMargin

  // -- exact n-gram Jaccard via df-capped two-lane candidates ---------------
  // Pairwise similarity WITHOUT a cross join — and WITHOUT the hot-gram
  // tail the r11 shape carried: the naive inverted-index self-join
  // meets every pair sharing ANY gram, so one gram appearing in k docs
  // costs k² candidate rows (one boilerplate phrase across the corpus
  // is a quadratic stage). Fixed EXACTLY by a df-capped two-lane
  // split ([[jaccardCappedCandidates]]): hot grams (df > cap) never
  // join in the cold lane, and the lemma-backed hot lane catches the
  // only pairs the cap could lose. Verification then counts the exact
  // intersection for candidate pairs only — output identical to the
  // brute-force oracle. (Prefix filtering à la dedup_setsim was
  // measured first and rejected: at τ = 3/10 prefixes keep 70% of every
  // doc — the documented τ-cliff — and the mid-df grams they retain
  // still blow up the candidate space.)
  private def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // shingle once, parallel, checkpointed: every consumer below reads
    // this frame, and the local one-file scan otherwise runs the
    // CPU-bound shingle map serially per branch (the dedup_simhash
    // lesson)
    val grams = Tables.documents(s, d)
      .repartition($"doc_id")
      .select($"doc_id", explode(TextPrep.shingleSet($"text", 3)).as("g"))
      .localCheckpoint()
    val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    jaccardCappedPairs(grams, JaccTauNum, JaccTauDen)
      .join(sizes.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sizes.as("sb"), $"doc_b" === $"sb.doc_id")
      .select($"doc_a", $"doc_b",
        ($"c" / ($"sa.sz" + $"sb.sz" - $"c")).as("jaccard"))
      .filter($"jaccard" >= 0.3)
      .orderBy($"doc_a", $"doc_b")
  }
  private val JaccTauNum = 3L
  private val JaccTauDen = 10L
  private[graft] val JaccHotDf = 64L

  /** (doc_a, doc_b, c) with c = the EXACT shared-gram count, for every
    * pair that could reach J ≥ n/dd, computed without ever self-joining
    * a hot posting list. Two lanes over the df split
    * cap = max(64, nDocs/16) (corpus-relative, so "hot" keeps meaning
    * boilerplate as N grows):
    *
    *  - COLD: the r11 inverted-index self-join restricted to grams with
    *    df ≤ cap — gives c_cold per meeting pair directly (one groupBy,
    *    no candidate materialization), with the quadratic hot lists
    *    removed;
    *  - HOT: each doc's hot grams are FEW DISTINCT VALUES (df > cap ⇒
    *    at most corpus_grams/cap of them exist), so they ride as one
    *    small sorted array per doc and c_hot = |hotA ∩ hotB| is an
    *    array_intersect on the PAIR rows — never a per-gram join.
    *    c = c_cold + c_hot exactly (shingleSet is distinct).
    *
    * Completeness of the pair set: a true pair missing from the cold
    * lane shares ONLY hot grams. J(A,B) ≥ n/dd forces
    * |A∩B| ≥ n/(n+dd)·(|A|+|B|) and |B| ≥ (n/dd)·|A|, so such a pair
    * needs hot(A) ≥ n/(n+dd)·(1+n/dd)·|A| = (n/dd)·|A| — BOTH endpoints
    * ≥ τ hot. The hot-heavy lane self-joins only those docs' hot grams;
    * on a natural corpus hot-heavy docs are the rare boilerplate-only
    * rows, and on a degenerate all-identical corpus the OUTPUT itself
    * is quadratic — no candidate scheme beats its own result size.
    * Residual tail (documented, accepted): the hot-heavy filter is
    * INCLUSIVE at τ, so a corpus of uniformly SHORT docs that all carry
    * the same small banner (e.g. 3 hot grams in 10-gram docs at τ=0.3)
    * makes every doc hot-heavy and the hot lane re-creates a quadratic
    * candidate stage — correct output, quadratic cost. That corpus
    * shape is exactly the one where the true pair set is itself
    * near-quadratic (every doc pair shares the banner's grams and the
    * short length keeps J near τ), so a tighter lane would trade
    * completeness for little: boilerplate-stripping (text_boilerplate)
    * upstream is the real fix for banner-dominated corpora.
    * Audited by the Round12 hot-gram spec (planted corpus-wide phrase ⇒
    * no quadratic candidate stage, results equal brute force). */
  private[graft] def jaccardCappedPairs(grams: DataFrame,
      n: Long, dd: Long): DataFrame = {
    val s = grams.sparkSession
    import s.implicits._
    val stats = grams.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_docs"))
    val dfreq = grams.groupBy($"g").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("hot", $"df" > greatest(lit(JaccHotDf), $"n_docs" / 16))
      .select($"g", $"hot")
      .localCheckpoint()
    // fast path: a corpus with NO hot gram (the common case — the
    // driver-side probe is one limit(1) count over the checkpointed
    // dfreq, never the corpus) runs the plain r11 inverted-index join,
    // zero extra stages; the lanes below engage only when a hot gram
    // actually exists
    if (dfreq.filter($"hot").limit(1).count() == 0) {
      return grams.as("a").hint("shuffle_hash").join(grams.as("b"),
          $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .agg(count(lit(1)).as("c"))
    }
    // shuffle-hash on the gram joins (the r10 no-corpus-broadcast rule)
    val tagged = grams.hint("shuffle_hash").join(dfreq, "g")
    val cold = tagged.filter(!$"hot").select($"doc_id", $"g")
    val cColdPairs = cold.as("a").hint("shuffle_hash").join(cold.as("b"),
        $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("c_cold"))
    // hot-heavy lane: pairs whose EVERY shared gram is hot (provably
    // both endpoints ≥ τ hot) meet here on their hot grams
    val hotByDoc = tagged.filter($"hot").groupBy($"doc_id")
      .agg(count(lit(1)).as("hot_cnt"), sort_array(collect_list($"g")).as("hotg"))
    val szs = grams.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val hh = hotByDoc.join(szs, "doc_id")
      .filter($"hot_cnt" * dd >= $"sz" * n)
      .select($"doc_id", explode($"hotg").as("g"))
    val hotLanePairs = hh.as("a").hint("shuffle_hash").join(hh.as("b"),
        $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
      .withColumn("c_cold", lit(0L))
    // total c = c_cold + |hotA ∩ hotB| on the pair rows; a pair seen by
    // both lanes dedups through max(c_cold) (the hot lane contributes
    // 0), which keeps the expensive cold join computed exactly once —
    // an anti-join here would re-evaluate its whole subtree
    val hotArr = hotByDoc.select($"doc_id", $"hotg")
    cColdPairs.unionByName(hotLanePairs)
      .groupBy($"doc_a", $"doc_b").agg(max($"c_cold").as("c_cold"))
      .join(hotArr.as("ha"), $"doc_a" === $"ha.doc_id", "left")
      .join(hotArr.as("hb"), $"doc_b" === $"hb.doc_id", "left")
      .select($"doc_a", $"doc_b",
        ($"c_cold" + when($"ha.hotg".isNull || $"hb.hotg".isNull, lit(0))
          .otherwise(size(array_intersect($"ha.hotg", $"hb.hotg")))).as("c"))
  }
  private val ngramJaccardSql =
    s"""WITH docs AS (SELECT doc_id, ${TextPrep.wordsSql} AS words FROM documents),
       |grams AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS g
       |          FROM docs, unnest(range(1, len(words) - 1)) t(i)),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
       |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
       |           FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       |SELECT doc_a, doc_b, c * 1.0 / (sa.sz + sb.sz - c) AS jaccard
       |FROM shared
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.3
       |ORDER BY doc_a, doc_b""".stripMargin

  // -- dedup_blocking: multi-pass sorted-neighborhood blocking audit --------
  // The THIRD blocking family beside hashing (LSH bands) and prefix
  // filtering (AllPairs): Hernández & Stolfo's 1995 sorted-neighborhood
  // method — sort the corpus by a cheap key, compare only rows within a
  // fixed rank window w. One pass misses pairs whose key diverges
  // early, so production SNM is MULTI-PASS (union candidates over
  // independent keys); here pass A sorts by the first 24 normalized
  // chars, pass B by the LAST 24 (a perturbed opening rarely also
  // perturbs the ending). Candidates = rank distance 1..w-1 under each
  // order, realized as an EQUI-join (each row probes rank+1..rank+w-1
  // — never a range join), ranks from the curriculum's layout-free
  // range-partitioned enumeration. The audit row scores the blocking
  // against the exact tau=0.8 truth (the shared-gram inverted-index
  // join, 9c >= 4(sa+sb) integer rule): candidate volume vs recall is
  // THE sorting-key design loop. 100 TB shape: sort + window is one
  // range exchange per pass; candidate count is w-bounded per row; the
  // exact-truth leg is the declared eval baseline (same as
  // dedup_minhash_recall), not a production path.
  private val SnmW = 6
  private def snmRanked(s: SparkSession, df: DataFrame, key: Column)
      : DataFrame = {
    import s.implicits._
    val keyed = df.select($"doc_id", key.as("bk")).orderBy($"bk", $"doc_id")
    val schema = org.apache.spark.sql.types.StructType(
      keyed.schema.fields :+ org.apache.spark.sql.types.StructField(
        "rn", org.apache.spark.sql.types.LongType, nullable = false))
    s.createDataFrame(
      keyed.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L)) }, schema)
      .select($"doc_id", $"rn")
  }
  private def snmCandidates(s: SparkSession, ranked: DataFrame): DataFrame = {
    import s.implicits._
    val r = ranked.localCheckpoint()
    val probes = r.select($"doc_id".as("id_a"),
      explode(array((1 until SnmW).map(i => $"rn" + i): _*)).as("rn"))
    probes.join(r.select($"doc_id".as("id_b"), $"rn"), "rn")
      .select(least($"id_a", $"id_b").as("doc_a"),
        greatest($"id_a", $"id_b").as("doc_b"))
  }
  private def snmBlocking(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val nt = TextPrep.norm($"text")
    val candA = snmCandidates(s, snmRanked(s, docs, substring(nt, 1, 24)))
    val candB = snmCandidates(s, snmRanked(s, docs,
      substring(reverse(nt), 1, 24)))
    val cand = candA.union(candB).distinct().localCheckpoint()
    val grams = docs
      .repartition($"doc_id")
      .select($"doc_id", explode(TextPrep.shingleSet($"text", 3)).as("g"))
      .localCheckpoint()
    val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val truth = grams.as("a").hint("shuffle_hash").join(grams.as("b"),
        $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sizes.as("sb"), $"doc_b" === $"sb.doc_id")
      .filter($"c" * 9 >= ($"sa.sz" + $"sb.sz") * 4)
      .select($"doc_a", $"doc_b").localCheckpoint()
    // cand is O(w * corpus) rows — never broadcast; narrow shuffle join
    val found = truth.hint("shuffle_hash").join(cand, Seq("doc_a", "doc_b"))
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select($"n_docs", $"n_candidates", $"n_truth", $"n_found",
        when($"n_truth" > 0, expr("n_found * 1000000 div n_truth"))
          .otherwise(lit(-1L)).as("recall_micro"))
  }
  // lazy: jaccardCtes is declared further down in this object
  private lazy val snmBlockingSql = {
    val nt = TextPrep.normSql
    s"""WITH $jaccardCtes,
       |truth AS (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 9 >= (sa.sz + sb.sz) * 4),
       |ka AS (SELECT doc_id, substr($nt, 1, 24) AS bk FROM documents),
       |kb AS (SELECT doc_id, substr(reverse($nt), 1, 24) AS bk
       |       FROM documents),
       |ra AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY bk, doc_id) AS rn FROM ka),
       |rb AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY bk, doc_id) AS rn FROM kb),
       |cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT least(a.doc_id, b.doc_id) AS doc_a,
       |           greatest(a.doc_id, b.doc_id) AS doc_b
       |    FROM ra a JOIN ra b ON b.rn > a.rn AND b.rn <= a.rn + ${SnmW - 1}
       |    UNION ALL
       |    SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id)
       |    FROM rb a JOIN rb b ON b.rn > a.rn AND b.rn <= a.rn + ${SnmW - 1})),
       |agg AS (SELECT
       |  (SELECT COUNT(*) FROM documents) AS n_docs,
       |  (SELECT COUNT(*) FROM cand) AS n_candidates,
       |  (SELECT COUNT(*) FROM truth) AS n_truth,
       |  (SELECT COUNT(*) FROM truth t JOIN cand c
       |     ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS n_found)
       |SELECT n_docs, n_candidates, n_truth, n_found,
       |  CASE WHEN n_truth > 0
       |       THEN CAST(n_found * 1000000 // n_truth AS BIGINT)
       |       ELSE -1 END AS recall_micro
       |FROM agg""".stripMargin
  }

  // -- exact set-similarity self-join via prefix filtering (AllPairs) -------
  // MinHash-LSH is probabilistic; this is the EXACT τ-Jaccard join made
  // feasible by candidate pruning instead of sketching (Bayardo et al.
  // WWW'07 "Scaling Up All Pairs Similarity Search" / PPJoin): order
  // every document's 3-gram shingle set — the same universe MinHash
  // sketches, so this is the exact join LSH approximates — by one
  // global permutation (document frequency ascending, token ascending,
  // rarest first),
  // take each set's (|x| − ceil(τ|x|) + 1)-prefix, and only pairs
  // sharing a PREFIX token are ever candidates — the prefix-filter
  // lemma guarantees no qualifying pair is missed, and because prefixes
  // are the RAREST tokens, candidate posting lists are the shortest
  // ones. A size filter (d·min ≥ n·max) prunes hopeless pairs before
  // verification; verification counts the exact intersection for
  // candidates only, and the final predicate is the integer
  // cross-multiplication i·(n+d) ≥ n·(|a|+|b|) for τ = n/d — no float
  // threshold to drift. τ = 4/5, the standard near-dup operating point
  // — and prefix length scales as (1−τ)·|x|, so a HIGH threshold is
  // also what keeps the candidate space small (at τ = 1/2 prefixes are
  // half of every document; at 4/5 a fifth). 100 TB shape: shuffles are
  // equi-joins on tokens and doc ids; the stop-word-dominated long
  // posting lists never join (high-df tokens land in suffixes, not
  // prefixes) — the pruning that makes exact τ-joins run where the
  // naive shared-token join dies.
  private val SetSimTauNum = 4L
  private val SetSimTauDen = 5L
  private def setsimJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (n, dd) = (SetSimTauNum, SetSimTauDen)
    val toks = Tables.documents(s, d)
      .repartition($"doc_id")
      .select($"doc_id", explode(TextPrep.shingleSet($"text", 3)).as("tok"))
      .localCheckpoint()
    val dfreq = toks.groupBy($"tok").agg(count(lit(1)).as("df"))
    val sizes = toks.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val wDoc = Window.partitionBy($"doc_id").orderBy($"df", $"tok")
    // every build side below (dfreq, sizes, cand) is corpus-proportional
    // — doc- or pair-count rows — so nothing here may broadcast
    val prefix = toks.hint("shuffle_hash").join(dfreq, "tok")
      .hint("shuffle_hash").join(sizes, "doc_id")
      .withColumn("rk", row_number().over(wDoc))
      .filter($"rk" <= $"sz" - expr(s"(sz * $n + $dd - 1) div $dd") + 1)
      .select($"doc_id", $"tok", $"sz")
    val cand = prefix.as("x").hint("shuffle_hash").join(prefix.as("y"),
        $"x.tok" === $"y.tok" && $"x.doc_id" < $"y.doc_id" &&
          least($"x.sz", $"y.sz") * dd >= greatest($"x.sz", $"y.sz") * n)
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    // verification: the former shape re-exploded every candidate doc
    // through two token equi-joins (candidate-pairs × |tokens| rows —
    // 3.2M shuffled rows at sf0.1 for 44k pairs), then re-aggregated.
    // The token SET of a doc is one array row, so the exact
    // intersection is a row-local array_intersect after two id-keyed
    // joins — the shuffles carry one array row per doc and one row per
    // candidate pair, nothing explodes (guide §2.3: shuffle keys and
    // payload once, not per token). shingleSet is distinct by
    // construction, so |array_intersect| equals the old join count.
    val sets = toks.groupBy($"doc_id")
      .agg(collect_list($"tok").as("ts"), count(lit(1)).as("sz"))
    val inter = cand
      .hint("shuffle_hash")
      .join(sets.select($"doc_id".as("doc_a"), $"ts".as("ts_a"),
        $"sz".as("sz_a")), "doc_a")
      .hint("shuffle_hash")
      .join(sets.select($"doc_id".as("doc_b"), $"ts".as("ts_b"),
        $"sz".as("sz_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        size(array_intersect($"ts_a", $"ts_b")).cast("long").as("inter"),
        $"sz_a", $"sz_b")
    inter
      .filter($"inter" * (n + dd) >= lit(n) * ($"sz_a" + $"sz_b"))
      .select($"doc_a", $"doc_b", $"inter", $"sz_a", $"sz_b",
        expr("(inter * 1000000) div (sz_a + sz_b - inter)").as("jacc_micro"))
      .orderBy($"doc_a", $"doc_b")
  }
  private val setsimJoinSql = {
    val (n, dd) = (SetSimTauNum, SetSimTauDen)
    s"""WITH docs AS (SELECT doc_id, ${TextPrep.wordsSql} AS words FROM documents),
       |toks AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS tok
       |         FROM docs, unnest(range(1, len(words) - 1)) t(i)),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY 1),
       |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    COUNT(*) AS inter
       |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
       |  (inter * 1000000) // (sa.sz + sb.sz - inter) AS jacc_micro
       |FROM shared
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE inter * ${n + dd} >= $n * (sa.sz + sb.sz)
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -- directional n-gram containment (quote / subset detection) ------------
  // Jaccard misses the asymmetric case dedup pipelines care about most:
  // a short document wholly QUOTED inside a long one scores low
  // symmetric similarity (|A∩B|/|A∪B| shrinks with the size gap) but
  // containment C(A→B) = |A∩B|/|A| ≈ 1. Same inverted-index join as
  // ngramJaccard — only docs sharing a gram ever meet, never a cross
  // join — with BOTH directions emitted from the one undirected
  // shared-gram count (c/|A| and c/|B|); threshold 0.9. The emitted
  // (contained, container) pairs are what the excision pass
  // (dedup_substring) and source-priority keep rules consume.
  /** The thresholded (contained, container, containment) pairs — shared
    * by the report query (dedup_containment) and the composed keep-rule
    * (dedup_containment_apply). */
  private def containmentPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // shingle once, parallel, checkpointed (see ngramJaccard)
    val grams = Tables.documents(s, d)
      .repartition($"doc_id")
      .select($"doc_id", explode(TextPrep.shingleSet($"text", 3)).as("g"))
      .localCheckpoint()
    val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    // shuffle-hash hint — see ngramJaccard (no corpus-sized broadcast)
    val shared = grams.as("a").hint("shuffle_hash").join(grams.as("b"),
        $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sizes.as("sb"), $"doc_b" === $"sb.doc_id")
      .select($"doc_a", $"doc_b", $"c", $"sa.sz".as("sza"), $"sb.sz".as("szb"))
    val aInB = shared.select($"doc_a".as("contained"), $"doc_b".as("container"),
      ($"c".cast("double") / $"sza").as("containment"))
    val bInA = shared.select($"doc_b".as("contained"), $"doc_a".as("container"),
      ($"c".cast("double") / $"szb").as("containment"))
    aInB.unionByName(bInA).filter($"containment" >= 0.9)
  }

  private def ngramContainment(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    containmentPairs(s, d).orderBy($"contained", $"container")
  }
  /** Shared oracle CTE chain ending in `both_dirs` (contained,
    * container, containment). */
  private val containmentCte =
    s"""docs AS (SELECT doc_id, ${TextPrep.wordsSql} AS words FROM documents),
       |grams AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS g
       |          FROM docs, unnest(range(1, len(words) - 1)) t(i)),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
       |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
       |           FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |sided AS (SELECT doc_a, doc_b, c, sa.sz AS sza, sb.sz AS szb
       |  FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b),
       |both_dirs AS (
       |  SELECT doc_a AS contained, doc_b AS container,
       |    CAST(c AS DOUBLE) / sza AS containment FROM sided
       |  UNION ALL
       |  SELECT doc_b AS contained, doc_a AS container,
       |    CAST(c AS DOUBLE) / szb AS containment FROM sided)""".stripMargin

  private val ngramContainmentSql =
    s"""WITH $containmentCte
       |SELECT contained, container, containment FROM both_dirs
       |WHERE containment >= 0.9 ORDER BY contained, container""".stripMargin

  // -- containment keep-rule application (SURVEY 32e's excision hook) -------
  // The composed pass the detection report feeds: a doc quoted inside a
  // longer one is EXCISED and its content survives through the kept
  // container ("short-doc-quoted-in-long keeps the long"). Mutual
  // containment (near-identical docs — both directions >= 0.9) would
  // naively drop both; the priority rule protects the winner: longer
  // n_chars wins, ties to the smaller doc_id. Output is the applied
  // decision table: every excised doc, the container chosen to keep
  // (smallest id among its killers — greedy, deterministic) and the
  // chars removed from the corpus. Scale shape: pairs are the banded
  // inverted-index join's output (never all-pairs), and the keep-rule
  // is two narrow self-joins over that pair set — O(pairs), not
  // O(corpus²).
  private def containmentApply(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lens = Tables.documents(s, d).select($"doc_id", $"n_chars")
    // four consumers read the pair set (kills + both sides of the
    // mutual self-join) — materialize it once; it is pair-sized
    val p = containmentPairs(s, d).select($"contained", $"container")
      .localCheckpoint()
    val mutual = p.as("x").join(p.as("y"),
        $"x.contained" === $"y.container" && $"x.container" === $"y.contained",
        "left_semi")
      .select($"contained", $"container")
    val protectedPairs = mutual
      .join(lens.select($"doc_id".as("contained"), $"n_chars".as("lc")), "contained")
      .join(lens.select($"doc_id".as("container"), $"n_chars".as("lo")), "container")
      .filter($"lc" > $"lo" || ($"lc" === $"lo" && $"contained" < $"container"))
      .select($"contained", $"container")
    p.except(protectedPairs)
      .groupBy($"contained")
      .agg(min($"container").as("kept_by"))
      .join(lens.select($"doc_id".as("contained"), $"n_chars"), "contained")
      .select($"contained".as("doc_id"), $"kept_by",
        $"n_chars".as("chars_excised"))
      .orderBy($"doc_id")
  }
  private val containmentApplySql =
    s"""WITH $containmentCte,
       |pairs AS (SELECT DISTINCT contained, container FROM both_dirs
       |          WHERE containment >= 0.9),
       |mutual AS (SELECT x.contained, x.container FROM pairs x
       |           JOIN pairs y ON x.contained = y.container
       |                       AND x.container = y.contained),
       |prot AS (SELECT m.contained, m.container FROM mutual m
       |  JOIN documents lc ON lc.doc_id = m.contained
       |  JOIN documents lo ON lo.doc_id = m.container
       |  WHERE lc.n_chars > lo.n_chars
       |     OR (lc.n_chars = lo.n_chars AND m.contained < m.container)),
       |kills AS (SELECT contained, container FROM pairs
       |          EXCEPT SELECT contained, container FROM prot)
       |SELECT k.contained AS doc_id, MIN(k.container) AS kept_by,
       |  d.n_chars AS chars_excised
       |FROM kills k JOIN documents d ON d.doc_id = k.contained
       |GROUP BY k.contained, d.n_chars ORDER BY doc_id""".stripMargin

  // -- MinHash + LSH near-dup ----------------------------------------------
  // 128-lane minhash signature (one-pass custom expression), banded
  // 32×4; docs agreeing on any band become candidates; candidates are
  // verified with EXACT set Jaccard, so at J ≥ 0.8 the LSH miss
  // probability is (1 - 0.8⁴)³² ≈ 5e-8 — the result provably matches
  // the exact-pairwise oracle on any realistic corpus.
  private val Lanes = 128
  private val Bands = 32
  private val RowsPerBand = Lanes / Bands

  /** Spec instrumentation: number of times the pair-graph build
    * actually ran (staging misses). Queries over an already-staged
    * dataset must leave this unchanged — zero shingle/signature jobs
    * on the query path. */
  private[graft] val pairStageRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** Stage the VERIFIED near-dup pair set (doc_a, doc_b, jaccard) ONCE
    * per dataset — the dedup twin of the ANN/BM25 index staging: the
    * full shingle → minhash → band → exact-Jaccard-verify pipeline is
    * the single most re-derived prefix in the suite (connected
    * components, PageRank, triangles, the leakage-safe split and the
    * composed curriculum all sit on this graph), and at 100 TB the pair
    * graph IS a stored artifact — dedup systems persist it and every
    * downstream graph/split job reads it. Same [[Tables.stagingKey]]
    * content-fingerprint freshness + [[graft.Staging]] swap-publish /
    * vacuum lifecycle as the other staged indexes; the build is the
    * deterministic [[minhashPairs]] pipeline itself, so the staged
    * table is bit-identical to inline derivation — which is why every
    * consumer's DuckDB oracle can keep replaying the pipeline from the
    * raw corpus. */
  private[graft] def pairsRoot(s: SparkSession, d: String): String = {
    val (dirKey, fp) = Tables.stagingKey(d, "documents")
    val root = s"/tmp/graft_q/pairs_$dirKey"
    val marker = java.nio.file.Paths.get(root, "staging_format.txt")
    val fmt = s"v1-minhash-pairs|$fp"
    if (java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == fmt) {
      if (!new java.io.File(root, "staging_source.txt").exists())
        graft.Staging.recordSource(root, d, "documents", fp)
      return root
    }
    pairStageRuns.incrementAndGet()
    graft.Staging.vacuum()
    val tmp = graft.Staging.tempBuildDir()
    minhashPairs(s, d).write.mode("overwrite").parquet(s"$tmp/pairs")
    java.nio.file.Files.write(tmp.toPath.resolve("staging_format.txt"),
      fmt.getBytes("UTF-8"))
    graft.Staging.publish(tmp, root, d, "documents", fp)
    root
  }

  /** The verified J ≥ 0.8 pair set served from the staged parquet —
    * what every graph/split consumer reads instead of re-running LSH. */
  private[graft] def verifiedPairs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${pairsRoot(s, d)}/pairs")

  private def minhashLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    verifiedPairs(s, d).orderBy($"doc_a", $"doc_b")
  }

  /** The full candidate-generate + exact-verify pipeline (the staging
    * BUILD; queries read [[verifiedPairs]]). */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // shingle + 128-lane signature once, parallel, checkpointed: the
    // band branch and BOTH verify branches consume this frame (3 plan
    // references), and the local one-file scan otherwise runs the
    // whole CPU-bound map as one task (the dedup_simhash lesson)
    val docs = Tables.documents(s, d)
      .repartition($"doc_id")
      .select($"doc_id", TextPrep.shingleSet($"text", 3).as("grams"))
      .withColumn("sig", minhash_sig($"grams", Lanes))
      .localCheckpoint()
    val bands = docs.select($"doc_id",
        explode(array((0 until Bands).map(b =>
          xxhash64(lit(b) +: (0 until RowsPerBand).map(r =>
            get($"sig", lit(b * RowsPerBand + r))): _*)): _*)).as("band_key"))
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band_key" === $"b.band_key" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    val sets = docs.select($"doc_id", $"grams")
    cand
      .join(sets.as("ga"), $"doc_a" === $"ga.doc_id")
      .join(sets.as("gb"), $"doc_b" === $"gb.doc_id")
      .select($"doc_a", $"doc_b",
        (size(array_intersect($"ga.grams", $"gb.grams")) /
          (size($"ga.grams") + size($"gb.grams") -
            size(array_intersect($"ga.grams", $"gb.grams"))).cast("double")).as("jaccard"))
      .filter($"jaccard" >= 0.8)
      .orderBy($"doc_a", $"doc_b")
  }
  /** Shared oracle CTE chain: exact-Jaccard candidate machinery
    * (normalized 3-gram inverted index), used by the minhash oracle and
    * the connected-components oracle. */
  private val jaccardCtes =
    s"""docs AS (SELECT doc_id, ${TextPrep.wordsSql} AS words FROM documents),
       |grams AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS g
       |          FROM docs, unnest(range(1, len(words) - 1)) t(i)),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
       |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
       |           FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)""".stripMargin

  private val minhashLshSql =
    s"""WITH $jaccardCtes
       |SELECT doc_a, doc_b, c * 1.0 / (sa.sz + sb.sz - c) AS jaccard
       |FROM shared
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  // -- q_rouge_pairs: ROUGE-1/2 overlap report over the near-dup pairs ------
  // The eval-metric layer on top of the dedup graph: Jaccard said the
  // pair is a near-dup; ROUGE says HOW the texts overlap — the
  // summarization-eval staple (Lin 2004) doubling as the dedup
  // adjudication report a human reviews before committing a keep-rule.
  // Per verified pair and n ∈ {1, 2}: modified n-gram overlap with
  // MULTIPLICITY (Σ_g min(cnt_a, cnt_b) — the "modified" in modified
  // precision; set-Jaccard can't see a doc that repeats its twin's
  // vocabulary), recall = ov/|a|, precision = ov/|b|, and F1 collapses
  // to the exact single division 2·ov/(|a|+|b|). All counts are exact
  // integers; the three ratios are IEEE divisions rounded at 6. Scale:
  // pairs come from the STAGED graph (no LSH replay); only pair-member
  // docs are re-tokenized (a left-semi pushdown), so cost is
  // O(pairs × doc length), corpus-independent.
  // Degenerate-member rule (intentional, oracle-mirrored): a pair whose
  // member has < n words has NO n-gram totals row, and the inner join
  // on totals drops that pair from the n=2 leg — it reports only its
  // n=1 row. ROUGE-2 of a one-word doc is undefined (0/0), so omission
  // is the honest report; the SQL oracle's `JOIN t2` drops the same
  // rows, keeping both engines exactly symmetric.
  private def rougePairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = verifiedPairs(s, d).select($"doc_a", $"doc_b")
    val need = pairs.select($"doc_a".as("doc_id"))
      .unionByName(pairs.select($"doc_b".as("doc_id"))).distinct()
    val docs = Tables.documents(s, d)
      .join(need, Seq("doc_id"), "left_semi")
      .select($"doc_id", TextPrep.words($"text").as("words"))
      .localCheckpoint() // pair-proportional; feeds both gram legs
    def counts(n: Int): DataFrame = {
      val g =
        if (n == 1) docs.select($"doc_id", explode($"words").as("g"))
          .filter($"g" =!= "")
        else docs.filter(size($"words") >= n).select($"doc_id",
          explode(expr(s"transform(sequence(1, size(words) - ${n - 1}), " +
            s"i -> array_join(slice(words, i, $n), ' '))")).as("g"))
      g.groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
    }
    def leg(n: Int): DataFrame = {
      val cn = counts(n)
      val totals = cn.groupBy($"doc_id").agg(sum($"c").as("tot"))
      val ov = pairs
        .join(cn.as("x"), $"doc_a" === $"x.doc_id")
        .join(cn.as("y"), $"doc_b" === $"y.doc_id" && $"x.g" === $"y.g")
        .groupBy($"doc_a", $"doc_b")
        .agg(sum(least($"x.c", $"y.c")).as("ov"))
      pairs
        .join(ov, Seq("doc_a", "doc_b"), "left").na.fill(0L, Seq("ov"))
        .join(totals.select($"doc_id".as("doc_a"), $"tot".as("total_a")), "doc_a")
        .join(totals.select($"doc_id".as("doc_b"), $"tot".as("total_b")), "doc_b")
        .select($"doc_a", $"doc_b", lit(n.toLong).as("n"),
          $"ov".as("overlap"), $"total_a", $"total_b",
          round($"ov" / $"total_b".cast("double"), 6).as("p6"),
          round($"ov" / $"total_a".cast("double"), 6).as("r6"),
          round(lit(2.0) * $"ov" / ($"total_a" + $"total_b").cast("double"), 6)
            .as("f6"))
    }
    leg(1).unionByName(leg(2)).orderBy($"doc_a", $"doc_b", $"n")
  }
  private val rougePairsSql =
    s"""WITH $jaccardCtes,
       |pairs AS (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |g1 AS (SELECT doc_id, g, COUNT(*) AS c FROM (
       |    SELECT doc_id, unnest(words) AS g FROM docs)
       |  WHERE g <> '' GROUP BY 1, 2),
       |g2 AS (SELECT doc_id, g, COUNT(*) AS c FROM (
       |    SELECT doc_id, array_to_string(words[i:i+1], ' ') AS g
       |    FROM docs, unnest(range(1, len(words))) t(i))
       |  GROUP BY 1, 2),
       |t1 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tot FROM g1 GROUP BY 1),
       |t2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tot FROM g2 GROUP BY 1),
       |o1 AS (SELECT p.doc_a, p.doc_b, CAST(SUM(least(x.c, y.c)) AS BIGINT)
       |      AS ov
       |  FROM pairs p
       |  JOIN g1 x ON x.doc_id = p.doc_a
       |  JOIN g1 y ON y.doc_id = p.doc_b AND y.g = x.g
       |  GROUP BY 1, 2),
       |o2 AS (SELECT p.doc_a, p.doc_b, CAST(SUM(least(x.c, y.c)) AS BIGINT)
       |      AS ov
       |  FROM pairs p
       |  JOIN g2 x ON x.doc_id = p.doc_a
       |  JOIN g2 y ON y.doc_id = p.doc_b AND y.g = x.g
       |  GROUP BY 1, 2),
       |l1 AS (SELECT p.doc_a, p.doc_b, CAST(1 AS BIGINT) AS n,
       |    COALESCE(o1.ov, 0) AS overlap, ta.tot AS total_a, tb.tot AS total_b
       |  FROM pairs p
       |  LEFT JOIN o1 ON o1.doc_a = p.doc_a AND o1.doc_b = p.doc_b
       |  JOIN t1 ta ON ta.doc_id = p.doc_a
       |  JOIN t1 tb ON tb.doc_id = p.doc_b),
       |l2 AS (SELECT p.doc_a, p.doc_b, CAST(2 AS BIGINT) AS n,
       |    COALESCE(o2.ov, 0) AS overlap, ta.tot AS total_a, tb.tot AS total_b
       |  FROM pairs p
       |  LEFT JOIN o2 ON o2.doc_a = p.doc_a AND o2.doc_b = p.doc_b
       |  JOIN t2 ta ON ta.doc_id = p.doc_a
       |  JOIN t2 tb ON tb.doc_id = p.doc_b),
       |u AS (SELECT * FROM l1 UNION ALL SELECT * FROM l2)
       |SELECT doc_a, doc_b, n, overlap, total_a, total_b,
       |  round(overlap / CAST(total_b AS DOUBLE), 6) AS p6,
       |  round(overlap / CAST(total_a AS DOUBLE), 6) AS r6,
       |  round(2.0 * overlap / CAST(total_a + total_b AS DOUBLE), 6) AS f6
       |FROM u ORDER BY doc_a, doc_b, n""".stripMargin

  // -- MinHash-LSH candidate-recall accounting ------------------------------
  // The dedup twin of q_ann_recall: banded LSH is probabilistic — a
  // J ≥ 0.8 pair that never collides on any band is silently missed —
  // so production dedup monitors CANDIDATE RECALL against exact truth
  // (with B=8 bands of r=4 rows, P[candidate | J=0.8] = 1-(1-J⁴)⁸ ≈
  // 0.984; lower J pairs decay fast — the S-curve this op measures).
  // Both legs are scalable equi-joins: truth = the shared-gram
  // inverted-index join (dedup_ngram_jaccard's shape, integer-exact
  // J ≥ 0.8 as 10c ≥ 8(|A|+|B|-c)); candidates = the band-key
  // self-join. The signature here is REPLAYABLE minhash (unlike
  // dedup_minhash_lsh's xxhash bands): per-gram md5-low-half → 31-bit
  // residue → 32 universal-hash lanes (a·h+b mod M₃₁, constants
  // LCG-derived — every product fits a signed 64-bit on both engines),
  // min per lane, band key = 4 lane values. Output is the one-row
  // accounting: |truth|, |candidates|, |hit|, recall — integer counts
  // plus one IEEE division.
  private val RecLanes = 32
  private val RecRows = 4 // lanes per band → 8 bands
  private val RecM = 2147483647L // M₃₁ = 2³¹-1 (Mersenne)
  /** Deterministic universal-hash constants: a ∈ [1,M), b ∈ [0,M) from
    * a fixed LCG — literal-embedded in both engines' plans. */
  private val recAB: Seq[(Long, Long)] = {
    var x = BigInt(88172645463325252L)
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L)
      .mod(BigInt(2).pow(64)); (x % RecM).toLong }
    (0 until RecLanes).map(_ => (next() % (RecM - 1) + 1, next()))
  }
  private def minhashRecall(s: SparkSession, d: String): DataFrame =
    minhashRecallOn(s, d, RecRows)

  /** The recall accounting with a chosen band shape (lanes per band out
    * of the 32 — wider bands collide less, recall drops below 1), so
    * the spec can demonstrate the measurement actually measuring. */
  private[graft] def minhashRecallOn(s: SparkSession, d: String,
      rowsPerBand: Int): DataFrame = {
    import s.implicits._
    require(RecLanes % rowsPerBand == 0, s"band shape $rowsPerBand !| $RecLanes")
    // truth and signature both fork off the gram table — materialize it
    // once or the shingle pipeline (normalize + shingle + explode) runs
    // per branch
    val grams = Tables.documents(s, d)
      .repartition($"doc_id") // parallelize the CPU-bound shingle map
      .select($"doc_id", explode(TextPrep.shingleSet($"text", 3)).as("g"))
      .localCheckpoint()
    // exact truth via the inverted-index join, integer-exact threshold
    val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val truth = grams.as("a").hint("shuffle_hash").join(grams.as("b"),
        $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sizes.as("sb"), $"doc_b" === $"sb.doc_id")
      .filter($"c" * 10 >= ($"sa.sz" + $"sb.sz" - $"c") * 8)
      .select($"doc_a", $"doc_b")
    // replayable minhash signature: min per lane of (a·h31+b) mod M
    val h31 = grams.select($"doc_id",
      (md5lower64($"g").bitwiseAND(lit(Long.MaxValue)) % RecM).as("h"))
    val laneMins = recAB.zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * $"h" + lit(b)) % RecM).as(s"l$j")
    }
    val sig = h31.groupBy($"doc_id").agg(laneMins.head, laneMins.tail: _*)
    val bands = sig.select($"doc_id",
      explode(array((0 until RecLanes / rowsPerBand).map(bd =>
        struct(lit(bd).as("band"),
          concat_ws("-", (0 until rowsPerBand).map(r =>
            col(s"l${bd * rowsPerBand + r}")): _*).as("key"))): _*)).as("bk"))
      .select($"doc_id", $"bk.band", $"bk.key")
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    val hit = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select($"n_truth", $"n_candidates", $"n_hit",
        when($"n_truth" === 0, 1.0)
          .otherwise($"n_hit".cast("double") / $"n_truth").as("recall"))
  }
  private val minhashRecallSql = {
    val aList = recAB.map(_._1).mkString("[", ", ", "]")
    val bList = recAB.map(_._2).mkString("[", ", ", "]")
    s"""WITH $jaccardCtes,
       |truth AS (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 10 >= (sa.sz + sb.sz - c) * 8),
       |h31 AS (SELECT doc_id,
       |    CAST(CAST(md5_number_lower(g) AS HUGEINT)
       |      % CAST(9223372036854775808 AS HUGEINT) AS BIGINT) % $RecM AS h
       |  FROM grams),
       |lanes AS (SELECT doc_id, j.j AS j,
       |    MIN((list_extract($aList, CAST(j.j AS INTEGER) + 1) * h
       |       + list_extract($bList, CAST(j.j AS INTEGER) + 1)) % $RecM) AS v
       |  FROM h31, unnest(range(0, $RecLanes)) j(j) GROUP BY 1, 2),
       |bands AS (SELECT doc_id, j // $RecRows AS band,
       |    string_agg(CAST(v AS VARCHAR), '-' ORDER BY j) AS key
       |  FROM lanes GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |hit AS (SELECT doc_a, doc_b FROM cand
       |  WHERE EXISTS (SELECT 1 FROM truth t
       |                WHERE t.doc_a = cand.doc_a AND t.doc_b = cand.doc_b)),
       |nt AS (SELECT COUNT(*) AS n_truth FROM truth),
       |nc AS (SELECT COUNT(*) AS n_candidates FROM cand),
       |nh AS (SELECT COUNT(*) AS n_hit FROM hit)
       |SELECT n_truth, n_candidates, n_hit,
       |  CASE WHEN n_truth = 0 THEN 1.0
       |       ELSE CAST(n_hit AS DOUBLE) / n_truth END AS recall
       |FROM nt CROSS JOIN nc CROSS JOIN nh""".stripMargin
  }

  // -- SimHash near-dup ----------------------------------------------------
  // 64-bit simhash over the shingle set, banded into k+1 = 13 blocks
  // (12×5 bits + 1×4 bits): by pigeonhole, any pair at hamming ≤ 12
  // agrees on ≥ 1 block, so the block-equality join is a COMPLETE
  // candidate generator for the hamming ≤ 12 filter (the k+1-block
  // scheme of Manku et al., WWW'07 "Detecting Near-Duplicates for Web
  // Crawling"). Block width is the precision lever: a random pair
  // collides on a 5-bit block with p=1/32 (vs 1 in expectation with
  // 16×4-bit blocks, which made every pair a candidate).
  //
  // Budgets ABOVE 12 use multi-probe instead of narrower blocks: with
  // 13 blocks, a pair needs ≥ 26 differing bits before every block can
  // hold ≥ 2 of them, so at any hamming ≤ 25 some block differs by AT
  // MOST ONE bit — probing each block's exact value plus all 1-bit
  // flips (≤ 6 keys per block) is therefore complete through hamming
  // 25, at ~6× the join keys instead of the all-pairs blowup that
  // 4-bit blocks caused. The hamming filter runs BEFORE the pair-dedup
  // so the distinct only sees near-pairs, not the full candidate set.
  // Value-oracled since r9: the md5-low-half gram hash is natively
  // computable in DuckDB, so the oracle replays the signature and
  // brute-forces hamming (see simhashSql); specs additionally
  // cross-check completeness against exact Jaccard pairs.
  // Default budget 12 — the pigeonhole bound of the plain 13-block
  // join, which keeps the candidate join at one key per (doc, block).
  // Budgets 13-25 engage the multi-probe side below (complete: some
  // block differs by ≤ 1 bit) at ~6× the join keys — the specs
  // exercise that path explicitly at 15/16; the driver gate runs the
  // plain join (its corpus separates dups ≤ 9 from non-dups ≥ 16).
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 12): DataFrame = {
    import s.implicits._
    require(maxHamming <= 25,
      s"simhash banding is complete only to hamming 25 (got $maxHamming); " +
        "re-band with wider blocks or deeper probing for larger budgets")
    val widths = Seq.fill(12)(5) :+ 4 // 13 blocks cover all 64 bits
    val offsets = widths.scanLeft(0)(_ + _).init
    // The signature map is the query's CPU (shingle + 64 weighted-bit
    // folds per doc) and BOTH self-join branches consume it, so it is
    // computed ONCE over a repartitioned scan and checkpointed as
    // 16-byte (doc_id, sig) rows. The repartition exists for the local
    // small-file layout only (one parquet file = one input split = one
    // task pinning 31 cores idle — measured 2.5-3.3s single-task
    // stages, twice); at real scale the scan already yields thousands
    // of splits and the exchange is a no-op cost-wise (text shuffles
    // once, signatures never recompute).
    val docs = Tables.documents(s, d)
      .repartition($"doc_id")
      .select($"doc_id", simhash64(TextPrep.shingleSet($"text", 3)).as("sig"))
      .localCheckpoint()
    def blockVal(b: Int): Column =
      shiftrightunsigned($"sig", offsets(b)).bitwiseAND(lit((1L << widths(b)) - 1))
    // posexplode over a flat long array: the position IS the band id —
    // a 13-entry named_struct array here generates a Janino method big
    // enough that its one-time compile dominated the query (9s of a 13s
    // first run at sf0.1; steady-state is 4.6s)
    val exact = docs.select($"doc_id", $"sig",
        posexplode(array((0 until widths.size).map(blockVal): _*))
          .as(Seq("band_id", "band_val")))
    // probe side: exact value + every 1-bit flip of each block (only
    // needed beyond the pigeonhole budget of the plain block join)
    val probeSide =
      if (maxHamming <= 12) exact
      else docs.select($"doc_id", $"sig",
          explode(array((for {
            b <- 0 until widths.size
            flip <- 0 to widths(b) // 0 = no flip, k = flip bit k-1
          } yield struct(lit(b).as("band_id"),
            (if (flip == 0) blockVal(b)
             else blockVal(b).bitwiseXOR(lit(1L << (flip - 1)))).as("band_val"))): _*)).as("band"))
        .select($"doc_id", $"sig", $"band.band_id", $"band.band_val")
    exact.as("a").join(probeSide.as("b"),
        $"a.band_id" === $"b.band_id" && $"a.band_val" === $"b.band_val" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        bit_count($"a.sig".bitwiseXOR($"b.sig")).as("hamming"))
      .filter($"hamming" <= maxHamming)
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }
  private def simhash(s: SparkSession, d: String): DataFrame = simhashPairs(s, d)

  /** Value oracle for the simhash pairs: replay the 64-bit signature in
    * DuckDB — the gram hash is md5's low half precisely so both engines
    * compute it natively (`md5_number_lower` ↔ [[graft.functions.impl.md5Lower64]])
    * — then brute-force hamming over all signature pairs. The 13-block
    * banding in [[simhashPairs]] is COMPLETE to hamming 12 by
    * pigeonhole, so the bucketed candidate join must emit exactly the
    * brute-force pair set; gramless docs (< 3 words) carry sig = 0 on
    * both engines. */
  private val simhashSql =
    s"""WITH docs AS (SELECT doc_id, ${TextPrep.wordsSql} AS words FROM documents),
       |grams AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS g
       |          FROM docs, unnest(range(1, len(words) - 1)) t(i)),
       |hv AS (SELECT doc_id, md5_number_lower(g) AS h FROM grams),
       |votes AS (SELECT doc_id, b.b AS b,
       |    SUM(CASE WHEN (h >> CAST(b.b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM hv, unnest(range(0, 64)) b(b) GROUP BY doc_id, b.b),
       |sig0 AS (SELECT doc_id,
       |    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << CAST(b AS INTEGER)
       |             ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sig
       |  FROM votes GROUP BY doc_id),
       |sigs AS (SELECT d.doc_id, COALESCE(s.sig, CAST(0 AS UBIGINT)) AS sig
       |  FROM documents d LEFT JOIN sig0 s ON d.doc_id = s.doc_id),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs
       |WHERE hamming <= 12 ORDER BY doc_a, doc_b""".stripMargin

  // -- duplicate-cluster resolution (connected components) -----------------
  // Near-dup PAIRS are not yet a dedup policy: keep-one needs the full
  // duplicate CLUSTER (a~b and b~c put a,c in one cluster even though
  // they never shared a bucket). Components via Pregel-style min-label
  // propagation: every round each node adopts the minimum label among
  // itself and its neighbors — O(cluster diameter) rounds, each one
  // narrow (id, label) equi-join shuffle; the adjacency never
  // concentrates on one machine, which is the 100 TB shape (GraphX CC
  // is this same loop). Near-dup clusters at J ≥ 0.8 are near-cliques,
  // so the diameter — and the round count — stays tiny. The driver
  // loop runs one O(1)-row convergence aggregate per round, not a
  // per-row collect. Oracle: DuckDB recursive-CTE transitive closure
  // over the same exact-Jaccard ≥ 0.8 pairs the minhash oracle pins.
  def componentLabels(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    // cache + materialize the pair list BEFORE any plan forks off it:
    // edges is pairs ∪ reverse(pairs) and the loop re-reads edges every
    // round — without this, each uncached branch recomputes the entire
    // candidate-generation pipeline upstream of `pairs` (measured ~2×
    // the whole query cost at sf0.1)
    val p = pairs.toDF("src", "dst").cache()
    p.count()
    val edges = p.union(p.select($"dst".as("src"), $"src".as("dst"))).cache()
    // Each round references `labels` THREE times (neighbor lookup, the
    // carried prev_label, the pointer jump), and cache() does NOT
    // truncate the logical plan — so chaining rounds directly triples
    // the analyzed tree per round and the driver spends O(3^rounds) in
    // the analyzer (this, not execution, was the measured 499s at
    // sf0.1). localCheckpoint (eager) collapses each round's result to
    // a constant-size LogicalRDD leaf: plans stay O(1), rounds stay two
    // narrow (id,label) equi-joins. The superseded round's checkpoint
    // blocks are dropped as soon as the next round materializes.
    // A localCheckpoint'd Dataset's logical plan is a LogicalRDD whose
    // `rdd` IS the persisted checkpoint RDD — unpersist exactly that,
    // never a before/after diff of the global persistent-RDD registry
    // (a concurrent query's cache landing in the diff window would get
    // its blocks dropped out from under it).
    def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.logical.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
      }
    def dropBlocks(rdds: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
      rdds.foreach(_.unpersist(blocking = false))
    var labels = edges.select($"src".as("id")).distinct()
      .select($"id", $"id".as("label")).localCheckpoint()
    var labelBlocks = checkpointRdds(labels)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      // neighbor propagation: adopt the min label among direct neighbors
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src")).agg(min($"label").as("nbr_min"))
      val viaNbr = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"),
          least($"label", coalesce($"nbr_min", $"label")).as("l1"),
          $"label".as("prev_label"))
      // pointer jump: also adopt the CURRENT label of the adopted label
      // (label(x) ← label(label(x))) — collapses label chains
      // geometrically, so long components converge in O(log diameter)
      // rounds instead of O(diameter)
      // LAZY checkpoint: the convergence count below is the action that
      // materializes it, so each round schedules ONE job, not two (the
      // loop is scheduling-bound — every round's stages are milliseconds
      // at any graph the candidates stage admits; the eager-checkpoint
      // job + count job pair doubled the per-round barrier cost)
      val next = viaNbr.as("x")
        .join(labels.select($"id".as("jid"), $"label".as("jlabel")), $"l1" === $"jid", "left")
        .select($"x.id",
          least($"l1", coalesce($"jlabel", $"l1")).as("next_label"),
          $"prev_label")
        .localCheckpoint(eager = false)
      val nextBlocks = checkpointRdds(next)
      changed = next.filter($"next_label" < $"prev_label").count()
      labels = next.select($"id", $"next_label".as("label"))
      dropBlocks(labelBlocks) // previous round is now dead
      labelBlocks = nextBlocks
      rounds += 1
    }
    edges.unpersist(blocking = false)
    p.unpersist(blocking = false)
    // silent non-convergence would hand the caller SPLIT components that
    // look like a correct answer
    if (changed > 0) throw new IllegalStateException(
      s"componentLabels did not converge after $maxRounds rounds " +
        s"($changed labels still shrinking); raise maxRounds")
    labels
  }

  private def components(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = verifiedPairs(s, d).select($"doc_a", $"doc_b")
    componentLabels(pairs)
      .groupBy($"label".as("component"))
      .agg(count(lit(1)).as("n_docs"), sort_array(collect_list($"id")).as("m"))
      .select($"component", $"n_docs",
        expr("concat_ws(',', transform(m, x -> CAST(x AS STRING)))").as("members"))
      .orderBy($"component")
  }
  private val componentsSql =
    s"""WITH RECURSIVE $jaccardCtes,
       |pairs AS (
       |  SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(id, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
       |comp AS (SELECT id, MIN(label) AS component FROM reach GROUP BY id)
       |SELECT component, COUNT(*) AS n_docs,
       |  STRING_AGG(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
       |FROM comp GROUP BY component ORDER BY component""".stripMargin

  // -- q_leakage_split: near-dup-aware train/heldout split ------------------
  // The reason dedup matters for EVAL integrity, made an operator: a
  // random per-doc split leaks — a near-duplicate of a heldout doc in
  // the train side inflates every downstream eval. Splitting BY
  // NEAR-DUP COMPONENT (the dedup_components labels; singletons are
  // their own component) guarantees structurally that no J ≥ 0.8 pair
  // ever straddles the split. Assignment is the mixture ops'
  // deterministic md5 keep-key over the COMPONENT label (~80/20), so
  // re-running the pipeline reproduces the byte-identical split — the
  // property a training-data freeze needs — and the oracle replays it.
  // Scale: components come from the banded LSH pair set (never
  // corpus²); the split itself is a row-local hash over one
  // corpus ⟕ labels join.
  /** The (doc_id, component, split) frame — shared with the composed
    * eval-safe curriculum (pipeline_curriculum, TextAnalysis). */
  private[operators] def leakageSplitFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = verifiedPairs(s, d).select($"doc_a", $"doc_b")
    val labels = componentLabels(pairs)
    Tables.documents(s, d).select($"doc_id")
      .join(labels.select($"id".as("doc_id"), $"label"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"label", $"doc_id").as("component"))
      .withColumn("split",
        when(Behavioral.mixKey($"component") % 10 < 8, lit("train"))
          .otherwise(lit("heldout")))
  }
  private def leakageSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    leakageSplitFrame(s, d).orderBy($"doc_id")
  }
  /** CTE chain ending in `split_t(doc_id, component, split)` — the
    * oracle building block the composed curriculum reuses. */
  private[operators] val leakageSplitCtes =
    s"""$jaccardCtes,
       |pairs AS (
       |  SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(id, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
       |comp AS (SELECT id, MIN(label) AS component FROM reach GROUP BY id),
       |alldocs AS (
       |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
       |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
       |split_t AS (
       |  SELECT doc_id, component,
       |    CASE WHEN ${Behavioral.mixKeySql("component")} % 10 < 8
       |         THEN 'train' ELSE 'heldout' END AS split
       |  FROM alldocs)""".stripMargin
  private val leakageSplitSql =
    s"""WITH RECURSIVE $leakageSplitCtes
       |SELECT doc_id, component, split FROM split_t
       |ORDER BY doc_id""".stripMargin

  // -- q_triangle_count: triangles in the near-dup graph --------------------
  // The graph-density diagnostic over the duplicate graph (the third
  // graph op beside connected components and PageRank): near-dup
  // clusters at J ≥ 0.8 are near-CLIQUES, so triangle participation
  // separates genuine duplicate clusters from chains of borderline
  // pairs (a transitive-closure artifact worth auditing before a
  // keep-one pass deletes a chain's middle). Classic scalable shape
  // (node-iterator on ordered edges): edges are canonical a < b, so
  // each triangle x<y<z is found EXACTLY once by joining ab⋈bc on the
  // shared middle node and closing with one ac equi-join — two narrow
  // equi-joins on doc ids, never an adjacency cross product; the edge
  // list is the STAGED pair graph, so the three self-join branches are
  // three parquet scans, never three LSH pipeline replays. Per-node
  // counts come from one explode + groupBy.
  private def triangleCount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = verifiedPairs(s, d).select($"doc_a", $"doc_b")
    val tri = edges.as("ab")
      .join(edges.as("bc"), $"ab.doc_b" === $"bc.doc_a")
      .join(edges.as("ac"),
        $"ac.doc_a" === $"ab.doc_a" && $"ac.doc_b" === $"bc.doc_b")
      .select($"ab.doc_a".as("x"), $"ab.doc_b".as("y"), $"bc.doc_b".as("z"))
    // report EVERY node of the near-dup graph (zero-triangle nodes
    // included): the audit wants "which pairs lack cluster support",
    // and the result stays non-empty on any corpus that has pairs at
    // all — a regenerated corpus without triangles must not look like
    // a failed query
    val nodes = edges.select($"doc_a".as("doc_id"))
      .unionByName(edges.select($"doc_b".as("doc_id"))).distinct()
    val counts = tri.select(explode(array($"x", $"y", $"z")).as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
    nodes.join(counts, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"n", lit(0L)).as("n_triangles"))
      .orderBy($"doc_id")
  }
  private val triangleCountSql =
    s"""WITH $jaccardCtes,
       |truth AS (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |tri AS (SELECT ab.doc_a AS x, ab.doc_b AS y, bc.doc_b AS z
       |  FROM truth ab
       |  JOIN truth bc ON ab.doc_b = bc.doc_a
       |  JOIN truth ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b),
       |nodes AS (SELECT DISTINCT doc_id FROM (
       |  SELECT doc_a AS doc_id FROM truth
       |  UNION ALL SELECT doc_b FROM truth)),
       |counts AS (SELECT doc_id, COUNT(*) AS n
       |  FROM (SELECT x AS doc_id FROM tri UNION ALL
       |        SELECT y FROM tri UNION ALL SELECT z FROM tri)
       |  GROUP BY doc_id)
       |SELECT n.doc_id, COALESCE(c.n, 0) AS n_triangles
       |FROM nodes n LEFT JOIN counts c ON c.doc_id = n.doc_id
       |ORDER BY n.doc_id""".stripMargin

  // -- q_entity_resolution: fuzzy-match clusters → canonical entity ---------
  // The record-linkage pipeline composed from parts the engine already
  // proves separately: candidate pairs from the SymSpell deletion-
  // neighborhood equi-join (q_fuzzy_join — O(N·L) candidate rows, never
  // N²), clusters from the same Pregel-style min-label propagation as
  // dedup_components (min() is the label fold, and it works on STRINGS
  // — both engines order varchars identically here: the names are
  // ASCII and binary collation is the declared semantics), canonical
  // representative = the cluster's min name. Every name resolves:
  // singletons are their own canonical entity. The oracle replays the
  // closure with a recursive CTE over the brute-force pair set.
  private def entityResolution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val labels = componentLabels(fuzzyPairs(s, d))
    fuzzyNames(s, d)
      .join(labels.select($"id".as("name"), $"label"), Seq("name"), "left")
      .select($"name", coalesce($"label", $"name").as("canonical"))
      .orderBy($"name")
  }
  private val entityResolutionSql =
    """WITH RECURSIVE names AS (SELECT DISTINCT c_name AS name FROM customer
      |               WHERE c_custkey % 7 = 0),
      |pairs AS (SELECT a.name AS n1, b.name AS n2
      |  FROM names a JOIN names b ON a.name < b.name
      |  WHERE levenshtein(a.name, b.name) <= 1),
      |edges AS (SELECT n1 AS src, n2 AS dst FROM pairs
      |          UNION ALL SELECT n2, n1 FROM pairs),
      |reach(id, label) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
      |comp AS (SELECT id, MIN(label) AS canonical FROM reach GROUP BY id)
      |SELECT n.name, COALESCE(c.canonical, n.name) AS canonical
      |FROM names n LEFT JOIN comp c ON c.id = n.name
      |ORDER BY n.name""".stripMargin

  // -- q_fuzzy_join: edit-distance ≤ 1 join via deletion neighborhoods -----
  // Typo-tolerant entity matching (SymSpell's candidate scheme): each
  // string expands to itself + every single-character deletion, and two
  // strings within edit distance 1 PROVABLY share a variant —
  // substitution at i: both sides delete i; insertion/deletion: the
  // short string IS a deletion of the long one. So candidates come from
  // an EQUI-join on variant keys — O(N·L) rows, bucketed like any hash
  // join — never the O(N²) cross join the semantics naively demand;
  // exact levenshtein then runs once per DISTINCT candidate pair. The
  // oracle is the N² brute force itself (restricted key range keeps it
  // tractable in DuckDB): the scalable algorithm must reproduce the
  // naive semantics exactly, which is also what the spec's completeness
  // classes (sub/ins/del at every position, distance-2 rejection) pin.
  /** The filtered name universe + its edit-1 pairs — shared by the
    * report query (q_fuzzy_join) and entity resolution. */
  private def fuzzyNames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d).filter($"c_custkey" % 7 === 0)
      .select($"c_name".as("name")).distinct()
  }
  private def fuzzyPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val variants = fuzzyNames(s, d).select($"name", explode(expr(
      "array_union(array(name), transform(sequence(1, length(name)), " +
        "i -> concat(substring(name, 1, i - 1), " +
        "substring(name, i + 1, length(name) - i))))")).as("v"))
    variants.as("a").join(variants.as("b"),
        $"a.v" === $"b.v" && $"a.name" < $"b.name")
      .select($"a.name".as("n1"), $"b.name".as("n2")).distinct()
      .filter(levenshtein($"n1", $"n2") <= 1)
  }
  private def fuzzyJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    fuzzyPairs(s, d).orderBy($"n1", $"n2")
  }
  private val fuzzyJoinSql =
    """WITH names AS (SELECT DISTINCT c_name AS name FROM customer
      |               WHERE c_custkey % 7 = 0)
      |SELECT a.name AS n1, b.name AS n2
      |FROM names a JOIN names b ON a.name < b.name
      |WHERE levenshtein(a.name, b.name) <= 1
      |ORDER BY n1, n2""".stripMargin

  // -- q_decontaminate_fuzzy: near-dup benchmark decontamination -----------
  // q_decontaminate (Corpus.scala) is exact-8-gram: a benchmark document
  // leaked into the train split with even a light perturbation — one
  // word changed every 8 (so NO 8-token window survives verbatim) —
  // passes it undetected. Here the same train/bench split is screened
  // with MinHash-LSH over 2-gram shingles instead: candidates from a
  // band equi-join against the BROADCAST benchmark side, then exact
  // set-Jaccard verification, reported at J ≥ 0.5.
  //
  // Banding is 64 bands × 2 rows (the full 128-lane signature): at the
  // J = 0.5 threshold the miss probability is (1 − 0.5²)⁶⁴ ≈ 1e-8, so
  // the LSH result provably matches the exact-pairwise oracle; the
  // every-8th-word kernel the spec pins sits at J = 0.6 (2-gram dirty
  // fraction 2/8 → (3/4)/(5/4)), safely above threshold with miss
  // ≈ 4e-13. Scale shape: the benchmark set is benchmark-sized (tiny
  // against a 100 TB corpus), so its bands AND gram sets broadcast; the
  // corpus computes signatures map-side and never shuffles text — only
  // the (train_doc, bench_doc) candidate pairs (16-byte rows) shuffle
  // for the distinct. Background (unrelated-pair) candidate rate at
  // r = 2 stays ~0.2% per shared-band probe; a corpus where that ever
  // dominates raises rows-per-band, trading threshold sharpness.
  private val FuzzyBenchMod = 20
  private val FuzzyBands = 64
  private val FuzzyRowsPerBand = Lanes / FuzzyBands
  private val FuzzyJaccard = 0.5

  private def fuzzyDecontaminate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // shingle + sign once, parallel, checkpointed: band and verify
    // branches both consume this frame (the dedup_simhash lesson)
    val docs = Tables.documents(s, d)
      .repartition($"doc_id")
      .select($"doc_id", TextPrep.shingleSet($"text", 2).as("grams"))
      .withColumn("sig", minhash_sig($"grams", Lanes))
      .localCheckpoint()
    val bands = docs.select($"doc_id",
      explode(array((0 until FuzzyBands).map(b =>
        xxhash64(lit(b) +: (0 until FuzzyRowsPerBand).map(r =>
          get($"sig", lit(b * FuzzyRowsPerBand + r))): _*)): _*)).as("band_key"))
    val benchBands = bands.filter($"doc_id" % FuzzyBenchMod === 0)
      .select($"doc_id".as("bench_doc"), $"band_key")
    val cand = bands.filter($"doc_id" % FuzzyBenchMod =!= 0)
      .join(broadcast(benchBands), Seq("band_key"))
      .select($"doc_id".as("train_doc"), $"bench_doc").distinct()
    val sets = docs.select($"doc_id", $"grams")
    val benchSets = sets.filter($"doc_id" % FuzzyBenchMod === 0)
      .select($"doc_id".as("bench_doc"), $"grams".as("bgrams"))
    // candidate pairs are rare by construction → broadcast back onto the
    // train side, so train gram sets never shuffle either
    sets.filter($"doc_id" % FuzzyBenchMod =!= 0)
      .join(broadcast(cand), $"doc_id" === $"train_doc")
      .join(broadcast(benchSets), Seq("bench_doc"))
      .select($"train_doc", $"bench_doc",
        (size(array_intersect($"grams", $"bgrams")) /
          (size($"grams") + size($"bgrams") -
            size(array_intersect($"grams", $"bgrams"))).cast("double")).as("jaccard"))
      .filter($"jaccard" >= FuzzyJaccard)
      .orderBy($"train_doc", $"bench_doc")
  }
  private val fuzzyDecontaminateSql =
    s"""WITH docs AS (SELECT doc_id, ${TextPrep.wordsSql} AS words FROM documents),
       |grams AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+1], ' ') AS g
       |          FROM docs, unnest(range(1, len(words))) t(i)),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
       |xshared AS (SELECT t.doc_id AS train_doc, b.doc_id AS bench_doc,
       |            COUNT(*) AS c
       |            FROM grams t JOIN grams b ON t.g = b.g
       |            WHERE t.doc_id % $FuzzyBenchMod <> 0
       |              AND b.doc_id % $FuzzyBenchMod = 0
       |            GROUP BY 1, 2)
       |SELECT train_doc, bench_doc, c * 1.0 / (st.sz + sb.sz - c) AS jaccard
       |FROM xshared
       |JOIN sizes st ON st.doc_id = train_doc
       |JOIN sizes sb ON sb.doc_id = bench_doc
       |WHERE c * 1.0 / (st.sz + sb.sz - c) >= $FuzzyJaccard
       |ORDER BY train_doc, bench_doc""".stripMargin

  // -- dedup_incremental: dedup a new batch against the stored corpus ------
  // The production dedup shape at 100 TB: the corpus's fingerprints and
  // MinHash band keys are a STORED index (computed once, maintained
  // like any table); an arriving batch checks itself against that
  // index — an fp equi-join for exact dups, a band-key join + exact-
  // Jaccard verification for near dups — so per-batch cost scales with
  // the BATCH, never the corpus, and the corpus-side pairs are never
  // re-enumerated (contrast dedup_minhash_lsh, the full-corpus build).
  // Here the split is simulated (doc_id % 10 == 0 is the batch); both
  // legs' index sides are computed in-plan from the same table the
  // oracle reads, with the identical banding/verification constants as
  // the full build, so the LSH completeness argument (miss ≈ 5e-8 at
  // J ≥ 0.8) carries over and the exact-pairwise oracle hash-matches.
  private def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", TextPrep.norm($"text").as("nt"),
        TextPrep.shingleSet($"text", 3).as("grams"))
      .withColumn("sig", minhash_sig($"grams", Lanes))
    val index = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    def bandsOf(df: DataFrame, id: String) = df.select($"doc_id".as(id),
      explode(array((0 until Bands).map(b =>
        xxhash64(lit(b) +: (0 until RowsPerBand).map(r =>
          get($"sig", lit(b * RowsPerBand + r))): _*)): _*)).as("band_key"))
    val exact = batch
      .select($"doc_id", fingerprint128($"nt").as("fp"))
      .join(index.select(fingerprint128($"nt").as("fp"))
        .distinct().withColumn("e", lit(1L)), Seq("fp"), "left")
      .select($"doc_id", coalesce($"e", lit(0L)).as("exact_dup"))
    val candidates = bandsOf(batch, "b_doc")
      .join(bandsOf(index, "i_doc"), "band_key")
      .select($"b_doc", $"i_doc").distinct()
    val near = candidates
      .join(batch.select($"doc_id".as("b_doc"), $"grams".as("bg")), "b_doc")
      .join(index.select($"doc_id".as("i_doc"), $"grams".as("ig")), "i_doc")
      .withColumn("inter", size(array_intersect($"bg", $"ig")))
      .filter($"inter" /
        (size($"bg") + size($"ig") - $"inter").cast("double") >= 0.8)
      .groupBy($"b_doc").agg(count(lit(1)).as("near_dups"))
    exact
      .join(near.select($"b_doc".as("doc_id"), $"near_dups"), Seq("doc_id"), "left")
      .na.fill(0L, Seq("near_dups"))
      .withColumn("accepted",
        when($"exact_dup" === 0L && $"near_dups" === 0L, 1).otherwise(0))
      .select($"doc_id", $"exact_dup", $"near_dups", $"accepted")
      .orderBy($"doc_id")
  }
  private val dedupIncrementalSql =
    s"""WITH $jaccardCtes,
       |pairs AS (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |crossp AS (SELECT doc_a AS b_doc, doc_b AS i_doc FROM pairs
       |    WHERE doc_a % 10 = 0 AND doc_b % 10 <> 0
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs
       |    WHERE doc_b % 10 = 0 AND doc_a % 10 <> 0),
       |nd AS (SELECT b_doc AS doc_id, COUNT(*) AS near_dups FROM crossp GROUP BY 1),
       |nt AS (SELECT doc_id, ${TextPrep.normSql} AS nt FROM documents),
       |ex AS (SELECT b.doc_id,
       |    CASE WHEN EXISTS (SELECT 1 FROM nt i
       |                      WHERE i.doc_id % 10 <> 0 AND i.nt = b.nt)
       |         THEN 1 ELSE 0 END AS exact_dup
       |  FROM nt b WHERE b.doc_id % 10 = 0)
       |SELECT ex.doc_id, CAST(ex.exact_dup AS BIGINT) AS exact_dup,
       |  CAST(COALESCE(nd.near_dups, 0) AS BIGINT) AS near_dups,
       |  CASE WHEN ex.exact_dup = 0 AND COALESCE(nd.near_dups, 0) = 0
       |       THEN 1 ELSE 0 END AS accepted
       |FROM ex LEFT JOIN nd ON nd.doc_id = ex.doc_id
       |ORDER BY ex.doc_id""".stripMargin

  // -- q_pagerank: centrality over the near-dup graph ----------------------
  // PageRank (Page/Brin/Motwani/Winograd 1999) over the same symmetrized
  // near-duplicate graph dedup_components labels: in a crawl-derived
  // corpus, rank concentrated in a dense duplicate neighborhood is a
  // template/SEO-farm signal, and centrality picks the canonical
  // representative better than min-doc_id. Shapes for 100 TB:
  //  - each iteration is one narrow shuffle: edges (16 bytes/row,
  //    cached) join the 16-byte (id, rank) table on src, aggregate
  //    contributions by dst — document text and degree never re-derive;
  //  - localCheckpoint per round truncates the lineage exactly like
  //    Dedup.componentLabels / the BPE trainer;
  //  - iteration count is FIXED (10), so convergence is deterministic
  //    and the oracle replays rounds unrolled, the text_bpe discipline.
  // Parity: all arithmetic is exact scaled-integer — ranks carry
  // 10^12-scaled mass, each hop is floor division (`div`/`//`, positive
  // everywhere so trunc == floor), damping is (85·x) div 100 — which
  // hash-matches bit-for-bit with no float surface. Dangling nodes
  // (out-degree 0) keep teleport mass only; leaked mass is NOT
  // redistributed (documented variant, replayed identically by the
  // oracle).
  private val PrIters = 10
  private val PrScale = 1000000000000L

  private def pagerank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = verifiedPairs(s, d).select($"doc_a", $"doc_b")
    // edges cached FIRST so the LSH pair generation runs exactly once;
    // degree is loop-invariant, so it is joined into the edge list ONCE
    // (from the cached edges) and cached too — each iteration is then a
    // single join against the current rank table instead of re-deriving
    // degrees per round
    val edges = pairs
      .union(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .select($"doc_a".as("src"), $"doc_b".as("dst")).cache()
    val edgesDeg = edges
      .join(edges.groupBy($"src").agg(count(lit(1)).as("deg")), "src").cache()
    // tiny and consumed after the caches drop — checkpoint eagerly
    val deg = edgesDeg.select($"src", $"deg").distinct().localCheckpoint()
    val nodes = Tables.documents(s, d).select($"doc_id".as("id"))
    val n = nodes.count() // one scalar (graph order), not data
    val r0 = PrScale / n
    val base = (15L * r0) / 100L
    var ranks = nodes.withColumn("r", lit(r0))
    for (_ <- 1 to PrIters) {
      val contrib = edgesDeg
        .join(ranks.select($"id".as("src"), $"r"), "src")
        .groupBy($"dst").agg(sum(expr("r div deg")).as("cs"))
      ranks = nodes
        .join(contrib.select($"dst".as("id"), $"cs"), Seq("id"), "left")
        .select($"id",
          expr(s"$base + (85 * coalesce(cs, 0)) div 100").as("r"))
        .localCheckpoint()
    }
    edges.unpersist(blocking = false)
    edgesDeg.unpersist(blocking = false)
    ranks.join(deg.select($"src".as("id"), $"deg"), Seq("id"), "left")
      .na.fill(0, Seq("deg"))
      .select($"id".as("doc_id"), $"deg", $"r".as("rank_scaled"))
      .orderBy($"rank_scaled".desc, $"doc_id")
  }
  private val pagerankSql = {
    val rounds = (0 until PrIters).map { t =>
      s"""c$t AS (SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS BIGINT) AS cs
         |  FROM edges e JOIN deg d ON d.src = e.src
         |  JOIN r$t r ON r.id = e.src GROUP BY e.dst),
         |r${t + 1} AS (SELECT nd.id,
         |    ((15 * ($PrScale // nn.n)) // 100)
         |      + (85 * COALESCE(c.cs, 0)) // 100 AS r
         |  FROM nodes nd CROSS JOIN nn LEFT JOIN c$t c ON c.id = nd.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $jaccardCtes,
       |pairs AS (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |nodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
       |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (SELECT id, $PrScale // n AS r FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT nd.id AS doc_id, COALESCE(d.deg, 0) AS deg, r.r AS rank_scaled
       |FROM r$PrIters r JOIN nodes nd ON nd.id = r.id
       |LEFT JOIN deg d ON d.src = nd.id
       |ORDER BY rank_scaled DESC, doc_id""".stripMargin
  }

  // -- q_degree_hist: degree distribution of the near-dup graph -------------
  // The first statistic any graph audit reads: how many documents have
  // 0, 1, 2, … verified near-duplicates. A heavy tail here is the
  // template/boilerplate signature (one page duplicated thousands of
  // ways) that decides between keep-one dedup and source-level
  // excision. Reads the STAGED pair graph (no LSH replay), one degree
  // aggregate + one histogram groupBy; isolated documents enter as
  // degree 0 via an anti-join against the graph's node set, so the
  // histogram conserves the corpus exactly.
  private def degreeHist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = verifiedPairs(s, d).select($"doc_a", $"doc_b")
    val deg = pairs
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("degree"))
    val isolated = Tables.documents(s, d).select($"doc_id")
      .join(deg, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_docs"))
      .select(lit(0L).as("degree"), $"n_docs")
    deg.groupBy($"degree").agg(count(lit(1)).as("n_docs"))
      .unionByName(isolated)
      .filter($"n_docs" > 0)
      .orderBy($"degree")
  }
  private val degreeHistSql =
    s"""WITH $jaccardCtes,
       |pairs AS (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |deg AS (SELECT doc_id, COUNT(*) AS degree FROM (
       |    SELECT doc_a AS doc_id FROM pairs
       |    UNION ALL SELECT doc_b FROM pairs)
       |  GROUP BY 1),
       |hist AS (SELECT degree, COUNT(*) AS n_docs FROM deg GROUP BY 1
       |  UNION ALL
       |  SELECT CAST(0 AS BIGINT), COUNT(*) FROM documents d
       |  WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.doc_id = d.doc_id))
       |SELECT degree, n_docs FROM hist WHERE n_docs > 0
       |ORDER BY degree""".stripMargin

  // -- q_dup_distance: hops to the cluster representative --------------------
  // The chain-dup audit made quantitative (triangleCount's counterpart):
  // multi-source BFS over the near-dup graph from every component's
  // min-label doc (the keep-one representative). dist = 0 is the kept
  // doc, 1 a direct duplicate, ≥ 2 a TRANSITIVE duplicate — a doc that
  // never verified J ≥ 0.8 against its representative and dies only
  // through the chain, exactly the rows a keep-one pass should review.
  // Rounds are fixed (8) like PageRank's, so the oracle replays the
  // bound; anything deeper reads -1 ("beyond audit depth") on both
  // engines. Each round is one narrow (dst, dist) equi-join + groupBy
  // min over the STAGED edge list — no LSH replay, localCheckpoint per
  // round keeps plans O(1).
  private val BfsRounds = 8
  private def dupDistance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = verifiedPairs(s, d).select($"doc_a", $"doc_b")
    val p = pairs.toDF("src", "dst").cache()
    p.count()
    val edges = p.union(p.select($"dst".as("src"), $"src".as("dst"))).cache()
    val labels = componentLabels(pairs)
    var dist = labels
      .select($"id",
        when($"id" === $"label", 0L).otherwise(lit(null).cast("long")).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to BfsRounds) {
      val nbrMin = edges
        .join(dist.filter($"dist".isNotNull).select($"id".as("dst"), $"dist"), "dst")
        .groupBy($"src").agg(min($"dist" + 1).as("nd"))
      dist = dist.join(nbrMin.select($"src".as("id"), $"nd"), Seq("id"), "left")
        .select($"id",
          least(coalesce($"dist", $"nd"), coalesce($"nd", $"dist")).as("dist"))
        .localCheckpoint()
    }
    edges.unpersist(blocking = false)
    p.unpersist(blocking = false)
    dist
      .groupBy(coalesce($"dist", lit(-1L)).as("dist"))
      .agg(count(lit(1)).as("n_docs"), min($"id").as("min_doc"),
        max($"id").as("max_doc"))
      .orderBy($"dist")
  }
  private val dupDistanceSql =
    s"""WITH RECURSIVE $jaccardCtes,
       |pairs AS (
       |  SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(id, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
       |comp AS (SELECT id, MIN(label) AS component FROM reach GROUP BY id),
       |bfs(id, dist) AS (
       |  SELECT id, 0 FROM comp WHERE id = component
       |  UNION
       |  SELECT e.src, b.dist + 1 FROM edges e JOIN bfs b ON e.dst = b.id
       |  WHERE b.dist < $BfsRounds),
       |md AS (SELECT id, MIN(dist) AS dist FROM bfs GROUP BY id)
       |SELECT CAST(COALESCE(md.dist, -1) AS BIGINT) AS dist, COUNT(*) AS n_docs,
       |  MIN(c.id) AS min_doc, MAX(c.id) AS max_doc
       |FROM comp c LEFT JOIN md ON md.id = c.id
       |GROUP BY 1 ORDER BY dist""".stripMargin

  // -- q_negative_sampling: contrastive pairs with hash-drawn negatives ------
  // The training-pair generator for a contrastive/embedding objective:
  // every verified near-dup pair is a POSITIVE, and each positive draws
  // k = 2 deterministic NEGATIVES — uniform over the corpus via the
  // replayable mixKey (seeded by the pair + probe index, so a rerun
  // reproduces the byte-identical dataset: the training-freeze
  // property), rejected if they hit either anchor or anything near-dup
  // to one (a "negative" that is secretly a positive poisons the
  // loss). 5 probes per pair absorb rejections; survivors keep probe
  // order. Index → doc_id goes through a RANGE-PARTITIONED global
  // enumeration (the curriculum's zipWithIndex shape, never a
  // single-partition window); rejection is two broadcast-able
  // anti-joins against the staged pair set. 100 TB: positives and the
  // pair set are stored artifacts, the enumeration is one sort, probes
  // are row-local arithmetic.
  private val NegProbes = 5
  private val NegKeep = 2
  private def negativeSampling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select($"doc_id").orderBy($"doc_id")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("idx",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("neg_id",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val enumerated = s.createDataFrame(
      docs.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i, r.getLong(0)) }, schema)
    val pairs = verifiedPairs(s, d).select($"doc_a", $"doc_b").localCheckpoint()
    val sym = pairs.union(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .select($"doc_a".as("x"), $"doc_b".as("y"))
    val total = Tables.documents(s, d).agg(count(lit(1)).as("n"))
    val probes = pairs.crossJoin(broadcast(total))
      .select($"doc_a", $"doc_b",
        explode(array((0 until NegProbes).map(j => lit(j)): _*)).as("j"), $"n")
      .withColumn("idx",
        Behavioral.mixKey(concat_ws(":", $"doc_a", $"doc_b", $"j")) % $"n")
    val cand = probes.join(enumerated, "idx")
      .filter($"neg_id" =!= $"doc_a" && $"neg_id" =!= $"doc_b")
      .join(sym, $"doc_a" === $"x" && $"neg_id" === $"y", "left_anti")
      .join(sym, $"doc_b" === $"x" && $"neg_id" === $"y", "left_anti")
      .groupBy($"doc_a", $"doc_b", $"neg_id").agg(min($"j").as("j"))
    val w = Window.partitionBy($"doc_a", $"doc_b").orderBy($"j")
    cand.withColumn("neg_rank", row_number().over(w))
      .filter($"neg_rank" <= NegKeep)
      .select($"doc_a", $"doc_b", $"neg_rank".cast("long").as("neg_rank"),
        $"neg_id")
      .orderBy($"doc_a", $"doc_b", $"neg_rank")
  }
  private val negativeSamplingSql =
    s"""WITH $jaccardCtes,
       |pairs AS (
       |  SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |sym AS (SELECT doc_a AS x, doc_b AS y FROM pairs
       |        UNION ALL SELECT doc_b, doc_a FROM pairs),
       |en AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS idx,
       |              doc_id AS neg_id FROM documents),
       |tot AS (SELECT COUNT(*) AS n FROM documents),
       |probes AS (SELECT doc_a, doc_b, j.j AS j,
       |    ${Behavioral.mixKeySql("concat(doc_a, ':', doc_b, ':', j.j)")} % tot.n AS idx
       |  FROM pairs, unnest(range(0, $NegProbes)) j(j), tot),
       |cand AS (SELECT p.doc_a, p.doc_b, e.neg_id, MIN(p.j) AS j
       |  FROM probes p JOIN en e USING (idx)
       |  WHERE e.neg_id <> p.doc_a AND e.neg_id <> p.doc_b
       |    AND NOT EXISTS (SELECT 1 FROM sym s
       |                    WHERE s.x = p.doc_a AND s.y = e.neg_id)
       |    AND NOT EXISTS (SELECT 1 FROM sym s
       |                    WHERE s.x = p.doc_b AND s.y = e.neg_id)
       |  GROUP BY 1, 2, 3),
       |r AS (SELECT doc_a, doc_b, neg_id, row_number() OVER (
       |    PARTITION BY doc_a, doc_b ORDER BY j) AS neg_rank FROM cand)
       |SELECT doc_a, doc_b, neg_rank, neg_id FROM r
       |WHERE neg_rank <= $NegKeep ORDER BY doc_a, doc_b, neg_rank""".stripMargin

  // -- q_dataset_card: the governance one-pager -------------------------------
  // The dataset card a training-data release ships with (Gebru et al.
  // 2021, "Datasheets for Datasets"), composed from machinery the
  // engine already trusts: corpus size/coverage aggregates plus the
  // duplication profile from the STAGED pair graph. One (metric, value)
  // row per fact — every value is an exact integer count below 2^53,
  // so the double column compares exactly. At 100 TB each input is one
  // aggregate over columnar metadata or the stored pair set — the card
  // costs minutes, not a corpus replay.
  private def datasetCard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct($"source").as("n_sources"),
      countDistinct($"lang").as("n_langs"),
      sum($"n_chars").as("total_chars"),
      sum(size(TextPrep.words($"text")).cast("long")).as("total_tokens"))
    val pairs = verifiedPairs(s, d)
    val dup = pairs.agg(count(lit(1)).as("near_dup_pairs"))
    val dupDocs = pairs.select($"doc_a".as("id"))
      .union(pairs.select($"doc_b".as("id"))).distinct()
      .agg(count(lit(1)).as("docs_in_dup_clusters"))
    val wide = base.crossJoin(broadcast(dup)).crossJoin(broadcast(dupDocs))
    val metrics = Seq("n_docs", "n_sources", "n_langs", "total_chars",
      "total_tokens", "near_dup_pairs", "docs_in_dup_clusters")
    // store-level governance rows (r14 verdict "Next round" #10): now
    // that writes flow through the engine, a release card reports the
    // STORE's state too — versions, last commit, DV debt (live deleted
    // positions awaiting compaction), and zone-stat coverage. All
    // manifest/footer arithmetic on the deterministically staged
    // governed store; zero data scans.
    val root = graft.operators.Maintenance.governedStoreRoot(s, d)
    val cur = graft.operators.Maintenance.currentSnapshotVersion(root)
    val (dvLines, dataLines) = graft.operators.Maintenance
      .manifestPaths(root, cur).partition(_.startsWith("dv:"))
    val dvDebt = graft.sources.FooterStats.rowCount(
      dvLines.map(_.stripPrefix("dv:")), s.sessionState.newHadoopConf())
    val zonedGroups = graft.operators.Maintenance
      .manifestZones(root, cur).map(_._1).distinct.size
    // from the store's own commit log, not the staging constant — the
    // card must report what the engine RECORDED (r15 verdict #3)
    val lastCommit = graft.operators.Maintenance
      .readStoreText(root, "commits_ts.txt")
      .split("\n").map(_.trim).filter(_.nonEmpty)
      .map(_.split("=", 2)(1).toLong).max
    val storeRows = Seq(
      "store_versions" -> cur.toDouble,
      "store_data_groups" -> dataLines.size.toDouble,
      "store_dv_debt" -> dvDebt.toDouble,
      "store_zoned_groups" -> zonedGroups.toDouble,
      "store_last_commit_epoch" -> lastCommit.toDouble)
      .toDF("metric", "value")
    wide.select(explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(m).cast("double").as("value"))): _*))
      .as("kv"))
      .select($"kv.metric", $"kv.value")
      .unionByName(storeRows)
      .orderBy($"metric")
  }
  private val datasetCardSql =
    s"""WITH $jaccardCtes,
       |pairs AS (
       |  SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |base AS (SELECT COUNT(*) AS n_docs,
       |    COUNT(DISTINCT source) AS n_sources,
       |    COUNT(DISTINCT lang) AS n_langs,
       |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |    CAST(SUM(len(${TextPrep.wordsSql})) AS BIGINT) AS total_tokens
       |  FROM documents),
       |dup AS (SELECT COUNT(*) AS near_dup_pairs FROM pairs),
       |dd AS (SELECT COUNT(*) AS docs_in_dup_clusters FROM (
       |    SELECT doc_a AS id FROM pairs UNION SELECT doc_b FROM pairs))
       |SELECT metric, value FROM (
       |  SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM base
       |  UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM base
       |  UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM base
       |  UNION ALL SELECT 'total_chars', CAST(total_chars AS DOUBLE) FROM base
       |  UNION ALL SELECT 'total_tokens', CAST(total_tokens AS DOUBLE) FROM base
       |  UNION ALL SELECT 'near_dup_pairs', CAST(near_dup_pairs AS DOUBLE) FROM dup
       |  UNION ALL SELECT 'docs_in_dup_clusters',
       |    CAST(docs_in_dup_clusters AS DOUBLE) FROM dd
       |  -- the governed store's deterministic lifecycle, DERIVED (r15
       |  -- verdict #3): each commit exists iff its staging predicate
       |  -- matches rows — v1 base, v2/v3 MERGEs (insert leg + dv each),
       |  -- v4 DSv2 append of the %100=1 batch (the one zone-mapped
       |  -- group) — so an engine miscount of versions or live groups
       |  -- fails the compare instead of matching a restated literal.
       |  -- The only remaining constants are the synthetic commit
       |  -- clock's origin and hourly step (the io_time_travel_ts
       |  -- determinism discipline).
       |  UNION ALL SELECT 'store_versions', (
       |    SELECT 1.0
       |      + (CASE WHEN EXISTS (SELECT 1 FROM orders
       |           WHERE o_orderkey % 10 = 0 OR o_orderkey % 25 = 7
       |              OR o_orderkey % 1000 = 0) THEN 1 ELSE 0 END)
       |      + (CASE WHEN EXISTS (SELECT 1 FROM orders
       |           WHERE o_orderkey % 10 = 5 OR o_orderkey % 25 = 11
       |              OR o_orderkey % 1000 = 500) THEN 1 ELSE 0 END)
       |      + (CASE WHEN EXISTS (SELECT 1 FROM orders
       |           WHERE o_orderkey % 100 = 1) THEN 1 ELSE 0 END))
       |  UNION ALL SELECT 'store_data_groups', (
       |    SELECT CAST(COUNT(DISTINCT o_orderkey % 4) AS DOUBLE) FROM orders)
       |      + (SELECT CASE WHEN EXISTS (SELECT 1 FROM orders
       |           WHERE o_orderkey % 10 = 0 OR o_orderkey % 1000 = 0)
       |           THEN 1 ELSE 0 END)
       |      + (SELECT CASE WHEN EXISTS (SELECT 1 FROM orders
       |           WHERE o_orderkey % 10 = 5 OR o_orderkey % 1000 = 500)
       |           THEN 1 ELSE 0 END)
       |      + (SELECT CASE WHEN EXISTS (SELECT 1 FROM orders
       |           WHERE o_orderkey % 100 = 1) THEN 1 ELSE 0 END)
       |  UNION ALL SELECT 'store_dv_debt', (
       |    SELECT CAST(COUNT(*) AS DOUBLE) FROM orders
       |    WHERE o_orderkey % 10 = 0 OR o_orderkey % 25 = 7
       |       OR o_orderkey % 10 = 5 OR o_orderkey % 25 = 11)
       |  UNION ALL SELECT 'store_zoned_groups', (
       |    SELECT CASE WHEN EXISTS (SELECT 1 FROM orders
       |      WHERE o_orderkey % 100 = 1) THEN 1.0 ELSE 0.0 END)
       |  UNION ALL SELECT 'store_last_commit_epoch', (
       |    SELECT 1767261600.0 + 3600.0 * (
       |      (CASE WHEN EXISTS (SELECT 1 FROM orders
       |         WHERE o_orderkey % 10 = 0 OR o_orderkey % 25 = 7
       |            OR o_orderkey % 1000 = 0) THEN 1 ELSE 0 END)
       |      + (CASE WHEN EXISTS (SELECT 1 FROM orders
       |           WHERE o_orderkey % 10 = 5 OR o_orderkey % 25 = 11
       |              OR o_orderkey % 1000 = 500) THEN 1 ELSE 0 END)
       |      + (CASE WHEN EXISTS (SELECT 1 FROM orders
       |           WHERE o_orderkey % 100 = 1) THEN 1 ELSE 0 END))))
       |ORDER BY metric""".stripMargin

  // -- q_kcore: onion-layer decomposition of the near-dup graph ------------
  // k-core peeling (Seidman 1983; k = 2) over the staged verified-pair
  // graph: repeatedly delete nodes with degree < 2 in the SURVIVING
  // subgraph. The layer at which a node falls out is its onion depth —
  // pendant one-off duplicates peel in layer 1, chains collapse inward,
  // and what survives every round (layer 0) is the dense 2-core:
  // template/SEO-farm neighborhoods that degree alone cannot separate
  // from benign pairwise duplicates (a hub with 50 pendant copies has
  // high degree but NO 2-core; a template ring does). Round count is
  // FIXED (8, the pagerank/text_bpe discipline) so the oracle replays
  // the peel unrolled; peeling is monotone, so an early empty round is
  // a true fixpoint and stopping early cannot diverge from the fixed
  // unroll. Each round is two narrow (id)-semi-joins + one count agg
  // over the ALIVE subgraph — never the corpus — with localCheckpoint
  // truncating lineage per round (the componentLabels loop shape).
  private val KcRounds = 8
  private def kcore(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = verifiedPairs(s, d).select($"doc_a", $"doc_b").cache()
    p.count()
    val edges = p.union(p.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .select($"doc_a".as("src"), $"doc_b".as("dst")).cache()
    val deg0 = edges.groupBy($"src").agg(count(lit(1)).as("deg0"))
      .localCheckpoint()
    var alive = deg0.select($"src".as("id")).localCheckpoint()
    var layers = s.emptyDataFrame
      .withColumn("id", lit(0L)).withColumn("layer", lit(0)).limit(0)
    var t = 1
    var done = false
    while (t <= KcRounds && !done) {
      val degA = edges
        .join(alive.select($"id".as("src")), "src")
        .join(alive.select($"id".as("dst")), "dst")
        .groupBy($"src").agg(count(lit(1)).as("dg"))
      val aliveNext = degA.filter($"dg" >= 2).select($"src".as("id"))
        .localCheckpoint()
      val removed = alive.join(aliveNext, Seq("id"), "left_anti")
        .withColumn("layer", lit(t)).localCheckpoint()
      if (removed.count() == 0) done = true
      else { layers = layers.union(removed); alive = aliveNext; t += 1 }
    }
    edges.unpersist(blocking = false)
    p.unpersist(blocking = false)
    deg0.join(layers.select($"id".as("src"), $"layer"), Seq("src"), "left")
      .select($"src".as("doc_id"), $"deg0",
        coalesce($"layer", lit(0)).as("layer"))
      .orderBy($"doc_id")
  }
  private val kcoreSql = {
    val rounds = (0 until KcRounds).map { t =>
      s"""d${t + 1} AS MATERIALIZED (SELECT e.src, COUNT(*) AS c FROM edges e
         |  JOIN a$t x ON e.src = x.id JOIN a$t y ON e.dst = y.id
         |  GROUP BY e.src),
         |a${t + 1} AS MATERIALIZED (SELECT src AS id FROM d${t + 1} WHERE c >= 2)"""
        .stripMargin
    }.mkString(",\n")
    val layerCase = (1 to KcRounds)
      .map(t => s"WHEN t$t.id IS NULL THEN $t").mkString(" ")
    val layerJoins = (1 to KcRounds)
      .map(t => s"LEFT JOIN a$t t$t ON t$t.id = n.id").mkString("\n")
    s"""WITH $jaccardCtes,
       |pairs AS (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg0 AS (SELECT src, COUNT(*) AS deg0 FROM edges GROUP BY src),
       |a0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
       |$rounds
       |SELECT n.id AS doc_id, d.deg0,
       |  CASE $layerCase ELSE 0 END AS layer
       |FROM a0 n JOIN deg0 d ON d.src = n.id
       |$layerJoins
       |ORDER BY doc_id""".stripMargin
  }

  // -- q_link_prediction: neighbor-Jaccard missed-duplicate scoring --------
  // The link-prediction audit over the near-dup graph: two documents
  // that share near-dup NEIGHBORS but never shared an LSH bucket are
  // the classic missed-pair signature (banding has ~(1-J^r)^b false
  // negatives; common-neighbor structure is exactly the signal that
  // survives). Candidates = non-adjacent 2-hop pairs (two narrow
  // equi-joins on the staged edge list — never an O(n²) cross), scored
  // by neighbor-set Jaccard kept INTEGER: score_ppm = common·10⁶ div
  // (deg_a + deg_b − common), exact on both engines. Per node: its
  // candidate count and the best-scored partner (ties broken by min
  // partner id via a (score desc, partner) row_number — deterministic);
  // nodes with no candidate report 0/-1, so the audit covers the whole
  // pair graph at any scale.
  private def linkPrediction(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = verifiedPairs(s, d).select($"doc_a", $"doc_b").cache()
    p.count()
    val edges = p.union(p.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .select($"doc_a".as("src"), $"doc_b".as("dst"))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val cand = edges.as("e1").join(edges.as("e2"),
        $"e1.dst" === $"e2.src" && $"e1.src" < $"e2.dst")
      .groupBy($"e1.src".as("a"), $"e2.dst".as("b"))
      .agg(count(lit(1)).as("common"))
      .join(p.select($"doc_a".as("a"), $"doc_b".as("b")),
        Seq("a", "b"), "left_anti")
    val scored = cand
      .join(deg.select($"src".as("a"), $"deg".as("da")), "a")
      .join(deg.select($"src".as("b"), $"deg".as("db")), "b")
      .select($"a", $"b",
        expr("common * 1000000 div (da + db - common)").as("score_ppm"))
    val perNode = scored.select($"a".as("v"), $"b".as("partner"), $"score_ppm")
      .union(scored.select($"b".as("v"), $"a".as("partner"), $"score_ppm"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"v")
      .orderBy($"score_ppm".desc, $"partner")
    val best = perNode
      .withColumn("rn", row_number().over(w))
      .groupBy($"v")
      .agg(count(lit(1)).as("n_cand"),
        max(when($"rn" === 1, $"score_ppm")).as("best_score_ppm"),
        max(when($"rn" === 1, $"partner")).as("best_partner"))
    val out = deg.join(best, deg("src") === best("v"), "left")
      .select($"src".as("doc_id"), $"deg",
        coalesce($"n_cand", lit(0L)).as("n_cand"),
        coalesce($"best_score_ppm", lit(0L)).as("best_score_ppm"),
        coalesce($"best_partner", lit(-1L)).as("best_partner"))
      .orderBy($"doc_id")
    p.unpersist(blocking = false)
    out
  }
  private val linkPredictionSql =
    s"""WITH $jaccardCtes,
       |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |cand AS (SELECT e1.src AS a, e2.dst AS b, COUNT(*) AS common
       |  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src AND e1.src < e2.dst
       |  GROUP BY 1, 2),
       |cand2 AS (SELECT c.a, c.b, c.common FROM cand c
       |  WHERE NOT EXISTS (SELECT 1 FROM pairs p
       |    WHERE p.doc_a = c.a AND p.doc_b = c.b)),
       |scored AS (SELECT c.a, c.b,
       |    c.common * 1000000 // (da.deg + db.deg - c.common) AS score_ppm
       |  FROM cand2 c JOIN deg da ON da.src = c.a JOIN deg db ON db.src = c.b),
       |pn AS (SELECT a AS v, b AS partner, score_ppm FROM scored
       |  UNION ALL SELECT b, a, score_ppm FROM scored),
       |r AS (SELECT v, partner, score_ppm, row_number() OVER (PARTITION BY v
       |    ORDER BY score_ppm DESC, partner) AS rn FROM pn),
       |best AS (SELECT v, COUNT(*) AS n_cand,
       |    MAX(CASE WHEN rn = 1 THEN score_ppm END) AS best_score_ppm,
       |    MAX(CASE WHEN rn = 1 THEN partner END) AS best_partner
       |  FROM r GROUP BY v)
       |SELECT d.src AS doc_id, d.deg,
       |  COALESCE(b.n_cand, 0) AS n_cand,
       |  COALESCE(b.best_score_ppm, 0) AS best_score_ppm,
       |  COALESCE(b.best_partner, -1) AS best_partner
       |FROM deg d LEFT JOIN best b ON b.v = d.src
       |ORDER BY doc_id""".stripMargin

  // -- q_dedup_impact: per-source duplication report -----------------------
  // The summary a data-sourcing review reads before renegotiating a
  // feed: which sources ship duplicated content, and how much would
  // keep-one remove? Per source: corpus docs, docs touching the
  // verified near-dup graph, the would-drop count under the canonical
  // min-id keep rule, and both as exact micro-rates. Reads the STAGED
  // pair graph (zero LSH replay); one small join against the doc→source
  // dimension, then a per-source aggregate.
  private def dedupImpact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = verifiedPairs(s, d).select($"doc_a", $"doc_b")
    val inGraph = pairs.select($"doc_a".as("doc_id"))
      .union(pairs.select($"doc_b".as("doc_id"))).distinct()
      .withColumn("in_graph", lit(1L))
    // the PAIRWISE-GREEDY keep rule: drop the larger id of every
    // verified pair (pairs are canonical doc_a < doc_b, so the drop set
    // is exactly the distinct doc_b side). Deliberately NOT the
    // transitive cluster rule — greedy pairwise is the cheaper policy a
    // streaming dedup applies (no CC pass). It can UNDER-drop: a
    // cluster member whose only links point to larger ids survives
    // greedy but not the cluster-min rule. The transitive variant is
    // dedup_semantic / dedup_components territory; this report measures
    // the cheap policy.
    val dropped = pairs.select($"doc_b".as("doc_id")).distinct()
      .withColumn("is_dropped", lit(1L))
    Tables.documents(s, d).select($"doc_id", $"source")
      .join(broadcast(inGraph), Seq("doc_id"), "left")
      .join(broadcast(dropped), Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce($"in_graph", lit(0L))).as("n_in_graph"),
        sum(coalesce($"is_dropped", lit(0L))).as("n_dropped"))
      .select($"source", $"n_docs", $"n_in_graph", $"n_dropped",
        expr("n_in_graph * 1000000 div n_docs").as("dup_rate_micro"),
        expr("n_dropped * 1000000 div n_docs").as("drop_rate_micro"))
      .orderBy($"source")
  }
  // -- text_novelty: shingle novelty of an incoming batch vs the base ------
  // The ingestion question dedup rates don't answer: how much NEW
  // content does a batch add? (A batch can be 0% duplicate yet 95%
  // boilerplate already seen shingle-by-shingle.) Base = even doc_ids
  // (the already-ingested half), batch = odd; per batch doc the
  // fraction of its distinct 3-gram shingles absent from the ENTIRE
  // base — realized as one anti-join of the batch's gram postings
  // against the base's DISTINCT gram dictionary (inverted-index shape:
  // grams meet on equality, never doc×doc), aggregated per source with
  // floored exact micro-rates. 100 TB: the dictionary is
  // |distinct grams| and both sides shuffle once on the gram key —
  // the same shape the dedup family already scales on.
  private def textNovelty(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, d)
      .repartition($"doc_id")
      .select($"doc_id", $"source",
        explode(TextPrep.shingleSet($"text", 3)).as("g"))
      .localCheckpoint()
    val baseDict = grams.filter($"doc_id" % 2 === 0).select($"g").distinct()
    val batch = grams.filter($"doc_id" % 2 === 1)
    // hint the BUILD (right) side: the gram dictionary is
    // corpus-proportional and must never broadcast
    val novel = batch
      .join(baseDict.hint("shuffle_hash"), Seq("g"), "left_anti")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_novel"))
    batch.groupBy($"doc_id", $"source").agg(count(lit(1)).as("n_grams"))
      .join(novel, Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_grams").as("n_grams"),
        sum(coalesce($"n_novel", lit(0L))).as("n_novel"))
      .select($"source", $"n_docs", $"n_grams", $"n_novel",
        expr("n_novel * 1000000 div n_grams").as("novelty_micro"))
      .orderBy($"source")
  }
  private val textNoveltySql =
    s"""WITH docs AS (SELECT doc_id, source, ${TextPrep.wordsSql} AS words
       |  FROM documents),
       |grams AS (SELECT DISTINCT doc_id, source,
       |    array_to_string(words[i:i+2], ' ') AS g
       |  FROM docs, unnest(range(1, len(words) - 1)) t(i)),
       |base AS (SELECT DISTINCT g FROM grams WHERE doc_id % 2 = 0),
       |batch AS (SELECT * FROM grams WHERE doc_id % 2 = 1),
       |novel AS (SELECT b.doc_id, COUNT(*) AS n_novel FROM batch b
       |  WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.g = b.g)
       |  GROUP BY 1),
       |per AS (SELECT doc_id, source, COUNT(*) AS n_grams
       |  FROM batch GROUP BY 1, 2)
       |SELECT p.source, COUNT(*) AS n_docs,
       |  CAST(SUM(p.n_grams) AS BIGINT) AS n_grams,
       |  CAST(SUM(COALESCE(nv.n_novel, 0)) AS BIGINT) AS n_novel,
       |  CAST(SUM(COALESCE(nv.n_novel, 0)) * 1000000 // SUM(p.n_grams)
       |    AS BIGINT) AS novelty_micro
       |FROM per p LEFT JOIN novel nv ON nv.doc_id = p.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q_assortativity: degree assortativity of the near-dup graph ---------
  // Newman 2002: the Pearson correlation of degrees across edges —
  // do high-degree dup hubs attach to other hubs (assortative, r > 0:
  // template farms linking among themselves) or to leaves
  // (disassortative, r < 0: one canonical page with many one-off
  // copies)? The q_regression discipline verbatim: each UNDIRECTED
  // edge contributes both ordered endpoint-degree pairs (so sx == sy
  // by construction — emitted once), moments are exact 128-bit
  // integers from one pass over the degree-joined edge list, and the
  // only float is the final IEEE quotient (NULL when a degenerate
  // graph has zero degree variance — no 0/0 to drift between engines).
  // Reads the STAGED pair graph; two narrow joins against the
  // O(nodes) degree table, never the corpus.
  private def assortativity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = verifiedPairs(s, d).select($"doc_a", $"doc_b")
    val deg = pairs.select(explode(array($"doc_a", $"doc_b")).as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("deg"))
    val e = pairs
      .join(deg.select($"doc_id".as("doc_a"), $"deg".as("dx")), "doc_a")
      .join(deg.select($"doc_id".as("doc_b"), $"deg".as("dy")), "doc_b")
    val xy = e.select($"dx".cast("decimal(38,0)").as("x"),
        $"dy".cast("decimal(38,0)").as("y"))
      .unionByName(e.select($"dy".cast("decimal(38,0)").as("x"),
        $"dx".cast("decimal(38,0)").as("y")))
    val num = ($"n" * $"sxy" - $"sx" * $"sy").cast("double")
    val denx = ($"n" * $"sxx" - $"sx" * $"sx").cast("double")
    val deny = ($"n" * $"syy" - $"sy" * $"sy").cast("double")
    xy.agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"y").as("sxy"))
      .select(($"n" / 2).cast("long").as("n_edges"),
        $"sx".cast("long").as("deg_sum"),
        when(denx > 0 && deny > 0, round(num / sqrt(denx * deny), 6))
          .otherwise(lit(null)).as("r6"))
  }
  private val assortativitySql =
    s"""WITH $jaccardCtes,
       |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |deg AS (SELECT doc_id, COUNT(*) AS deg FROM (
       |    SELECT doc_a AS doc_id FROM pairs
       |    UNION ALL SELECT doc_b FROM pairs) GROUP BY 1),
       |e AS (SELECT da.deg AS dx, db.deg AS dy FROM pairs p
       |  JOIN deg da ON da.doc_id = p.doc_a
       |  JOIN deg db ON db.doc_id = p.doc_b),
       |xy AS (SELECT CAST(dx AS HUGEINT) AS x, CAST(dy AS HUGEINT) AS y
       |  FROM e UNION ALL SELECT CAST(dy AS HUGEINT), CAST(dx AS HUGEINT)
       |  FROM e),
       |m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
       |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
       |  FROM xy)
       |SELECT CAST(n // 2 AS BIGINT) AS n_edges, CAST(sx AS BIGINT)
       |    AS deg_sum,
       |  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
       |        AND CAST(n * syy - sy * sy AS DOUBLE) > 0
       |       THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
       |         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
       |              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
       |       ELSE NULL END AS r6
       |FROM m""".stripMargin

  // -- q_modularity: source-partition modularity of the near-dup graph -----
  // Newman-Girvan modularity (2004) with the SOURCE as the community:
  // do near-dups concentrate WITHIN sources (mirrors/boilerplate inside
  // a crawl, Q -> 1) or straddle them (cross-source syndication, Q <= 0)?
  // Q_s = e_s/m - (d_s/2m)^2 per source plus the exact overall Q on an
  // 'ALL' row — everything exact 128-bit integers: contrib_micro =
  // (4m*e_s + 4m^2 - d_s^2)*10^6 div 4m^2 - 10^6, the +4m^2 SHIFT
  // keeping the numerator nonnegative (d_s <= 2m structurally) so
  // the quotient is sign-safe regardless of division semantics —
  // both engines truncate toward zero (the q_mutual_info shift rule). Reads the STAGED pair graph; the corpus-sized
  // doc->source dimension never shuffles (pair-sized builds broadcast
  // into it), aggregates are map-side combined.
  private def modularity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, d).select($"doc_id", $"source")
    val pairs = verifiedPairs(s, d).select($"doc_a", $"doc_b")
    val withA = src.select($"doc_id".as("doc_a"), $"source".as("src_a"))
      .join(broadcast(pairs), "doc_a")
    val edges = src.select($"doc_id".as("doc_b"), $"source".as("src_b"))
      .join(broadcast(withA), "doc_b")
    val degS = edges.select(explode(array($"src_a", $"src_b")).as("source"))
      .groupBy($"source").agg(count(lit(1)).as("deg_sum"))
    val intra = edges.filter($"src_a" === $"src_b")
      .groupBy($"src_a".as("source")).agg(count(lit(1)).as("intra_edges"))
    val nodes = pairs.select($"doc_a".as("doc_id"))
      .union(pairs.select($"doc_b".as("doc_id"))).distinct()
    val nodeS = src.join(broadcast(nodes), "doc_id")
      .groupBy($"source").agg(count(lit(1)).as("n_nodes"))
    val mdf = pairs.agg(count(lit(1)).as("m"))
    val base = nodeS.join(degS, "source")
      .join(intra, Seq("source"), "left")
      .select($"source", $"n_nodes",
        coalesce($"intra_edges", lit(0L)).as("intra_edges"), $"deg_sum")
      .crossJoin(broadcast(mdf))
    val contrib = expr(
      """((cast(intra_edges as decimal(38,0)) * 4 * m
        |  + cast(m as decimal(38,0)) * m * 4
        |  - cast(deg_sum as decimal(38,0)) * deg_sum) * 1000000)
        | div (cast(m as decimal(38,0)) * m * 4) - 1000000""".stripMargin)
    val per = base.select($"source", $"n_nodes", $"intra_edges", $"deg_sum",
      contrib.as("contrib_micro"))
    // overall Q sums the per-source RATIONALS before the one floor:
    // (4m*sum(e_s) - sum(d_s^2))*10^6 div 4m^2 (+ the same shift) —
    // sum(d_s^2) <= (sum d_s)^2 = 4m^2 keeps the shifted numerator >= 0
    val all = base.groupBy()
      .agg(sum($"n_nodes").as("n_nodes"),
        sum($"intra_edges").as("intra_edges"),
        sum($"deg_sum").as("deg_sum"),
        sum(expr("cast(deg_sum as decimal(38,0)) * deg_sum")).as("sq"),
        max($"m").as("m"))
      .select(lit("ALL").as("source"), $"n_nodes", $"intra_edges",
        $"deg_sum",
        expr("""((cast(intra_edges as decimal(38,0)) * 4 * m
          |  + cast(m as decimal(38,0)) * m * 4 - sq) * 1000000)
          | div (cast(m as decimal(38,0)) * m * 4) - 1000000""".stripMargin)
          .as("contrib_micro"))
    per.unionByName(all).orderBy($"source")
  }
  private val modularitySql =
    s"""WITH $jaccardCtes,
       |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |e AS (SELECT da.source AS src_a, db.source AS src_b
       |  FROM pairs p JOIN documents da ON da.doc_id = p.doc_a
       |               JOIN documents db ON db.doc_id = p.doc_b),
       |mm AS (SELECT COUNT(*) AS m FROM e),
       |deg AS (SELECT source, COUNT(*) AS deg_sum FROM (
       |    SELECT src_a AS source FROM e UNION ALL SELECT src_b FROM e)
       |  GROUP BY 1),
       |intra AS (SELECT src_a AS source, COUNT(*) AS intra_edges
       |  FROM e WHERE src_a = src_b GROUP BY 1),
       |nodes AS (SELECT d.source, COUNT(*) AS n_nodes FROM (
       |    SELECT DISTINCT doc_id FROM (SELECT doc_a AS doc_id FROM pairs
       |      UNION ALL SELECT doc_b FROM pairs)) x
       |  JOIN documents d ON d.doc_id = x.doc_id GROUP BY 1),
       |base AS (SELECT n.source, n.n_nodes,
       |    COALESCE(i.intra_edges, 0) AS intra_edges, g.deg_sum, mm.m
       |  FROM nodes n JOIN deg g ON g.source = n.source
       |  LEFT JOIN intra i ON i.source = n.source CROSS JOIN mm),
       |per AS (SELECT source, CAST(n_nodes AS BIGINT) AS n_nodes,
       |    CAST(intra_edges AS BIGINT) AS intra_edges,
       |    CAST(deg_sum AS BIGINT) AS deg_sum,
       |    CAST(((CAST(intra_edges AS HUGEINT) * 4 * m
       |        + CAST(m AS HUGEINT) * m * 4
       |        - CAST(deg_sum AS HUGEINT) * deg_sum) * 1000000)
       |      // (CAST(m AS HUGEINT) * m * 4) - 1000000 AS BIGINT)
       |      AS contrib_micro
       |  FROM base),
       |allr AS (SELECT 'ALL' AS source,
       |    CAST(SUM(n_nodes) AS BIGINT) AS n_nodes,
       |    CAST(SUM(intra_edges) AS BIGINT) AS intra_edges,
       |    CAST(SUM(deg_sum) AS BIGINT) AS deg_sum,
       |    CAST(((SUM(CAST(intra_edges AS HUGEINT)) * 4 * MAX(m)
       |        + CAST(MAX(m) AS HUGEINT) * MAX(m) * 4
       |        - SUM(CAST(deg_sum AS HUGEINT) * deg_sum)) * 1000000)
       |      // (CAST(MAX(m) AS HUGEINT) * MAX(m) * 4) - 1000000 AS BIGINT)
       |      AS contrib_micro
       |  FROM base)
       |SELECT * FROM per UNION ALL SELECT * FROM allr ORDER BY source""".stripMargin

  private val dedupImpactSql =
    s"""WITH $jaccardCtes,
       |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.8),
       |ig AS (SELECT DISTINCT doc_id FROM (
       |  SELECT doc_a AS doc_id FROM pairs
       |  UNION ALL SELECT doc_b FROM pairs)),
       |dr AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
       |SELECT d.source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN ig.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_in_graph,
       |  CAST(SUM(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_dropped,
       |  CAST(SUM(CASE WHEN ig.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000000 // COUNT(*) AS BIGINT) AS dup_rate_micro,
       |  CAST(SUM(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000000 // COUNT(*) AS BIGINT) AS drop_rate_micro
       |FROM documents d
       |LEFT JOIN ig ON ig.doc_id = d.doc_id
       |LEFT JOIN dr ON dr.doc_id = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("dedup_blocking", snmBlocking, Some(snmBlockingSql)),
    QueryDef("q_assortativity", assortativity, Some(assortativitySql)),
    QueryDef("text_novelty", textNovelty, Some(textNoveltySql)),
    QueryDef("q_modularity", modularity, Some(modularitySql)),
    QueryDef("q_dedup_impact", dedupImpact, Some(dedupImpactSql)),
    QueryDef("q_link_prediction", linkPrediction, Some(linkPredictionSql)),
    QueryDef("q_kcore", kcore, Some(kcoreSql)),
    QueryDef("q_dup_distance", dupDistance, Some(dupDistanceSql)),
    QueryDef("q_degree_hist", degreeHist, Some(degreeHistSql)),
    QueryDef("q_dataset_card", datasetCard, Some(datasetCardSql)),
    QueryDef("q_negative_sampling", negativeSampling, Some(negativeSamplingSql)),
    QueryDef("q_pagerank", pagerank, Some(pagerankSql)),
    QueryDef("dedup_incremental", dedupIncremental, Some(dedupIncrementalSql)),
    QueryDef("q_fuzzy_join", fuzzyJoin, Some(fuzzyJoinSql)),
    QueryDef("q_decontaminate_fuzzy", fuzzyDecontaminate, Some(fuzzyDecontaminateSql)),
    QueryDef("dedup_exact", exact, Some(exactSql)),
    QueryDef("dedup_ngram_jaccard", ngramJaccard, Some(ngramJaccardSql)),
    QueryDef("dedup_setsim", setsimJoin, Some(setsimJoinSql)),
    QueryDef("dedup_containment", ngramContainment, Some(ngramContainmentSql)),
    QueryDef("dedup_containment_apply", containmentApply, Some(containmentApplySql)),
    QueryDef("q_leakage_split", leakageSplit, Some(leakageSplitSql)),
    QueryDef("dedup_minhash_lsh", minhashLsh, Some(minhashLshSql)),
    QueryDef("q_rouge_pairs", rougePairs, Some(rougePairsSql)),
    QueryDef("dedup_minhash_recall", minhashRecall, Some(minhashRecallSql)),
    QueryDef("q_triangle_count", triangleCount, Some(triangleCountSql)),
    QueryDef("q_entity_resolution", entityResolution, Some(entityResolutionSql)),
    QueryDef("dedup_simhash", simhash, Some(simhashSql)),
    QueryDef("dedup_components", components, Some(componentsSql)),
  )
}
