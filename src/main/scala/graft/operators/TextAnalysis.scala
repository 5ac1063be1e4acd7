package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §2.3
  * #37-40): language ID, quality scoring, token counting, content
  * fingerprinting. All are per-row expression pipelines — zero shuffle
  * except the final (small) aggregate, so they stream over 100 TB as a
  * single map stage fused into WholeStageCodegen.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists (public linguistic knowledge).
    * Shared verbatim with the DuckDB oracle SQL below. */
  private val stop: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "es" -> Seq("el", "los", "las", "y", "es", "por", "para"),
    "fr" -> Seq("le", "les", "et", "est", "dans", "pour", "que"),
    "zh" -> Seq("的", "是", "在", "了", "我", "不", "有"))

  /** DuckDB oracle fragment: count (with multiplicity) of tokens that
    * hit a stopword list. The Spark side computes ALL language counts in
    * one compiled pass ([[graft.functions.StopwordScores]]) — the
    * one-lambda-per-language spelling (`size(filter(words, IN))`) runs
    * interpreted (higher-order functions don't codegen) and was 8×
    * slower than the rest of the text suite at sf0.1. */
  private def hitsSql(list: Seq[String]): String =
    s"len(list_filter(words, w -> w IN (${list.map(s => s"'$s'").mkString(", ")})))"

  // -- language ID ---------------------------------------------------------
  // Stopword-hit scoring per language; argmax with a fixed tie-break
  // order (the CASE chain), 'und' when nothing matches. Confusion
  // matrix against the labeled lang column. All five language scores
  // come from ONE codegen'd scan of the token array.
  /** The (lang, pred_lang, n) confusion matrix — shared by the report
    * query (text_langid) and the per-class evaluation (q_langid_eval). */
  private def langidMatrix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val langs = stop.map(_._1)
    val scored = Tables.documents(s, d)
      .withColumn("scores", stopword_scores(TextPrep.words($"text"), stop.map(_._2)))
    val sc = langs.indices.map(i => $"scores"(i))
    val best = sc.reduce((a, b) => greatest(a, b))
    val pred = langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), els) =>
      when(sc(i) === best && best > 0, lit(l)).otherwise(els)
    }
    scored.withColumn("pred_lang", pred)
      .groupBy($"lang", $"pred_lang")
      .agg(count(lit(1)).as("n"))
  }
  private def langid(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    langidMatrix(s, d).orderBy($"lang", $"pred_lang")
  }

  // -- q_langid_eval: per-class precision / recall / F1 -----------------------
  // The classifier-evaluation primitive over the labeled corpus: the
  // confusion matrix reduced to the per-class scores a pipeline gates
  // on before trusting a filter (langid here, but the shape is any
  // labeled classifier audit). TP/FP/FN are integer sums over the
  // ≤ |langs|² matrix — the corpus-sized work is the ONE scored scan
  // the matrix already does — and precision/recall/F1 are IEEE
  // divisions of exact integers with zero-denominator guards identical
  // on both engines.
  private def langidEval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = langidMatrix(s, d).localCheckpoint() // ≤ 36 rows, 3 consumers
    val classes = m.select($"lang".as("cls"))
      .union(m.select($"pred_lang")).distinct()
    val tp = m.filter($"lang" === $"pred_lang")
      .select($"lang".as("cls"), $"n".as("tp"))
    val fn = m.filter($"lang" =!= $"pred_lang")
      .groupBy($"lang".as("cls")).agg(sum($"n").as("fn"))
    val fp = m.filter($"lang" =!= $"pred_lang")
      .groupBy($"pred_lang".as("cls")).agg(sum($"n").as("fp"))
    val p = when($"tp" + $"fp" > 0,
      $"tp".cast("double") / ($"tp" + $"fp")).otherwise(lit(0.0))
    val r = when($"tp" + $"fn" > 0,
      $"tp".cast("double") / ($"tp" + $"fn")).otherwise(lit(0.0))
    classes
      .join(tp, Seq("cls"), "left").join(fp, Seq("cls"), "left")
      .join(fn, Seq("cls"), "left")
      .na.fill(0L, Seq("tp", "fp", "fn"))
      .withColumn("precision", p).withColumn("recall", r)
      .withColumn("f1",
        when($"precision" + $"recall" > 0,
          lit(2.0) * $"precision" * $"recall" / ($"precision" + $"recall"))
          .otherwise(lit(0.0)))
      .select($"cls", $"tp", $"fp", $"fn", $"precision", $"recall", $"f1")
      .orderBy($"cls")
  }
  private val langidEvalSql = {
    val scores = stop.map { case (l, list) => s"${hitsSql(list)} AS s_$l" }.mkString(",\n  ")
    val langs = stop.map(_._1)
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val pred = langs.map(l => s"WHEN s_$l = $best AND $best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH scored AS (
       |  SELECT lang, $scores
       |  FROM (SELECT lang, ${TextPrep.wordsSql} AS words FROM documents)),
       |m AS (SELECT lang, $pred AS pred_lang, COUNT(*) AS n
       |      FROM scored GROUP BY 1, 2),
       |cls AS (SELECT lang AS cls FROM m UNION SELECT pred_lang FROM m),
       |tp AS (SELECT lang AS cls, CAST(SUM(n) AS BIGINT) AS tp FROM m
       |       WHERE lang = pred_lang GROUP BY 1),
       |fn AS (SELECT lang AS cls, CAST(SUM(n) AS BIGINT) AS fn FROM m
       |       WHERE lang <> pred_lang GROUP BY 1),
       |fp AS (SELECT pred_lang AS cls, CAST(SUM(n) AS BIGINT) AS fp FROM m
       |       WHERE lang <> pred_lang GROUP BY 1),
       |j AS (SELECT c.cls, COALESCE(tp.tp, 0) AS tp, COALESCE(fp.fp, 0) AS fp,
       |        COALESCE(fn.fn, 0) AS fn
       |  FROM cls c LEFT JOIN tp USING (cls) LEFT JOIN fp USING (cls)
       |  LEFT JOIN fn USING (cls)),
       |pr AS (SELECT cls, tp, fp, fn,
       |    CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp)
       |         ELSE 0.0 END AS precision,
       |    CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn)
       |         ELSE 0.0 END AS recall
       |  FROM j)
       |SELECT cls, tp, fp, fn, precision, recall,
       |  CASE WHEN precision + recall > 0
       |       THEN 2.0 * precision * recall / (precision + recall)
       |       ELSE 0.0 END AS f1
       |FROM pr ORDER BY cls""".stripMargin
  }
  private val langidSql = {
    val scores = stop.map { case (l, list) => s"${hitsSql(list)} AS s_$l" }.mkString(",\n  ")
    val langs = stop.map(_._1)
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val pred = langs.map(l => s"WHEN s_$l = $best AND $best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH scored AS (
       |  SELECT lang, $scores
       |  FROM (SELECT lang, ${TextPrep.wordsSql} AS words FROM documents))
       |SELECT lang, $pred AS pred_lang, COUNT(*) AS n
       |FROM scored GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin
  }

  // -- quality scoring -----------------------------------------------------
  // Length/repetition/stopword ratios + a bucketed tier. Ratios are
  // int/int double divisions — bit-identical across engines.
  private def quality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val en = stop.head._2
    Tables.documents(s, d)
      .withColumn("words", TextPrep.words($"text"))
      .withColumn("n_words", size($"words"))
      .withColumn("rep_ratio",
        size(array_distinct($"words")).cast("double") / $"n_words")
      .withColumn("stop_ratio",
        stopword_scores($"words", Seq(en))(0).cast("double") / $"n_words")
      .withColumn("tier",
        when($"n_words" < 20, "too_short")
          .when($"rep_ratio" < 0.3, "repetitive")
          .when($"stop_ratio" > 0.5, "boilerplate")
          .otherwise("ok"))
      .select($"doc_id", $"n_words".cast("long").as("n_words"),
        $"rep_ratio", $"stop_ratio", $"tier")
      .orderBy($"doc_id")
  }
  private val qualitySql = {
    val en = stop.head._2
    s"""WITH w AS (SELECT doc_id, ${TextPrep.wordsSql} AS words FROM documents),
       |m AS (SELECT doc_id, len(words) AS n_words,
       |  len(list_distinct(words)) * 1.0 / len(words) AS rep_ratio,
       |  ${hitsSql(en)} * 1.0 / len(words) AS stop_ratio FROM w)
       |SELECT doc_id, n_words, rep_ratio, stop_ratio,
       |  CASE WHEN n_words < 20 THEN 'too_short'
       |       WHEN rep_ratio < 0.3 THEN 'repetitive'
       |       WHEN stop_ratio > 0.5 THEN 'boilerplate'
       |       ELSE 'ok' END AS tier
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // -- text_gopher_rules: the published Gopher quality-filter audit ---------
  // The Rae et al. 2021 (Gopher, Table A1) repetition-free rule subset
  // as a per-rule corpus audit — the report a filtering run publishes
  // BEFORE committing to thresholds (text_quality tiers docs; this
  // scores the RULES): word count in [50, 1e5]; mean word length in
  // [3, 10] as the integer cross-multiplication 3n <= Σlen <= 10n (no
  // float mean exists to drift); >= 80% of words containing an
  // alphabetic char (5·alpha >= 4·n); >= 2 stopword hits; symbol
  // (#/ellipsis) word ratio <= 10% (10·sym <= n). All five booleans
  // come from ONE codegen'd pass over the token array (the langid
  // rule); the unpivot runs on a single aggregate row. fail_micro is
  // the floored exact quotient.
  private def gopherRules(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val en = stop.head._2
    val per = Tables.documents(s, d)
      .withColumn("words", TextPrep.words($"text"))
      .select(
        size($"words").cast("long").as("n"),
        expr("aggregate(words, 0L, (a, w) -> a + length(w))").as("sumlen"),
        expr("size(filter(words, w -> w rlike '[a-z]'))").cast("long")
          .as("alpha"),
        expr("size(filter(words, w -> w like '%#%' or w like '%...%'))")
          .cast("long").as("sym"),
        stopword_scores($"words", Seq(en))(0).cast("long").as("hits"))
      .select(
        when($"n" < 50 || $"n" > 100000, 1L).otherwise(0L).as("f1"),
        when($"sumlen" < $"n" * 3 || $"sumlen" > $"n" * 10, 1L)
          .otherwise(0L).as("f2"),
        when($"alpha" * 5 < $"n" * 4, 1L).otherwise(0L).as("f3"),
        when($"hits" < 2, 1L).otherwise(0L).as("f4"),
        when($"sym" * 10 > $"n", 1L).otherwise(0L).as("f5"))
    per
      .agg(count(lit(1)).as("n_docs"),
        sum($"f1").as("c1"), sum($"f2").as("c2"), sum($"f3").as("c3"),
        sum($"f4").as("c4"), sum($"f5").as("c5"),
        sum(when($"f1" + $"f2" + $"f3" + $"f4" + $"f5" > 0, 1L)
          .otherwise(0L)).as("cany"))
      .select($"n_docs", explode(array(
        struct(lit("r1_word_count").as("rule"), $"c1".as("n_fail")),
        struct(lit("r2_mean_word_len").as("rule"), $"c2".as("n_fail")),
        struct(lit("r3_alpha_words").as("rule"), $"c3".as("n_fail")),
        struct(lit("r4_stopwords").as("rule"), $"c4".as("n_fail")),
        struct(lit("r5_symbol_ratio").as("rule"), $"c5".as("n_fail")),
        struct(lit("r6_any").as("rule"), $"cany".as("n_fail")))).as("r"))
      .select($"r.rule".as("rule"), $"n_docs", $"r.n_fail".as("n_fail"),
        expr("r.n_fail * 1000000 div n_docs").as("fail_micro"))
      .orderBy($"rule")
  }
  private val gopherRulesSql = {
    val en = stop.head._2
    s"""WITH w AS (SELECT doc_id, ${TextPrep.wordsSql} AS words FROM documents),
       |m AS (SELECT len(words) AS n,
       |    list_sum(list_transform(words, w -> length(w))) AS sumlen,
       |    len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS alpha,
       |    len(list_filter(words, w -> w LIKE '%#%' OR w LIKE '%...%'))
       |      AS sym,
       |    ${hitsSql(en)} AS hits
       |  FROM w),
       |f AS (SELECT
       |    CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END AS f1,
       |    CASE WHEN sumlen < n * 3 OR sumlen > n * 10 THEN 1 ELSE 0 END
       |      AS f2,
       |    CASE WHEN alpha * 5 < n * 4 THEN 1 ELSE 0 END AS f3,
       |    CASE WHEN hits < 2 THEN 1 ELSE 0 END AS f4,
       |    CASE WHEN sym * 10 > n THEN 1 ELSE 0 END AS f5
       |  FROM m),
       |a AS (SELECT COUNT(*) AS n_docs, SUM(f1) AS c1, SUM(f2) AS c2,
       |    SUM(f3) AS c3, SUM(f4) AS c4, SUM(f5) AS c5,
       |    SUM(CASE WHEN f1 + f2 + f3 + f4 + f5 > 0 THEN 1 ELSE 0 END)
       |      AS cany
       |  FROM f),
       |u AS (SELECT 'r1_word_count' AS rule, n_docs, c1 AS n_fail FROM a
       |  UNION ALL SELECT 'r2_mean_word_len', n_docs, c2 FROM a
       |  UNION ALL SELECT 'r3_alpha_words', n_docs, c3 FROM a
       |  UNION ALL SELECT 'r4_stopwords', n_docs, c4 FROM a
       |  UNION ALL SELECT 'r5_symbol_ratio', n_docs, c5 FROM a
       |  UNION ALL SELECT 'r6_any', n_docs, cany FROM a)
       |SELECT rule, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_fail AS BIGINT) AS n_fail,
       |  CAST(n_fail * 1000000 // n_docs AS BIGINT) AS fail_micro
       |FROM u ORDER BY rule""".stripMargin
  }

  // -- text_gopher_rep: the REPETITION half of the Gopher rule set ----------
  // Rae et al. 2021 Table A1's other half (the r12 verdict's missing
  // #1): per-token stats miss looping/templated text; these rules
  // catch it. Per doc, over the normalized word stream:
  //  - duplicate-line fraction  (lines that repeat an earlier line)
  //  - duplicate-paragraph fraction
  //  - top-2/3/4-gram character fraction (chars covered by the most
  //    frequent n-gram)
  // The corpus has no raw newlines, so "line" is the deterministic
  // fixed-width segmentation a boilerplate-free ingest would produce:
  // a line is 10 consecutive words, a paragraph 50 (both pinned; real
  // corpora swap in their newline split — every downstream expression
  // is segmentation-agnostic). Thresholds are Gopher's: dup lines/
  // paragraphs > 30%; top-2/3/4-gram > 20/18/16% of chars. All five
  // booleans are exact integer cross-multiplications (dup·100 >
  // lines·30; cov·100 > chars·T) — no float fraction exists to drift —
  // and the reported per-doc means are floored micro quotients summed
  // exactly. Scale: every leg is explode → groupBy(doc_id[, seg]) —
  // corpus-linear rows, doc-keyed shuffles, no corpus-wide state.
  private val GopherRepThresh = Seq(2 -> 20L, 3 -> 18L, 4 -> 16L)
  private def gopherRep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", TextPrep.words($"text").as("words"))
      .select($"doc_id", $"words", size($"words").cast("long").as("nw"),
        expr("aggregate(words, 0L, (a, w) -> a + length(w))").as("sumlen"))
    val base = docs.select($"doc_id", $"nw",
      greatest($"sumlen" + $"nw" - 1, lit(1L)).as("wchars"))
    // fixed-width segment legs: dup count = segments − distinct segments
    def dupSegs(width: Int, out: String): DataFrame =
      docs.select($"doc_id", explode(expr(
          s"transform(sequence(1, size(words), $width), " +
            s"i -> array_join(slice(words, i, $width), ' '))")).as("seg"))
        .groupBy($"doc_id", $"seg").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(sum($"c").as("nseg"), count(lit(1)).as("ndist"))
        .select($"doc_id", ($"nseg" - $"ndist").as(s"dup_$out"),
          $"nseg".as(s"n_$out"))
    // top n-gram coverage: max count first, then max covered chars
    // among the max-count grams (deterministic, order-free on both
    // engines — no struct-ordering or arg-max semantics in play)
    def topGram(n: Int): DataFrame = {
      val cnts = docs.filter($"nw" >= n)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, size(words) - ${n - 1}), " +
            s"i -> array_join(slice(words, i, $n), ' '))")).as("g"))
        .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
        .select($"doc_id", $"cnt",
          ($"cnt" * length($"g")).cast("long").as("cov"))
      val mx = cnts.groupBy($"doc_id").agg(max($"cnt").as("mc"))
      cnts.join(mx.hint("shuffle_hash"), "doc_id")
        .filter($"cnt" === $"mc")
        .groupBy($"doc_id").agg(max($"cov").as(s"cov$n"))
    }
    val per = base
      .join(dupSegs(10, "lines"), Seq("doc_id"), "left")
      .join(dupSegs(50, "paras"), Seq("doc_id"), "left")
      .join(topGram(2), Seq("doc_id"), "left")
      .join(topGram(3), Seq("doc_id"), "left")
      .join(topGram(4), Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_lines", "n_lines", "dup_paras", "n_paras",
        "cov2", "cov3", "cov4"))
    val gm = GopherRepThresh.map { case (n, t) =>
      (when(col(s"cov$n") * 100 > $"wchars" * t, 1L).otherwise(0L),
        expr(s"cov$n * 1000000 div wchars"))
    }
    val flagged = per.select(
      when($"dup_lines" * 100 > $"n_lines" * 30, 1L).otherwise(0L).as("f1"),
      expr("CASE WHEN n_lines > 0 THEN dup_lines * 1000000 div n_lines " +
        "ELSE 0 END").as("m1"),
      when($"dup_paras" * 100 > $"n_paras" * 30, 1L).otherwise(0L).as("f2"),
      expr("CASE WHEN n_paras > 0 THEN dup_paras * 1000000 div n_paras " +
        "ELSE 0 END").as("m2"),
      gm(0)._1.as("f3"), gm(0)._2.as("m3"),
      gm(1)._1.as("f4"), gm(1)._2.as("m4"),
      gm(2)._1.as("f5"), gm(2)._2.as("m5"))
    flagged
      .agg(count(lit(1)).as("n_docs"),
        sum($"f1").as("c1"), sum($"m1").as("s1"),
        sum($"f2").as("c2"), sum($"m2").as("s2"),
        sum($"f3").as("c3"), sum($"m3").as("s3"),
        sum($"f4").as("c4"), sum($"m4").as("s4"),
        sum($"f5").as("c5"), sum($"m5").as("s5"),
        sum(when($"f1" + $"f2" + $"f3" + $"f4" + $"f5" > 0, 1L)
          .otherwise(0L)).as("cany"))
      .select($"n_docs", explode(array(
        struct(lit("r1_dup_lines").as("rule"), $"c1".as("n_fail"),
          $"s1".as("sm")),
        struct(lit("r2_dup_paragraphs").as("rule"), $"c2".as("n_fail"),
          $"s2".as("sm")),
        struct(lit("r3_top_2gram").as("rule"), $"c3".as("n_fail"),
          $"s3".as("sm")),
        struct(lit("r4_top_3gram").as("rule"), $"c4".as("n_fail"),
          $"s4".as("sm")),
        struct(lit("r5_top_4gram").as("rule"), $"c5".as("n_fail"),
          $"s5".as("sm")),
        struct(lit("r6_any").as("rule"), $"cany".as("n_fail"),
          lit(null).cast("long").as("sm")))).as("r"))
      .select($"r.rule".as("rule"), $"n_docs", $"r.n_fail".as("n_fail"),
        expr("r.n_fail * 1000000 div n_docs").as("fail_micro"),
        expr("r.sm div n_docs").as("mean_micro"))
      .orderBy($"rule")
  }
  private val gopherRepSql = {
    val gramCtes = GopherRepThresh.map { case (n, _) =>
      s"""g$n AS (SELECT doc_id, MAX(cov) AS cov$n FROM (
         |    SELECT c.doc_id, cov FROM (
         |      SELECT doc_id, COUNT(*) AS cnt,
         |          COUNT(*) * length(g) AS cov
         |      FROM (SELECT doc_id, array_to_string(words[i:i+${n - 1}], ' ')
         |              AS g
         |            FROM w, unnest(range(1, len(words) - ${n - 2})) t(i)
         |            WHERE len(words) >= $n)
         |      GROUP BY doc_id, g) c
         |    JOIN (SELECT doc_id, MAX(cnt) AS mc FROM (
         |        SELECT doc_id, COUNT(*) AS cnt
         |        FROM (SELECT doc_id, array_to_string(words[i:i+${n - 1}], ' ')
         |                AS g
         |              FROM w, unnest(range(1, len(words) - ${n - 2})) t(i)
         |              WHERE len(words) >= $n)
         |        GROUP BY doc_id, g) GROUP BY doc_id) m
         |      ON c.doc_id = m.doc_id AND c.cnt = m.mc)
         |  GROUP BY doc_id)""".stripMargin
    }.mkString(",\n")
    def segCte(name: String, width: Int) =
      s"""$name AS (SELECT doc_id, SUM(c) - COUNT(*) AS dup, SUM(c) AS nseg
         |  FROM (SELECT doc_id, seg, COUNT(*) AS c FROM (
         |      SELECT doc_id, array_to_string(words[i:i+${width - 1}], ' ')
         |        AS seg
         |      FROM w, unnest(range(1, len(words) + 1, $width)) t(i))
         |    GROUP BY doc_id, seg)
         |  GROUP BY doc_id)""".stripMargin
    s"""WITH w AS (SELECT doc_id, ${TextPrep.wordsSql} AS words
       |           FROM documents),
       |base AS (SELECT doc_id, len(words) AS nw,
       |    greatest(COALESCE(list_sum(list_transform(words,
       |      x -> length(x))), 0) + len(words) - 1, 1) AS wchars
       |  FROM w),
       |${segCte("ls", 10)},
       |${segCte("ps", 50)},
       |$gramCtes,
       |per AS (SELECT b.doc_id,
       |    COALESCE(ls.dup, 0) AS dup_lines, COALESCE(ls.nseg, 0) AS n_lines,
       |    COALESCE(ps.dup, 0) AS dup_paras, COALESCE(ps.nseg, 0) AS n_paras,
       |    COALESCE(g2.cov2, 0) AS cov2, COALESCE(g3.cov3, 0) AS cov3,
       |    COALESCE(g4.cov4, 0) AS cov4, b.wchars
       |  FROM base b
       |  LEFT JOIN ls ON b.doc_id = ls.doc_id
       |  LEFT JOIN ps ON b.doc_id = ps.doc_id
       |  LEFT JOIN g2 ON b.doc_id = g2.doc_id
       |  LEFT JOIN g3 ON b.doc_id = g3.doc_id
       |  LEFT JOIN g4 ON b.doc_id = g4.doc_id),
       |f AS (SELECT
       |    CASE WHEN dup_lines * 100 > n_lines * 30 THEN 1 ELSE 0 END AS f1,
       |    CASE WHEN n_lines > 0 THEN dup_lines * 1000000 // n_lines
       |      ELSE 0 END AS m1,
       |    CASE WHEN dup_paras * 100 > n_paras * 30 THEN 1 ELSE 0 END AS f2,
       |    CASE WHEN n_paras > 0 THEN dup_paras * 1000000 // n_paras
       |      ELSE 0 END AS m2,
       |    CASE WHEN cov2 * 100 > wchars * 20 THEN 1 ELSE 0 END AS f3,
       |    cov2 * 1000000 // wchars AS m3,
       |    CASE WHEN cov3 * 100 > wchars * 18 THEN 1 ELSE 0 END AS f4,
       |    cov3 * 1000000 // wchars AS m4,
       |    CASE WHEN cov4 * 100 > wchars * 16 THEN 1 ELSE 0 END AS f5,
       |    cov4 * 1000000 // wchars AS m5
       |  FROM per),
       |a AS (SELECT COUNT(*) AS n_docs,
       |    SUM(f1) AS c1, SUM(m1) AS s1, SUM(f2) AS c2, SUM(m2) AS s2,
       |    SUM(f3) AS c3, SUM(m3) AS s3, SUM(f4) AS c4, SUM(m4) AS s4,
       |    SUM(f5) AS c5, SUM(m5) AS s5,
       |    SUM(CASE WHEN f1 + f2 + f3 + f4 + f5 > 0 THEN 1 ELSE 0 END)
       |      AS cany
       |  FROM f),
       |u AS (SELECT 'r1_dup_lines' AS rule, n_docs, c1 AS n_fail, s1 AS sm
       |      FROM a
       |  UNION ALL SELECT 'r2_dup_paragraphs', n_docs, c2, s2 FROM a
       |  UNION ALL SELECT 'r3_top_2gram', n_docs, c3, s3 FROM a
       |  UNION ALL SELECT 'r4_top_3gram', n_docs, c4, s4 FROM a
       |  UNION ALL SELECT 'r5_top_4gram', n_docs, c5, s5 FROM a
       |  UNION ALL SELECT 'r6_any', n_docs, cany, NULL FROM a)
       |SELECT rule, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_fail AS BIGINT) AS n_fail,
       |  CAST(n_fail * 1000000 // n_docs AS BIGINT) AS fail_micro,
       |  CAST(sm // n_docs AS BIGINT) AS mean_micro
       |FROM u ORDER BY rule""".stripMargin
  }

  // -- token counting ------------------------------------------------------
  // Whitespace tokens + a BPE-ish split (letter runs / digit runs /
  // single non-alnum marks) + the chars/4 rule of thumb.
  private def tokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("n_ws_tokens", size(split(trim($"text"), "\\s+")))
      .withColumn("n_bpeish",
        size(regexp_extract_all(lower($"text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))))
      .withColumn("est_tokens", ceil(length($"text") / 4.0).cast("long"))
      .select($"doc_id", $"n_ws_tokens".cast("long").as("n_ws_tokens"),
        $"n_bpeish".cast("long").as("n_bpeish"), $"est_tokens")
      .orderBy($"doc_id")
  }
  private val tokensSql =
    """SELECT doc_id,
      |  len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpeish,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- fingerprinting ------------------------------------------------------
  // 64-bit one-pass FNV fingerprint (custom codegen'd expression) of the
  // normalized text. The oracle checks the semantic contract — equal
  // texts collide, distinct texts don't — by comparing distinct counts.
  private def fingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(fingerprint64(TextPrep.norm($"text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), countDistinct($"fp").as("n_distinct"))
  }
  private val fingerprintSql =
    s"""SELECT COUNT(*) AS n_docs,
       |  COUNT(DISTINCT ${TextPrep.normSql}) AS n_distinct
       |FROM documents""".stripMargin

  // -- TF-IDF term salience ------------------------------------------------
  // Inverted-index shape with ONE tokenize pass: tf = per-(doc, term)
  // counts (map-side partial agg), df = a COUNT window partitioned by
  // term OVER the tf frame — deriving df from tf as a separate
  // aggregate branch makes Catalyst re-scan and re-tokenize the corpus
  // (no logical-subtree reuse), which at 100 TB doubles the dominant
  // cost; the window is one narrow (doc, term, tf) shuffle instead.
  // Corpus size rides a broadcast one-row cross join. The idf is the
  // BM25-style RATIONAL form (N − df + ½)/(df + ½), not a logarithm:
  // ln is not required to be correctly rounded and differs across
  // libm builds, while +,−,×,÷ are IEEE-exact — so the DuckDB oracle
  // reproduces scores bit-for-bit (same monotonicity in df as log-idf,
  // which is all ranking needs). Top-5 terms per doc, score-desc then
  // term-asc for total order.
  private def tfidf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val words = Tables.documents(s, d)
      .select($"doc_id", explode(TextPrep.words($"text")).as("term"))
      .filter(length($"term") > 0)
    val tf = words.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df", count(lit(1)).over(Window.partitionBy($"term")))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
    withDf
      .crossJoin(broadcast(nDocs))
      .select($"doc_id", $"term",
        (($"tf" * ($"n_docs" - $"df" + lit(0.5))) / ($"df" + lit(0.5))).as("score"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"doc_id", $"rank".cast("long").as("rank"), $"term",
        round($"score", 6).as("score6"))
      .orderBy($"doc_id", $"rank")
  }
  private val tfidfSql =
    s"""WITH words AS (
       |  SELECT doc_id, w AS term FROM (
       |    SELECT doc_id, unnest(${TextPrep.wordsSql}) AS w FROM documents)
       |  WHERE len(w) > 0),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  -- 0.5::DOUBLE: a bare 0.5 is DECIMAL in DuckDB, which would
       |  -- route the arithmetic through decimal rounding instead of
       |  -- the IEEE double ops Spark uses
       |  SELECT doc_id, term,
       |    (tf * (n_docs - df + 0.5::DOUBLE)) / (df + 0.5::DOUBLE) AS score
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, term, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, rank, term, round(score, 6) AS score6
       |FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin

  // -- end-to-end corpus preparation ---------------------------------------
  // The composition a training-data pipeline actually runs, as ONE
  // declarative plan: exact-dedup keep-first (128-bit fingerprint
  // window) → language filter (predicted en) → quality filter (tier
  // 'ok') → deterministic 50% systematic sample. Everything before the
  // dedup window is a single codegen'd map stage over the corpus; the
  // one shuffle is the fingerprint window (narrow rows), and the
  // filters afterwards are pipelined — Catalyst fuses the whole thing,
  // which is the point of expressing pipeline stages as columns rather
  // than materialized intermediate datasets.
  /** The shared dedup→language→quality→sample prefix: survivors with
    * their token arrays. Both the summary query and the chunked
    * variant compose on top, so the pipeline definition exists once. */
  private def preparedDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val langs = stop.map(_._1)
    val sc = langs.indices.map(i => $"scores" (i))
    val best = sc.reduce((a, b) => greatest(a, b))
    val pred = langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), els) =>
      when(sc(i) === best && best > 0, lit(l)).otherwise(els)
    }
    Tables.documents(s, d)
      .withColumn("words", TextPrep.words($"text"))
      .withColumn("scores", stopword_scores($"words", stop.map(_._2)))
      .withColumn("fp", fingerprint128(TextPrep.norm($"text")))
      .withColumn("keep_id", min($"doc_id").over(Window.partitionBy($"fp")))
      .withColumn("n_words", size($"words"))
      .withColumn("rep_ratio", size(array_distinct($"words")).cast("double") / $"n_words")
      .withColumn("stop_ratio", $"scores" (0).cast("double") / $"n_words")
      .withColumn("pred_lang", pred)
      .filter($"doc_id" === $"keep_id") // exact-dedup: keep the first copy
      .filter($"pred_lang" === "en")
      .filter($"n_words" >= 20 && $"rep_ratio" >= 0.3 && $"stop_ratio" <= 0.5) // tier 'ok'
      .filter($"doc_id" % 2 === 0) // engine-reproducible systematic sample
  }
  private def prepareCorpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    preparedDocs(s, d)
      .select($"doc_id", $"n_words".cast("long").as("n_words"))
      .orderBy($"doc_id")
  }

  // -- pipeline_attrition: per-stage survival of the cleaning funnel --------
  // The governance readout every cleaning pipeline ships with (and the
  // first thing a data audit asks for): how many documents and tokens
  // survive each stage, cumulatively — raw → exact-dedup keep-one →
  // language gate → quality tier → systematic sample. NOT five scans:
  // every stage is a boolean over one annotated pass (the same
  // fingerprint window prepare_corpus runs is the only shuffle), one
  // aggregate computes all five (docs, tokens) pairs, and the 5-row
  // funnel unpivots from that single row. Retention is the floored
  // integer ppm quotient. The stage predicates are literally
  // preparedDocs' filters, so this report can never drift from what
  // the pipeline actually does.
  private def pipelineAttrition(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val langs = stop.map(_._1)
    val sc = langs.indices.map(i => $"scores" (i))
    val best = sc.reduce((a, b) => greatest(a, b))
    val pred = langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), els) =>
      when(sc(i) === best && best > 0, lit(l)).otherwise(els)
    }
    val flagged = Tables.documents(s, d)
      .withColumn("words", TextPrep.words($"text"))
      .withColumn("scores", stopword_scores($"words", stop.map(_._2)))
      .withColumn("fp", fingerprint128(TextPrep.norm($"text")))
      .withColumn("keep_id", min($"doc_id").over(Window.partitionBy($"fp")))
      .withColumn("n_words", size($"words").cast("long"))
      .withColumn("s1", $"doc_id" === $"keep_id")
      .withColumn("s2", $"s1" && pred === "en")
      .withColumn("s3", $"s2" && $"n_words" >= 20 &&
        size(array_distinct($"words")).cast("double") / $"n_words" >= 0.3 &&
        $"scores" (0).cast("double") / $"n_words" <= 0.5)
      .withColumn("s4", $"s3" && $"doc_id" % 2 === 0)
    val a = flagged.agg(
      count(lit(1)).as("d0"), sum($"n_words").as("t0"),
      sum(when($"s1", 1L).otherwise(0L)).as("d1"),
      sum(when($"s1", $"n_words").otherwise(0L)).as("t1"),
      sum(when($"s2", 1L).otherwise(0L)).as("d2"),
      sum(when($"s2", $"n_words").otherwise(0L)).as("t2"),
      sum(when($"s3", 1L).otherwise(0L)).as("d3"),
      sum(when($"s3", $"n_words").otherwise(0L)).as("t3"),
      sum(when($"s4", 1L).otherwise(0L)).as("d4"),
      sum(when($"s4", $"n_words").otherwise(0L)).as("t4"))
    val names = Seq("0_raw", "1_exact_dedup", "2_langid", "3_quality",
      "4_sample")
    a.select(explode(array(names.zipWithIndex.map { case (nm, i) =>
        struct(lit(i).as("stage"), lit(nm).as("name"),
          col(s"d$i").as("n_docs"), col(s"t$i").as("n_tokens"),
          expr(s"(d$i * 1000000) div d0").as("retained_ppm"))
      }: _*)).as("e"))
      .select($"e.stage", $"e.name", $"e.n_docs", $"e.n_tokens",
        $"e.retained_ppm")
      .orderBy($"stage")
  }
  private val pipelineAttritionSql = {
    val en = stop.head._2
    val scores = stop.map { case (l, list) => s"${hitsSql(list)} AS s_$l" }
      .mkString(",\n  ")
    val langs = stop.map(_._1)
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val pred = langs.map(l => s"WHEN s_$l = $best AND $best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    val stages = Seq("0_raw", "1_exact_dedup", "2_langid", "3_quality",
      "4_sample").zipWithIndex.map { case (nm, i) =>
      s"""SELECT $i AS stage, '$nm' AS name, CAST(d$i AS BIGINT) AS n_docs,
         |  CAST(t$i AS BIGINT) AS n_tokens,
         |  CAST((CAST(d$i AS HUGEINT) * 1000000) // d0 AS BIGINT)
         |    AS retained_ppm FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH w AS (SELECT doc_id, ${TextPrep.normSql} AS norm_text,
       |             ${TextPrep.wordsSql} AS words FROM documents),
       |m AS (SELECT doc_id, norm_text, words, len(words) AS n_words,
       |  len(list_distinct(words)) * 1.0 / len(words) AS rep_ratio,
       |  ${hitsSql(en)} * 1.0 / len(words) AS stop_ratio,
       |  $scores
       |  FROM w),
       |k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY norm_text) AS keep_id,
       |        ($pred) AS pred_lang FROM m),
       |f AS (SELECT doc_id, n_words,
       |    doc_id = keep_id AS s1,
       |    doc_id = keep_id AND pred_lang = 'en' AS s2,
       |    doc_id = keep_id AND pred_lang = 'en' AND n_words >= 20
       |      AND rep_ratio >= 0.3 AND stop_ratio <= 0.5 AS s3,
       |    doc_id = keep_id AND pred_lang = 'en' AND n_words >= 20
       |      AND rep_ratio >= 0.3 AND stop_ratio <= 0.5
       |      AND doc_id % 2 = 0 AS s4
       |  FROM k),
       |a AS (SELECT COUNT(*) AS d0, SUM(n_words) AS t0,
       |    SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS d1,
       |    SUM(CASE WHEN s1 THEN n_words ELSE 0 END) AS t1,
       |    SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS d2,
       |    SUM(CASE WHEN s2 THEN n_words ELSE 0 END) AS t2,
       |    SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS d3,
       |    SUM(CASE WHEN s3 THEN n_words ELSE 0 END) AS t3,
       |    SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS d4,
       |    SUM(CASE WHEN s4 THEN n_words ELSE 0 END) AS t4
       |  FROM f)
       |$stages
       |ORDER BY stage""".stripMargin
  }

  // -- end-to-end: prepared corpus → model-input chunks ---------------------
  // The full path from raw documents to training examples in ONE plan:
  // the prepare pipeline's survivors flow straight into the stride-24 /
  // size-32 token windows (Corpus.ChunkSize geometry) without
  // materializing an intermediate corpus — the chunk explode fuses into
  // the same stage as the post-window filters, so the only shuffle in
  // the whole pipeline is still the dedup fingerprint window.
  private def chunkedCorpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val C = Corpus.ChunkSize
    val S = Corpus.ChunkStride
    preparedDocs(s, d)
      .select($"doc_id",
        expr(s"filter(sequence(0, size(words) - 1, $S), st -> st = 0 OR st - $S + $C < size(words))")
          .as("starts"), $"words")
      .select($"doc_id", posexplode($"starts").as(Seq("chunk_id", "st")), $"words")
      .select($"doc_id", $"chunk_id".cast("long").as("chunk_id"),
        expr(s"slice(words, st + 1, $C)").as("chunk"))
      .select($"doc_id", $"chunk_id",
        size($"chunk").cast("long").as("n_tokens"),
        array_join($"chunk", " ").as("chunk_text"))
      .orderBy($"doc_id", $"chunk_id")
  }
  /** Shared oracle CTE prefix ending in `kept(doc_id, words, n_words)`
    * — the SQL twin of [[preparedDocs]]. The oracle groups duplicates
    * by normalized TEXT where Spark groups by the 128-bit fingerprint —
    * equality of results re-proves the fingerprint collision-free on
    * the corpus. */
  private val preparedDocsCtes = {
    val en = stop.head._2
    val scores = stop.map { case (l, list) => s"${hitsSql(list)} AS s_$l" }.mkString(",\n  ")
    val langs = stop.map(_._1)
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val pred = langs.map(l => s"WHEN s_$l = $best AND $best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""w AS (SELECT doc_id, ${TextPrep.normSql} AS norm_text,
       |             ${TextPrep.wordsSql} AS words FROM documents),
       |m AS (SELECT doc_id, norm_text, words, len(words) AS n_words,
       |  len(list_distinct(words)) * 1.0 / len(words) AS rep_ratio,
       |  ${hitsSql(en)} * 1.0 / len(words) AS stop_ratio,
       |  $scores
       |  FROM w),
       |k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY norm_text) AS keep_id FROM m),
       |kept AS (SELECT doc_id, words, n_words FROM k
       |  WHERE doc_id = keep_id
       |    AND ($pred) = 'en'
       |    AND n_words >= 20 AND rep_ratio >= 0.3 AND stop_ratio <= 0.5
       |    AND doc_id % 2 = 0)""".stripMargin
  }
  private val prepareCorpusSql =
    s"""WITH $preparedDocsCtes
       |SELECT doc_id, n_words FROM kept ORDER BY doc_id""".stripMargin
  private val chunkedCorpusSql = {
    val C = Corpus.ChunkSize
    val S = Corpus.ChunkStride
    s"""WITH $preparedDocsCtes,
       |st AS (SELECT doc_id, words,
       |  list_filter(range(0, len(words), $S), st -> st = 0 OR st - $S + $C < len(words)) AS starts
       |  FROM kept),
       |ch AS (SELECT doc_id, i - 1 AS chunk_id,
       |  words[starts[i] + 1 : starts[i] + $C] AS chunk
       |  FROM st, unnest(range(1, len(starts) + 1)) t(i))
       |SELECT doc_id, chunk_id, len(chunk) AS n_tokens,
       |  array_to_string(chunk, ' ') AS chunk_text
       |FROM ch ORDER BY doc_id, chunk_id""".stripMargin
  }

  // -- PII detection + redaction -------------------------------------------
  // The scrub step every training-data pipeline runs before anything
  // else: find emails / phone numbers / IPv4 addresses, count them, and
  // replace them with typed placeholders. Pure per-row regex expressions
  // — zero shuffle, fused into one codegen'd map stage, so it streams
  // over 100 TB exactly like the quality scorer. The corpus itself is
  // synthetic word salad with no PII, so the query plants deterministic
  // PII derived from (source, doc_id) first — detection and redaction
  // then have non-trivial, engine-comparable work on every row (the
  // oracle hash pins the redacted text via md5, so a single leaked or
  // over-redacted character fails the row).
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhoneRe = """\b\d{3}-\d{3}-\d{4}\b"""
  val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** struct(n_emails, n_phones, n_ips, redacted) for any text column —
    * the reusable scrub kernel (spec-tested on crafted strings). */
  def piiScrub(c: Column): Column = struct(
    size(regexp_extract_all(c, lit(EmailRe), lit(0))).as("n_emails"),
    size(regexp_extract_all(c, lit(PhoneRe), lit(0))).as("n_phones"),
    size(regexp_extract_all(c, lit(Ipv4Re), lit(0))).as("n_ips"),
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]").as("redacted"))

  private def pii(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("aug",
        concat($"text",
          lit(" contact "), $"source", lit("@example.com"),
          lit(" tel 555-"), lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
          lit("-"), lpad((($"doc_id" * 7) % 10000).cast("string"), 4, "0"),
          lit(" from 10."), ($"doc_id" % 256).cast("string"), lit(".0.1")))
      .withColumn("p", piiScrub($"aug"))
      .select($"doc_id", $"p.n_emails".cast("long").as("n_emails"),
        $"p.n_phones".cast("long").as("n_phones"),
        $"p.n_ips".cast("long").as("n_ips"),
        md5($"p.redacted").as("red_md5"))
      .orderBy($"doc_id")
  }
  private val piiSql =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    text || ' contact ' || source || '@example.com' ||
       |    ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
       |    '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') ||
       |    ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS aug
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(aug, '$EmailRe')) AS n_emails,
       |  len(regexp_extract_all(aug, '$PhoneRe')) AS n_phones,
       |  len(regexp_extract_all(aug, '$Ipv4Re')) AS n_ips,
       |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
       |    '$EmailRe', '[EMAIL]', 'g'),
       |    '$PhoneRe', '[PHONE]', 'g'),
       |    '$Ipv4Re', '[IP]', 'g')) AS red_md5
       |FROM aug ORDER BY doc_id""".stripMargin

  // -- intra-document repetition removal -----------------------------------
  // Gopher-style within-document dedup: drop every repeat of a token,
  // KEEPING first-occurrence order. A document always fits in one row,
  // so this is per-row array work — `array_distinct` (which preserves
  // first-occurrence order) — and the operator is a ZERO-shuffle map
  // stage that streams over 100 TB. The tempting explode → min(pos) →
  // regroup spelling shuffles every token twice (~60M exploded rows at
  // sf0.1, measured 2× slower) to compute something row-local. The
  // DuckDB oracle mirrors the order guarantee with an index lambda:
  // list_filter(words, (x, i) -> list_position(words, x) = i). The same
  // shape does line- or paragraph-level in-doc dedup by swapping the
  // tokenizer.
  /** (doc_id, n_unique, cleaned) over any (doc_id, text) frame — the
    * reusable within-doc dedup (spec-tested on crafted docs); the driver
    * query md5s `cleaned` so the oracle pins it per row. */
  def repRemovalOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", array_distinct(TextPrep.words($"text")).as("uw"))
      .select($"doc_id", size($"uw").cast("long").as("n_unique"),
        concat_ws(" ", $"uw").as("cleaned"))
  }

  private def repRemoval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    repRemovalOf(Tables.documents(s, d))
      .select($"doc_id", $"n_unique", md5($"cleaned").as("clean_md5"))
      .orderBy($"doc_id")
  }
  private val repRemovalSql =
    s"""WITH docs AS (SELECT doc_id, ${TextPrep.wordsSql} AS words FROM documents),
       |u AS (SELECT doc_id,
       |        list_filter(words, (x, i) -> list_position(words, x) = i) AS uw
       |      FROM docs)
       |SELECT doc_id, CAST(len(uw) AS BIGINT) AS n_unique,
       |  md5(array_to_string(uw, ' ')) AS clean_md5
       |FROM u ORDER BY doc_id""".stripMargin

  // -- bigram PMI collocations ----------------------------------------------
  // Corpus-level collocation mining (Church & Hanks 1990): pointwise
  // mutual information ln(P(u,v) / (P(u)P(v))) over adjacent word
  // pairs — the signal tokenizer-vocabulary and phrase-mining passes
  // rank merge candidates by (it is BPE's merge objective with counts
  // in place of probabilities). Shapes: unigram and bigram counts are
  // two narrow groupBys over exploded tokens (map-side combined); the
  // one-row bigram total broadcasts; the ≥ 5-count support filter
  // bounds the scoring join; top-50 is TakeOrdered, never a global
  // sort. Parity: counts are exact integers; PMI is computed with
  // identical parenthesization both engines and published as
  // floor(x·10⁶ + 0.5) — a scaled INTEGER column, so a ≤ 1-ulp ln()
  // difference cannot surface except exactly on a rounding boundary.
  private def pmi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", TextPrep.words($"text").as("w"))
    val uni = docs.select(explode($"w").as("t")).filter($"t" =!= "")
      .groupBy($"t").agg(count(lit(1)).as("c"))
    val bgf = docs.filter(size($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS u, w[i + 1] AS v2))")).as("b"))
      .select($"b.u", $"b.v2")
      .filter($"u" =!= "" && $"v2" =!= "")
    val tot = bgf.agg(count(lit(1)).as("n"))
    val cb = bgf.groupBy($"u", $"v2").agg(count(lit(1)).as("c_uv"))
      .filter($"c_uv" >= 5)
    cb.join(uni.select($"t".as("u"), $"c".as("c_u")), "u")
      .join(uni.select($"t".as("v2"), $"c".as("c_v")), "v2")
      .crossJoin(broadcast(tot))
      .select($"u", $"v2", $"c_uv", $"c_u", $"c_v",
        floor(log(($"c_uv".cast("double") * $"n") /
          ($"c_u".cast("double") * $"c_v")) * 1e6 + 0.5).cast("long").as("pmi6"))
      .orderBy($"c_uv".desc, $"u", $"v2")
      .limit(50)
  }
  private val pmiSql =
    s"""WITH docs AS (SELECT doc_id, ${TextPrep.wordsSql} AS w FROM documents),
       |uni AS (SELECT t, COUNT(*) AS c
       |        FROM (SELECT unnest(w) AS t FROM docs) WHERE t <> '' GROUP BY 1),
       |bgf AS (SELECT w[i] AS u, w[i + 1] AS v2
       |        FROM docs, unnest(range(1, len(w))) t(i)
       |        WHERE len(w) >= 2 AND w[i] <> '' AND w[i + 1] <> ''),
       |tot AS (SELECT COUNT(*) AS n FROM bgf),
       |cb AS (SELECT u, v2, COUNT(*) AS c_uv FROM bgf
       |       GROUP BY 1, 2 HAVING COUNT(*) >= 5)
       |SELECT cb.u, cb.v2, cb.c_uv, cu.c AS c_u, cv.c AS c_v,
       |  CAST(floor(ln(CAST(cb.c_uv AS DOUBLE) * tot.n
       |    / (CAST(cu.c AS DOUBLE) * cv.c)) * 1e6 + 0.5) AS BIGINT) AS pmi6
       |FROM cb JOIN uni cu ON cu.t = cb.u
       |JOIN uni cv ON cv.t = cb.v2 CROSS JOIN tot
       |ORDER BY cb.c_uv DESC, cb.u, cb.v2 LIMIT 50""".stripMargin

  // -- curriculum ordering ---------------------------------------------------
  // Quality-first training order (curriculum learning, Bengio et al.
  // 2009, as data engineering): clean docs first, then boilerplate,
  // then repetitive, then too-short — with a DETERMINISTIC md5 shuffle
  // inside each tier so no source/id ordering leaks into batch order.
  // Tiers are text_quality's exact rules; the order key is
  // (tier_rank, mixKey(doc_id), doc_id) — a total order, so the
  // assigned position is unique and a rerun reproduces the byte-
  // identical curriculum (the training-freeze property). Position is
  // materialized by a RANGE-PARTITIONED sort + per-partition offsets
  // (zipWithIndex), never a single-partition row_number window — the
  // sort samples split points, each partition numbers locally, and the
  // offset is partition-size prefix arithmetic; that is the 100 TB
  // global-enumeration shape.
  private def curriculumOrder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val en = stop.head._2
    val scored = Tables.documents(s, d)
      .withColumn("words", TextPrep.words($"text"))
      .withColumn("n_words", size($"words"))
      .withColumn("rep_ratio",
        size(array_distinct($"words")).cast("double") / $"n_words")
      .withColumn("stop_ratio",
        stopword_scores($"words", Seq(en))(0).cast("double") / $"n_words")
      .withColumn("tier_rank",
        when($"n_words" < 20, 3).when($"rep_ratio" < 0.3, 2)
          .when($"stop_ratio" > 0.5, 1).otherwise(0))
      .withColumn("k", Behavioral.mixKey($"doc_id"))
      .select($"doc_id", $"tier_rank", $"k")
      .orderBy($"tier_rank", $"k", $"doc_id")
    val schema = org.apache.spark.sql.types.StructType(
      scored.schema.fields :+ org.apache.spark.sql.types.StructField(
        "position", org.apache.spark.sql.types.LongType, nullable = false))
    val numbered = s.createDataFrame(
      scored.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L)) }, schema)
    numbered.select($"position", $"doc_id", $"tier_rank").orderBy($"position")
  }
  private val curriculumOrderSql = {
    val en = stop.head._2
    s"""WITH w AS (SELECT doc_id, ${TextPrep.wordsSql} AS words FROM documents),
       |m AS (SELECT doc_id, len(words) AS n_words,
       |  len(list_distinct(words)) * 1.0 / len(words) AS rep_ratio,
       |  ${hitsSql(en)} * 1.0 / len(words) AS stop_ratio FROM w),
       |t AS (SELECT doc_id,
       |  CASE WHEN n_words < 20 THEN 3 WHEN rep_ratio < 0.3 THEN 2
       |       WHEN stop_ratio > 0.5 THEN 1 ELSE 0 END AS tier_rank,
       |  ${Behavioral.mixKeySql("doc_id")} AS k FROM m)
       |SELECT ROW_NUMBER() OVER (ORDER BY tier_rank, k, doc_id) AS position,
       |  doc_id, tier_rank
       |FROM t ORDER BY position""".stripMargin
  }

  // -- pipeline_curriculum: eval-safe training order -------------------------
  // The composed deliverable this round's pieces exist for: the
  // LEAKAGE-SAFE split (no near-dup pair straddles train/heldout —
  // q_leakage_split's component assignment) feeds the TRAIN side only
  // into the deterministic quality-first curriculum — so the frozen
  // training order can never contain a near-duplicate of a heldout
  // eval document, by construction. Same shapes as the parts: one
  // corpus ⟕ component-labels join, row-local tiering, and the
  // range-partitioned global enumeration (zipWithIndex, no
  // single-partition window).
  private def pipelineCurriculum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val train = Dedup.leakageSplitFrame(s, d)
      .filter($"split" === "train").select($"doc_id")
    val en = stop.head._2
    val scored = Tables.documents(s, d)
      .join(train, "doc_id")
      .withColumn("words", TextPrep.words($"text"))
      .withColumn("n_words", size($"words"))
      .withColumn("rep_ratio",
        size(array_distinct($"words")).cast("double") / $"n_words")
      .withColumn("stop_ratio",
        stopword_scores($"words", Seq(en))(0).cast("double") / $"n_words")
      .withColumn("tier_rank",
        when($"n_words" < 20, 3).when($"rep_ratio" < 0.3, 2)
          .when($"stop_ratio" > 0.5, 1).otherwise(0))
      .withColumn("k", Behavioral.mixKey($"doc_id"))
      .select($"doc_id", $"tier_rank", $"k")
      .orderBy($"tier_rank", $"k", $"doc_id")
    val schema = org.apache.spark.sql.types.StructType(
      scored.schema.fields :+ org.apache.spark.sql.types.StructField(
        "position", org.apache.spark.sql.types.LongType, nullable = false))
    s.createDataFrame(
        scored.rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L)) }, schema)
      .select($"position", $"doc_id", $"tier_rank").orderBy($"position")
  }
  private val pipelineCurriculumSql = {
    val en = stop.head._2
    s"""WITH RECURSIVE ${Dedup.leakageSplitCtes},
       |train AS (SELECT doc_id FROM split_t WHERE split = 'train'),
       |w AS (SELECT d.doc_id, ${TextPrep.wordsSql} AS words
       |      FROM documents d JOIN train t ON t.doc_id = d.doc_id),
       |m AS (SELECT doc_id, len(words) AS n_words,
       |  len(list_distinct(words)) * 1.0 / len(words) AS rep_ratio,
       |  ${hitsSql(en)} * 1.0 / len(words) AS stop_ratio FROM w),
       |t2 AS (SELECT doc_id,
       |  CASE WHEN n_words < 20 THEN 3 WHEN rep_ratio < 0.3 THEN 2
       |       WHEN stop_ratio > 0.5 THEN 1 ELSE 0 END AS tier_rank,
       |  ${Behavioral.mixKeySql("doc_id")} AS k FROM m)
       |SELECT ROW_NUMBER() OVER (ORDER BY tier_rank, k, doc_id) AS position,
       |  doc_id, tier_rank
       |FROM t2 ORDER BY position""".stripMargin
  }

  // -- q_entropy: per-source Shannon token entropy ----------------------------
  // The diversity gauge mixture tuning reads next to quality scores: a
  // source whose token distribution is low-entropy is templated/
  // repetitive however long its documents are. H = ln N − (Σ c·ln c)/N
  // over per-source token counts — but Σ c·ln c is a float sum whose
  // partial-aggregation order differs between engines, so the published
  // metric quantizes EACH ln to an integer first (text_pmi's
  // discipline, moved inside the sum): lnc6 = floor(ln(c)·10⁶ + 0.5),
  // s = Σ c·lnc6 is an exact decimal sum (order-free), and
  // entropy_micro = floor(ln(N)·10⁶ + 0.5) − s div N is pure integer
  // arithmetic — a 10⁻⁶-quantized estimator whose bias is bounded by
  // the quantization step, identical on every engine and layout.
  private def entropy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"source", explode(TextPrep.words($"text")).as("t"))
      .filter($"t" =!= "")
      .groupBy($"source", $"t").agg(count(lit(1)).as("c"))
      .withColumn("lnc6",
        floor(log($"c".cast("double")) * 1e6 + 0.5).cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_vocab"),
        sum($"c").as("n_tokens"),
        sum($"c".cast("decimal(38,0)") * $"lnc6").as("s"))
      .select($"source", $"n_tokens", $"n_vocab",
        (floor(log($"n_tokens".cast("double")) * 1e6 + 0.5).cast("long")
          - expr("s div n_tokens")).as("entropy_micro"))
      .orderBy($"source")
  }
  private val entropySql =
    s"""WITH toks AS (SELECT source, unnest(${TextPrep.wordsSql}) AS t
       |             FROM documents),
       |counts AS (SELECT source, t, COUNT(*) AS c FROM toks
       |           WHERE t <> '' GROUP BY 1, 2),
       |l AS (SELECT source, c,
       |    CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lnc6
       |  FROM counts),
       |g AS (SELECT source, COUNT(*) AS n_vocab,
       |    CAST(SUM(c) AS BIGINT) AS n_tokens,
       |    SUM(CAST(c AS HUGEINT) * lnc6) AS s
       |  FROM l GROUP BY source)
       |SELECT source, n_tokens, n_vocab,
       |  CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
       |    - CAST(s // n_tokens AS BIGINT) AS entropy_micro
       |FROM g ORDER BY source""".stripMargin

  // -- text_hashing: feature-hashing (hashing trick) accounting --------------
  // The fixed-width vectorizer every at-scale text featurizer uses when
  // the vocabulary won't fit anywhere (Weinberger et al. 2009): token →
  // bucket = hash(token) mod D, D = 1024. The operational question is
  // collision load, so the op emits the accounting a pipeline monitors
  // before trusting hashed features: per source, vocabulary size, how
  // many of the D buckets are live, the worst bucket's distinct-token
  // load, and the collision rate (tokens sharing a bucket with another
  // token / vocab). The hash is the replayable md5-derived mixKey, so
  // DuckDB rebuilds the identical placement. Shapes: one (source,
  // token) distinct + one (source, bucket) groupBy — map-side
  // combined, never a vocabulary broadcast.
  private val HashDim = 1024L
  private def hashingTrick(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"source", explode(TextPrep.words($"text")).as("t"))
      .filter($"t" =!= "").distinct()
    toks
      .withColumn("b", Behavioral.mixKey($"t") % HashDim)
      .groupBy($"source", $"b").agg(count(lit(1)).as("load"))
      .groupBy($"source")
      .agg(sum($"load").as("n_vocab"),
        count(lit(1)).as("used_buckets"),
        max($"load").as("max_bucket_load"),
        sum(when($"load" > 1, $"load").otherwise(0L)).as("colliding_tokens"))
      .withColumn("collision_rate",
        $"colliding_tokens".cast("double") / $"n_vocab")
      .orderBy($"source")
  }
  private val hashingTrickSql =
    s"""WITH toks AS (SELECT DISTINCT source, t FROM (
       |    SELECT source, unnest(${TextPrep.wordsSql}) AS t FROM documents)
       |  WHERE t <> ''),
       |b AS (SELECT source, ${Behavioral.mixKeySql("t")} % $HashDim AS b,
       |    COUNT(*) AS load
       |  FROM toks GROUP BY 1, 2)
       |SELECT source, CAST(SUM(load) AS BIGINT) AS n_vocab,
       |  COUNT(*) AS used_buckets, MAX(load) AS max_bucket_load,
       |  CAST(SUM(CASE WHEN load > 1 THEN load ELSE 0 END) AS BIGINT)
       |    AS colliding_tokens,
       |  CAST(SUM(CASE WHEN load > 1 THEN load ELSE 0 END) AS DOUBLE)
       |    / SUM(load) AS collision_rate
       |FROM b GROUP BY source ORDER BY source""".stripMargin

  // -- text_readability: Flesch-style reading-ease scoring -----------------
  // The classic readability gate corpus curation applies beside quality
  // tiers (too-hard academic scrape vs too-easy template text both get
  // downweighted in mixture tuning): FKRE = 206.835 − 1.015·(words/
  // sentences) − 84.6·(syllables/words), with the standard resource-free
  // proxies — sentence count = runs of [.!?], syllable count = vowel
  // GROUPS [aeiouy]+ (the textbook approximation; hyphenation
  // dictionaries don't exist at 100 TB ingest rates). All three counts
  // are integers from identical regexes (Java and RE2 agree on these
  // character-class patterns — the text_tokens precedent); the score is
  // one row-local IEEE expression over integer ratios, written with the
  // same operation order on both engines, rounded at 6; the band
  // thresholds then compare identically-computed doubles. Pure map —
  // zero shuffle before the final doc_id sort.
  private def readability(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("n_words", size(TextPrep.words($"text")))
      .withColumn("n_sentences",
        greatest(lit(1), size(regexp_extract_all($"text", lit("[.!?]+"), lit(0)))))
      .withColumn("n_syll",
        greatest(lit(1), size(regexp_extract_all(lower($"text"), lit("[aeiouy]+"), lit(0)))))
      .withColumn("fkre",
        lit(206.835) - lit(1.015) * ($"n_words" / $"n_sentences")
          - lit(84.6) * ($"n_syll" / $"n_words"))
      .select($"doc_id", $"n_words".cast("long").as("n_words"),
        $"n_sentences".cast("long").as("n_sentences"),
        $"n_syll".cast("long").as("n_syll"),
        round($"fkre", 6).as("fkre6"),
        when($"fkre" >= 90, "very_easy").when($"fkre" >= 70, "easy")
          .when($"fkre" >= 50, "medium").when($"fkre" >= 30, "difficult")
          .otherwise("very_difficult").as("band"))
      .orderBy($"doc_id")
  }
  private val readabilitySql =
    s"""WITH m AS (SELECT doc_id,
       |    len(${TextPrep.wordsSql}) AS n_words,
       |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
       |    greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS n_syll
       |  FROM documents),
       |f AS (SELECT doc_id, n_words, n_sentences, n_syll,
       |    206.835 - 1.015 * (n_words / n_sentences)
       |      - 84.6 * (n_syll / n_words) AS fkre
       |  FROM m)
       |SELECT doc_id, n_words, n_sentences, n_syll,
       |  round(fkre, 6) AS fkre6,
       |  CASE WHEN fkre >= 90 THEN 'very_easy' WHEN fkre >= 70 THEN 'easy'
       |       WHEN fkre >= 50 THEN 'medium' WHEN fkre >= 30 THEN 'difficult'
       |       ELSE 'very_difficult' END AS band
       |FROM f ORDER BY doc_id""".stripMargin

  // -- text_burstiness: term clumping (Church & Gale 1995) -----------------
  // Does a term spread evenly across documents or CLUMP (names,
  // topical jargon)? The variance-to-mean ratio of per-document counts
  // — ≈1 for Poisson-spread function words, ≫1 for bursty content
  // terms — is the statistic term-weighting and stopword induction
  // read. Exactness is q_variance's integer-moment rule: per-(term,
  // doc) counts are exact, (n_docs, Σc, Σc²) are exact integer sums
  // over the CORPUS doc count (docs without the term contribute zeros
  // — only through the closed form, never materialized), and VMR =
  // (N·Σc² − (Σc)²)/(N·Σc) · N/(N−1)⁻¹… spelled as one IEEE expression
  // over exact integers, rounded at 6. Top-20 terms by document
  // frequency (df desc, term — pinned), each with df, total count, and
  // burstiness.
  private def burstiness(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val td = Tables.documents(s, d)
      .select($"doc_id", explode(TextPrep.words($"text")).as("t"))
      .filter($"t" =!= "")
      .groupBy($"t", $"doc_id").agg(count(lit(1)).as("c"))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("nd"))
    td.groupBy($"t")
      .agg(count(lit(1)).as("df"),
        sum($"c").as("tf"),
        sum($"c" * $"c").as("s2"))
      .crossJoin(broadcast(nDocs))
      // sample variance over ALL nd docs (zeros included, closed form):
      // var = (nd*s2 - tf^2) / (nd*(nd-1)); mean = tf/nd; vmr = var/mean
      // moments widened to 128 bits BEFORE the multiply: tf² passes a
      // LONG at corpus term frequencies (the q_selfjoin_size rule)
      .select($"t".as("term"), $"df", $"tf",
        round((($"nd".cast("decimal(38,0)") * $"s2"
            - $"tf".cast("decimal(38,0)") * $"tf").cast("double") /
          ($"nd".cast("decimal(38,0)") * ($"nd" - 1)).cast("double")) /
          ($"tf".cast("double") / $"nd".cast("double")), 6).as("vmr6"))
      .orderBy($"df".desc, $"term")
      .limit(20)
  }
  private val burstinessSql =
    s"""WITH tok AS (SELECT doc_id, unnest(${TextPrep.wordsSql}) AS t
       |            FROM documents),
       |td AS (SELECT t, doc_id, COUNT(*) AS c FROM tok
       |       WHERE t <> '' GROUP BY 1, 2),
       |nd AS (SELECT COUNT(*) AS nd FROM documents),
       |g AS (SELECT t, COUNT(*) AS df,
       |    CAST(SUM(c) AS BIGINT) AS tf,
       |    CAST(SUM(c * c) AS BIGINT) AS s2
       |  FROM td GROUP BY t)
       |SELECT t AS term, df, tf,
       |  round((CAST(CAST(nd AS HUGEINT) * s2
       |        - CAST(tf AS HUGEINT) * tf AS DOUBLE)
       |      / CAST(CAST(nd AS HUGEINT) * (nd - 1) AS DOUBLE))
       |    / (CAST(tf AS DOUBLE) / CAST(nd AS DOUBLE)), 6) AS vmr6
       |FROM g CROSS JOIN nd
       |ORDER BY df DESC, term LIMIT 20""".stripMargin

  // -- text_zipf: rank-frequency slope of the vocabulary -------------------
  // Is the corpus Zipfian (slope ≈ −1) or degenerate (templated text
  // flattens the head; boilerplate-heavy crawls steepen it)? OLS of
  // ln(tf) on ln(rank) over the top-100 vocabulary under a pinned
  // (tf desc, term) order. Each ln is quantized floor(·10⁶+0.5) — the
  // regression then runs on exact integer moments (the q_regression
  // rule; 128-bit widened products) and slope/R² are IEEE divisions of
  // exact integers rounded at 6. Top-K plans as TakeOrderedAndProject.
  private val ZipfK = 100
  private def zipf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val top = Tables.documents(s, d)
      .select(explode(TextPrep.words($"text")).as("t"))
      .filter($"t" =!= "")
      .groupBy($"t").agg(count(lit(1)).as("tf"))
      .orderBy($"tf".desc, $"t").limit(ZipfK)
      .localCheckpoint() // 100 rows; feeds the rank window + moments
    val w = org.apache.spark.sql.expressions.Window.orderBy($"tf".desc, $"t")
    top
      .withColumn("rn", row_number().over(w))
      .select(
        floor(log($"rn".cast("double")) * 1e6 + 0.5).cast("long").as("x"),
        floor(log($"tf".cast("double")) * 1e6 + 0.5).cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum($"x".cast(dec)).as("sx"), sum($"y".cast(dec)).as("sy"),
        sum($"x".cast(dec) * $"x".cast(dec)).as("sxx"),
        sum($"y".cast(dec) * $"y".cast(dec)).as("syy"),
        sum($"x".cast(dec) * $"y".cast(dec)).as("sxy"))
      .select($"n",
        round(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"n" * $"sxx" - $"sx" * $"sx").cast("double"), 6).as("slope6"),
        round(
          (($"n" * $"sxy" - $"sx" * $"sy").cast("double") *
            ($"n" * $"sxy" - $"sx" * $"sy").cast("double")) /
            (($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
              ($"n" * $"syy" - $"sy" * $"sy").cast("double")), 6).as("r2_6"))
  }
  private val zipfSql =
    s"""WITH tok AS (SELECT unnest(${TextPrep.wordsSql}) AS t FROM documents),
       |v AS (SELECT t, COUNT(*) AS tf FROM tok WHERE t <> '' GROUP BY t
       |      ORDER BY tf DESC, t LIMIT $ZipfK),
       |r AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, t) AS rn FROM v),
       |q AS (SELECT
       |    CAST(floor(ln(CAST(rn AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
       |    CAST(floor(ln(CAST(tf AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
       |  FROM r),
       |m AS (SELECT COUNT(*) AS n,
       |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
       |    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
       |    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
       |    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
       |  FROM q)
       |SELECT n,
       |  round(CAST(n * sxy - sx * sy AS DOUBLE)
       |    / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope6,
       |  round((CAST(n * sxy - sx * sy AS DOUBLE)
       |      * CAST(n * sxy - sx * sy AS DOUBLE))
       |    / (CAST(n * sxx - sx * sx AS DOUBLE)
       |      * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2_6
       |FROM m""".stripMargin

  // -- text_fix_encoding: mojibake / control-char / width repair ------------
  // The ftfy-class pass every real ingest runs before anything else:
  // crawled text arrives with UTF-8 bytes mis-decoded as cp1252
  // ("cafÃ©" for "café"), zero-width/control characters that break
  // tokenizers invisibly, and fullwidth/ligature forms that fragment
  // the vocabulary. The repair kernel is a fixed chain of literal
  // replaces + one character-class strip + one translate — pure
  // row-local codegen'd string work, zero shuffle, streams over 100 TB
  // exactly like the quality scorer. The corpus is clean ASCII, so the
  // query PLANTS deterministic corruptions per doc_id class (mojibake /
  // ctrl+zero-width / none / width-fold) alongside the intended clean
  // form, then repairs the dirty column: n_roundtrip_ok == n_docs is
  // the built-in proof the repair reconstructs the intended text
  // exactly, and the oracle replays plant+repair from the SAME pinned
  // constants (the SQL below is GENERATED from them — one source of
  // truth, two engines).
  /** What UTF-8 text looks like after a cp1252 mis-decode — the
    * corruption this operator both PLANTS and repairs. ASCII bytes are
    * fixed points of cp1252, so only the non-ASCII chars mangle. */
  def cp1252Mojibake(good: String): String =
    new String(good.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))
  /** Repair table for the classic ftfy offenders (curly quotes, dashes,
    * Latin-1 letters), DERIVED from the true characters so the mangled
    * forms are exact by construction, never hand-typed. All repair
    * bytes are defined in cp1252 for these targets (no U+FFFD). */
  val MojibakeMap: Seq[(String, String)] = Seq(
    "’", "“", "”", "–", "—", // ’ “ ” – —
    "é", "è", "ï", "ü", "ñ") // é è ï ü ñ
    .map(g => cp1252Mojibake(g) -> g)
  /** Control + zero-width strip class (keeps \t \n \r). The \x{...}
    * spelling parses identically in Java regex and RE2/DuckDB. */
  val CtrlZwRe: String =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{200B}-\\x{200D}\\x{FEFF}]"
  /** Fullwidth→ASCII fold (NFKC's biggest block, as a translate pair). */
  val FwFrom: String = (0x21 to 0x7e).map(c => (c + 0xfee0).toChar).mkString
  val FwTo: String = (0x21 to 0x7e).map(_.toChar).mkString
  val Ligatures: Seq[(String, String)] =
    Seq("ﬀ" -> "ff", "ﬁ" -> "fi", "ﬂ" -> "fl")

  /** The repair kernel: demojibake → strip ctrl/zero-width → fold
    * widths → expand ligatures. Row-local; every step codegen'd. */
  def fixEncoding(c: Column): Column = {
    val demoji = MojibakeMap.foldLeft(c) { case (x, (bad, good)) =>
      replace(x, lit(bad), lit(good)) }
    val stripped = regexp_replace(demoji, CtrlZwRe, "")
    val folded = translate(stripped, FwFrom, FwTo)
    Ligatures.foldLeft(folded) { case (x, (bad, good)) =>
      replace(x, lit(bad), lit(good)) }
  }

  // planted corruption classes (dirty suffix, intended clean suffix).
  // Escapes, not literals: an invisible zero-width char typed into
  // source would make the plant unreviewable, and the mojibake form is
  // DERIVED from the clean one so it is exact by construction.
  private val MojiClean = " caf\u00e9 r\u00e9sum\u00e9 \u2014 na\u00efve"
  private val MojiDirty = cp1252Mojibake(MojiClean)
  private val CtrlClean = " zerowidth marked"
  private val CtrlDirty = " zero\u200Bwidth\uFEFF mark\u0007ed"
  private val FoldClean = " ABC file"
  private val FoldDirty = " \uFF21\uFF22\uFF23 \uFB01le"

  private def fixEncoding(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // class key = (doc_id div 20) % 4, NOT doc_id % 4: the corpus deals
    // sources as doc_id % 20, so a mod-4 key would give every source a
    // single corruption class; the div-20 key cycles all four classes
    // WITHIN each source and the per-source report shows mixed rates
    val m4 = expr("(doc_id div 20) % 4")
    val dirty = concat($"text",
      when(m4 === 0, lit(MojiDirty)).when(m4 === 1, lit(CtrlDirty))
        .when(m4 === 3, lit(FoldDirty)).otherwise(lit("")))
    val clean = concat($"text",
      when(m4 === 0, lit(MojiClean)).when(m4 === 1, lit(CtrlClean))
        .when(m4 === 3, lit(FoldClean)).otherwise(lit("")))
    Tables.documents(s, d)
      .select($"doc_id", $"source", dirty.as("dirty"), clean.as("clean"))
      .withColumn("repaired", fixEncoding($"dirty"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"dirty".contains("Ã") ||
          $"dirty".contains("â€"), 1L).otherwise(0L)).as("n_mojibake"),
        sum(when($"dirty".rlike(CtrlZwRe), 1L).otherwise(0L)).as("n_ctrl"),
        sum(when($"dirty".rlike("[\\x{FF01}-\\x{FF5E}\\x{FB00}-\\x{FB06}]"), 1L)
          .otherwise(0L)).as("n_fold"),
        sum(when($"repaired" =!= $"dirty", 1L).otherwise(0L)).as("n_changed"),
        sum(when($"repaired" === $"clean", 1L).otherwise(0L)).as("n_roundtrip_ok"))
      .orderBy($"source")
  }
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
  private val fixEncodingSql: String = {
    val demoji = MojibakeMap.foldLeft("dirty") { case (e, (b, g)) =>
      s"replace($e, ${sqlLit(b)}, ${sqlLit(g)})" }
    val stripped = s"regexp_replace($demoji, ${sqlLit(CtrlZwRe)}, '', 'g')"
    val folded = s"translate($stripped, ${sqlLit(FwFrom)}, ${sqlLit(FwTo)})"
    val repaired = Ligatures.foldLeft(folded) { case (e, (b, g)) =>
      s"replace($e, ${sqlLit(b)}, ${sqlLit(g)})" }
    s"""WITH planted AS (
       |  SELECT doc_id, source,
       |    text || CASE WHEN (doc_id // 20) % 4 = 0 THEN ${sqlLit(MojiDirty)}
       |                 WHEN (doc_id // 20) % 4 = 1 THEN ${sqlLit(CtrlDirty)}
       |                 WHEN (doc_id // 20) % 4 = 3 THEN ${sqlLit(FoldDirty)}
       |                 ELSE '' END AS dirty,
       |    text || CASE WHEN (doc_id // 20) % 4 = 0 THEN ${sqlLit(MojiClean)}
       |                 WHEN (doc_id // 20) % 4 = 1 THEN ${sqlLit(CtrlClean)}
       |                 WHEN (doc_id // 20) % 4 = 3 THEN ${sqlLit(FoldClean)}
       |                 ELSE '' END AS clean
       |  FROM documents),
       |r AS (SELECT *, $repaired AS repaired FROM planted)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN contains(dirty, ${sqlLit("Ã")})
       |    OR contains(dirty, ${sqlLit("â€")}) THEN 1 ELSE 0 END) AS BIGINT) AS n_mojibake,
       |  CAST(SUM(CASE WHEN regexp_matches(dirty, ${sqlLit(CtrlZwRe)})
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
       |  CAST(SUM(CASE WHEN regexp_matches(dirty,
       |    '[\\x{FF01}-\\x{FF5E}\\x{FB00}-\\x{FB06}]') THEN 1 ELSE 0 END) AS BIGINT) AS n_fold,
       |  CAST(SUM(CASE WHEN repaired <> dirty THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       |  CAST(SUM(CASE WHEN repaired = clean THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
       |FROM r GROUP BY source ORDER BY source""".stripMargin
  }

  // -- text_url_domains: domain extraction + per-domain cap -----------------
  // Source-level governance (q_source_cap) is too coarse for web data:
  // production mixes cap by REGISTRABLE DOMAIN — one hot domain behind
  // ten subdomains must not dominate the corpus. Extract URLs from the
  // text (planted deterministically: the corpus has none), roll hosts
  // up to the registrable domain, and report per-domain exact counts
  // plus the cap application (first-K docs by doc_id; kept_docid_sum
  // pins WHICH docs survived, not just how many). Scale shape: explode
  // on extracted hosts (O(urls), never O(docs²)); the per-domain rank
  // filter plans as WindowGroupLimit — each map partition ships at
  // most K rows per domain, so a 10⁹-doc domain caps without sorting
  // its full document set.
  val UrlHosts: Seq[String] = Seq(
    "www.example.com", "docs.example.com", "blog.foo-press.org",
    "cdn.foo-press.org", "news.barnews.net", "wiki.knowledge.io")
  val DomainCap = 40
  private val HostRe = "https?://([A-Za-z0-9.-]+)"
  private val RegDomRe = "[A-Za-z0-9-]+\\.[A-Za-z]+$"

  private def urlDomains(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val host = element_at(
      array(UrlHosts.map(lit): _*), ($"doc_id" % 6).cast("int") + 1)
    val aug = concat($"text", lit(" see https://"), host,
      lit("/p"), $"doc_id".cast("string"),
      when($"doc_id" % 3 === 0,
        concat(lit(" and http://mirror.example.com/p"), $"doc_id".cast("string")))
        .otherwise(lit("")))
    val urls = Tables.documents(s, d)
      .select($"doc_id", size(TextPrep.words($"text")).cast("long").as("n_words"),
        explode(regexp_extract_all(aug, lit(HostRe), lit(1))).as("host"))
      .withColumn("domain", regexp_extract($"host", RegDomRe, 0))
    val perUrl = urls.groupBy($"domain").agg(count(lit(1)).as("n_urls"))
    val dd = urls.select($"domain", $"doc_id", $"n_words").distinct()
      .localCheckpoint() // consumed by the totals AND the cap leg
    val perDoc = dd.groupBy($"domain")
      .agg(count(lit(1)).as("n_docs"), sum($"n_words").as("n_tokens"))
    // rank FILTER (not a windowed sum) so Spark plans WindowGroupLimit:
    // each map partition ships at most K rows per domain to the sort —
    // a 10⁹-doc hot domain caps without ever fully sorting its docs
    val rn = Window.partitionBy($"domain").orderBy($"doc_id")
    val kept = dd.withColumn("rn", row_number().over(rn))
      .filter($"rn" <= DomainCap)
      .groupBy($"domain")
      .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("kept_docid_sum"))
    perUrl.join(perDoc, "domain").join(kept, "domain")
      .select($"domain", $"n_urls", $"n_docs", $"n_tokens", $"n_kept",
        $"kept_docid_sum")
      .orderBy($"domain")
  }
  private val urlDomainsSql = {
    val hostCase = UrlHosts.zipWithIndex
      .map { case (h, i) => s"WHEN $i THEN '$h'" }
      .mkString("CASE doc_id % 6 ", " ", " END")
    s"""WITH aug AS (
       |  SELECT doc_id, len(${TextPrep.wordsSql}) AS n_words,
       |    text || ' see https://' || ($hostCase) ||
       |    '/p' || CAST(doc_id AS VARCHAR) ||
       |    CASE WHEN doc_id % 3 = 0
       |      THEN ' and http://mirror.example.com/p' || CAST(doc_id AS VARCHAR)
       |      ELSE '' END AS aug
       |  FROM documents),
       |urls AS (
       |  SELECT doc_id, n_words,
       |    regexp_extract(host, '$RegDomRe', 0) AS domain
       |  FROM (SELECT doc_id, n_words,
       |          unnest(regexp_extract_all(aug, '$HostRe', 1)) AS host
       |        FROM aug)),
       |per_url AS (SELECT domain, COUNT(*) AS n_urls FROM urls GROUP BY 1),
       |dd AS (SELECT DISTINCT domain, doc_id, n_words FROM urls),
       |ranked AS (SELECT *,
       |    row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
       |  FROM dd),
       |per_doc AS (SELECT domain, COUNT(*) AS n_docs,
       |    CAST(SUM(n_words) AS BIGINT) AS n_tokens,
       |    CAST(SUM(CASE WHEN rn <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(SUM(CASE WHEN rn <= $DomainCap THEN doc_id ELSE 0 END) AS BIGINT)
       |      AS kept_docid_sum
       |  FROM ranked GROUP BY 1)
       |SELECT domain, n_urls, n_docs, n_tokens, n_kept, kept_docid_sum
       |FROM per_url JOIN per_doc USING (domain)
       |ORDER BY domain""".stripMargin
  }

  // -- text_pack_sequences: concat-and-chunk training-sequence packing -------
  // The step between chunking (40f) and the training loader: pretraining
  // batches are FIXED-length token sequences, and the standard way to
  // fill them (GPT-2 onward) is to concatenate the corpus in a
  // deterministic document order and split every PackCap tokens —
  // documents may span sequence boundaries, padding exists only in the
  // final sequence. Exactly that, distributed: per-doc token counts,
  // then each doc's global token interval [t_start, t_end) from the
  // range-partitioned prefix sum (valueKeyedCums over doc_id — NO
  // single-partition global window; the r11 q_lorenz discipline), then
  // each doc explodes to the ≤ O(len/PackCap) sequence bins it
  // overlaps. The emitted one-row packing audit (sequence count, full
  // sequences, boundary-spanning docs, max docs per sequence, last-
  // sequence fill) is exact integers — the numbers a data-loader
  // release checks before training. The oracle replays the identical
  // deterministic packing with one SQL window.
  private val PackCap = 256L // tokens per training sequence

  private def packSequences(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"doc_id", size(TextPrep.words($"text")).cast("long").as("n_tok"))
    val cum = SemiStructured.valueKeyedCums(toks, "doc_id", Seq("n_tok"))
      .withColumn("t_end", $"cum_n_tok")
      .withColumn("t_start", $"cum_n_tok" - $"n_tok")
      .filter($"n_tok" > 0)
    val spans = cum
      .withColumn("bin", explode(expr(
        s"sequence(t_start div $PackCap, (t_end - 1) div $PackCap)")))
      .withColumn("tok_in_bin",
        least($"t_end", ($"bin" + 1) * PackCap) -
          greatest($"t_start", $"bin" * PackCap))
    val bins = spans.groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"tok_in_bin").as("n_tokens"))
    val boundary = cum.filter(
      expr(s"t_start div $PackCap") =!= expr(s"(t_end - 1) div $PackCap"))
      .agg(count(lit(1)).as("n_boundary_docs"))
    bins.agg(
        count(lit(1)).as("n_sequences"),
        sum(when($"n_tokens" === PackCap, 1L).otherwise(0L)).as("n_full_sequences"),
        max($"n_docs").as("max_docs_per_sequence"),
        sum($"n_tokens").as("total_tokens"),
        max(struct($"bin", $"n_tokens")).getField("n_tokens").as("last_sequence_fill"))
      .crossJoin(broadcast(boundary))
      .select($"n_sequences", $"n_full_sequences", $"n_boundary_docs",
        $"max_docs_per_sequence", $"total_tokens", $"last_sequence_fill")
  }
  private val packSequencesSql =
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(len(${TextPrep.wordsSql}) AS BIGINT) AS n_tok
       |  FROM documents),
       |cum AS (SELECT doc_id, n_tok,
       |    SUM(n_tok) OVER (ORDER BY doc_id) AS t_end FROM toks),
       |r AS (SELECT doc_id, n_tok, t_end - n_tok AS t_start, t_end
       |      FROM cum WHERE n_tok > 0),
       |spans AS (
       |  SELECT doc_id, t_start, t_end,
       |    unnest(range(CAST(t_start // $PackCap AS BIGINT),
       |                 CAST((t_end - 1) // $PackCap + 1 AS BIGINT))) AS bin
       |  FROM r),
       |b AS (SELECT bin, COUNT(*) AS n_docs,
       |    SUM(LEAST(t_end, (bin + 1) * $PackCap) -
       |        GREATEST(t_start, bin * $PackCap)) AS n_tokens
       |  FROM spans GROUP BY bin),
       |bd AS (SELECT COUNT(*) AS n_boundary_docs FROM r
       |       WHERE t_start // $PackCap <> (t_end - 1) // $PackCap)
       |SELECT COUNT(*) AS n_sequences,
       |  CAST(SUM(CASE WHEN n_tokens = $PackCap THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_full_sequences,
       |  (SELECT n_boundary_docs FROM bd) AS n_boundary_docs,
       |  MAX(n_docs) AS max_docs_per_sequence,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST((SELECT n_tokens FROM b ORDER BY bin DESC LIMIT 1) AS BIGINT)
       |    AS last_sequence_fill
       |FROM b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("text_pack_sequences", packSequences, Some(packSequencesSql)),
    QueryDef("text_zipf", zipf, Some(zipfSql)),
    QueryDef("text_burstiness", burstiness, Some(burstinessSql)),
    QueryDef("text_readability", readability, Some(readabilitySql)),
    QueryDef("q_entropy", entropy, Some(entropySql)),
    QueryDef("text_hashing", hashingTrick, Some(hashingTrickSql)),
    QueryDef("pipeline_curriculum", pipelineCurriculum, Some(pipelineCurriculumSql)),
    QueryDef("text_pmi", pmi, Some(pmiSql)),
    QueryDef("q_curriculum_order", curriculumOrder, Some(curriculumOrderSql)),
    QueryDef("text_langid", langid, Some(langidSql)),
    QueryDef("q_langid_eval", langidEval, Some(langidEvalSql)),
    QueryDef("text_quality", quality, Some(qualitySql)),
    QueryDef("text_gopher_rules", gopherRules, Some(gopherRulesSql)),
    QueryDef("text_gopher_rep", gopherRep, Some(gopherRepSql)),
    QueryDef("text_tokens", tokens, Some(tokensSql)),
    QueryDef("text_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("text_tfidf", tfidf, Some(tfidfSql)),
    QueryDef("text_pii", pii, Some(piiSql)),
    QueryDef("text_fix_encoding", fixEncoding, Some(fixEncodingSql)),
    QueryDef("text_url_domains", urlDomains, Some(urlDomainsSql)),
    QueryDef("text_rep_removal", repRemoval, Some(repRemovalSql)),
    QueryDef("pipeline_prepare_corpus", prepareCorpus, Some(prepareCorpusSql)),
    QueryDef("pipeline_attrition", pipelineAttrition, Some(pipelineAttritionSql)),
    QueryDef("pipeline_chunked_corpus", chunkedCorpus, Some(chunkedCorpusSql)),
  )
}
