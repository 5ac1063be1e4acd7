package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built on
  * the codegen'd [[graft.functions.VecDot]] kernel (equivalent to
  * `aggregate(zip_with(...))`, which would run interpreted). Elements
  * are cast to double BEFORE multiply and summed left-to-right, which
  * both Spark and DuckDB reproduce bit-exactly.
  */
object VectorOps {
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vec_dot(a, b)
  def norm(a: Column): Column = sqrt(dot(a, a))
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB fragments computing the identical quantities. */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
}

/** Similarity search over embeddings (SURVEY.md §2.3 #33-36).
  *
  * Scale shapes (the 100 TB story):
  *  - brute-force top-k BROADCASTS the (small) query set and streams the
  *    corpus in one map pass; top-k is computed per-partition first
  *    (partial, O(queries×k) rows out of each partition) and merged, so
  *    no executor ever materializes corpus×queries rows in one place;
  *  - LSH/IVF paths prune candidates by bucket equi-joins — shuffle is
  *    O(corpus × bands), never O(corpus²);
  *  - hyperplanes/centroid choices are deterministic (seeded), which is
  *    what makes the DuckDB oracle able to replay them and also what a
  *    production run wants for reproducibility.
  */
object Similarity {

  private val Dims = 64
  private val Planes = 16          // 16-bit signature
  private val BandBits = 4         // 4 bands × 4 bits

  /** Deterministic Rademacher (±1) hyperplanes, shared verbatim with the
    * oracle SQL. */
  private[operators] val hyperplanes: Seq[Seq[Double]] = {
    val rng = new scala.util.Random(12345)
    Seq.fill(Planes)(Seq.fill(Dims)(if (rng.nextBoolean()) 1.0 else -1.0))
  }
  private def hpSql(j: Int): String =
    hyperplanes(j).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  /** 16-bit hyperplane signature of an embedding column. */
  private def signature(emb: Column): Column =
    (0 until Planes).map { j =>
      (when(VectorOps.dot(emb, typedlit(hyperplanes(j))) > 0, 1L).otherwise(0L)
        * lit(1L << j))
    }.reduce(_ + _)

  private val signatureSql: String =
    (0 until Planes).map { j =>
      s"(CASE WHEN ${VectorOps.dotSql("embedding", s"CAST(${hpSql(j)} AS DOUBLE[])")} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def bandsOf(sig: Column): Column =
    array((0 until Planes / BandBits).map(b =>
      struct(lit(b).as("band_id"),
        shiftrightunsigned(sig, b * BandBits).bitwiseAND(lit((1L << BandBits) - 1)).as("band_val"))): _*)

  // -- #34 brute-force cosine top-k ----------------------------------------
  private def bruteforceTopk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        VectorOps.cosine($"qe", $"embedding").as("cos"))
    // partial top-k inside each partition, then global merge — the
    // pattern that keeps the sort local at 100 TB
    val partial = Window.partitionBy($"query_id", spark_partition_id())
      .orderBy($"cos".desc, $"neighbor_id")
    val global = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    scored
      .withColumn("pr", row_number().over(partial)).filter($"pr" <= 5)
      .withColumn("rank", row_number().over(global)).filter($"rank" <= 5)
      .select($"query_id", $"rank", $"neighbor_id", round($"cos", 6).as("cos6"))
      .orderBy($"query_id", $"rank")
  }
  private val bruteforceTopkSql =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |           WHERE vec_id % 50 = 0),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ${VectorOps.cosineSql("qe", "e.embedding")} AS cos
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos6
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // -- #35 LSH-bucketed ANN ------------------------------------------------
  // Candidates = corpus vectors sharing ≥1 signature band with the
  // query; re-ranked by exact cosine. The oracle replays the identical
  // seeded hyperplanes, so even LSH false negatives match exactly.
  private def annLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).withColumn("sig", signature($"embedding"))
    // bands carry only ids — dedup of candidates shuffles 2 longs per
    // row, never the 64-float vectors (those are re-joined afterwards)
    val corpusBands = emb.select($"vec_id", explode(bandsOf($"sig")).as("band"))
    val queryBands = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), explode(bandsOf($"sig")).as("qband"))
    val cand = corpusBands.join(broadcast(queryBands),
        $"band.band_id" === $"qband.band_id" &&
          $"band.band_val" === $"qband.band_val" &&
          $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"))
      .distinct()
    val queries = Tables.embeddings(s, d).filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val corpus = Tables.embeddings(s, d).select($"vec_id".as("nid"), $"embedding")
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    cand
      .join(broadcast(queries), $"query_id" === $"qid")
      .join(corpus, $"neighbor_id" === $"nid")
      .select($"query_id", $"neighbor_id",
        VectorOps.cosine($"qe", $"embedding").as("cos"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .select($"query_id", $"rank", $"neighbor_id", round($"cos", 6).as("cos6"))
      .orderBy($"query_id", $"rank")
  }
  private val annLshSql =
    s"""WITH sigs AS (SELECT vec_id, embedding, $signatureSql AS sig FROM embeddings),
       |bands AS (SELECT vec_id, embedding, b AS band_id,
       |            (sig // POWER(2, b * $BandBits)::BIGINT) % ${1 << BandBits} AS band_val
       |          FROM sigs, unnest(range(0, ${Planes / BandBits})) t(b)),
       |qb AS (SELECT vec_id AS query_id, embedding AS qe, band_id, band_val
       |       FROM bands WHERE vec_id % 50 = 0),
       |cand AS (SELECT DISTINCT qb.query_id, qb.qe, b.vec_id AS neighbor_id, b.embedding
       |         FROM bands b JOIN qb ON b.band_id = qb.band_id
       |           AND b.band_val = qb.band_val AND b.vec_id <> qb.query_id),
       |scored AS (SELECT query_id, neighbor_id,
       |    ${VectorOps.cosineSql("qe", "embedding")} AS cos FROM cand),
       |ranked AS (SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos6
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  // -- #36 IVF-style ANN, Lloyd-trained centroids --------------------------
  // Deterministic seed medoids, then LloydIters assign→update rounds.
  // The update keeps centroids ORACLE-REPLAYABLE across engines by two
  // choices: (1) a centroid is the element-wise SUM of its member
  // vectors, not the mean — cosine is scale-invariant, so the sum points
  // exactly where the mean does, and skipping the division removes the
  // engine-dependent float rounding it would introduce; (2) the sums run
  // in DECIMAL, which is exact and order-independent, so Spark's partial
  // aggregation and DuckDB's serial sum produce bit-identical centroids.
  // Assign passes shuffle only (vec_id, cell_id, ccos) triples — the
  // 64-float embeddings never ride the k× cross product; they are
  // re-joined by key once per update.
  private val LloydIters = 2

  private def annIvf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    // seed medoids, promoted to double so every generation of centroid
    // (seeded or decimal-sum-trained) has one type
    val c0 = emb.filter($"vec_id" % 50 === 7)
      .select($"vec_id".as("cell_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ce"))

    def assign(centroids: DataFrame): DataFrame = {
      val w = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cell_id")
      emb.crossJoin(broadcast(centroids))
        .select($"vec_id", $"cell_id",
          VectorOps.cosine($"embedding", $"ce").as("ccos"))
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"vec_id", $"cell_id")
    }

    def update(assigned: DataFrame): DataFrame =
      assigned.join(emb, "vec_id")
        .select($"cell_id", posexplode($"embedding"))
        .toDF("cell_id", "i", "v")
        .groupBy($"cell_id", $"i")
        .agg(sum($"v".cast("double").cast("decimal(28,10)")).cast("double").as("s"))
        .groupBy($"cell_id")
        .agg(array_sort(collect_list(struct($"i", $"s"))).as("ps"))
        .select($"cell_id", expr("transform(ps, p -> p.s)").as("ce"))

    val trained = (1 to LloydIters).foldLeft(c0)((c, _) => update(assign(c)))
    val assigned = assign(trained).join(emb, "vec_id")

    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val wProbe = Window.partitionBy($"query_id").orderBy($"qcos".desc, $"cell_id")
    val probed = queries.crossJoin(broadcast(trained))
      .select($"query_id", $"qe", $"cell_id",
        VectorOps.cosine($"qe", $"ce").as("qcos"))
      .withColumn("rn", row_number().over(wProbe)).filter($"rn" <= 2)
      .select($"query_id", $"qe", $"cell_id")
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    probed.join(assigned, "cell_id")
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        VectorOps.cosine($"qe", $"embedding").as("cos"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .select($"query_id", $"rank", $"neighbor_id", round($"cos", 6).as("cos6"))
      .orderBy($"query_id", $"rank")
  }

  /** One oracle assign pass against centroid CTE `c`. */
  private def assignSql(c: String): String =
    s"""SELECT vec_id, cell_id FROM (
       |    SELECT e.vec_id, c.cell_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${VectorOps.cosineSql("e.embedding", "ce")} DESC, c.cell_id) AS rn
       |    FROM embeddings e CROSS JOIN $c c) WHERE rn = 1""".stripMargin
  /** One oracle Lloyd update from assignment CTE `a`: decimal sums. */
  private def updateSql(a: String): String =
    s"""SELECT cell_id, list(s ORDER BY i) AS ce FROM (
       |    SELECT x.cell_id, t.i,
       |      CAST(SUM(CAST(CAST(e.embedding[t.i] AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE) AS s
       |    FROM $a x JOIN embeddings e ON x.vec_id = e.vec_id,
       |         unnest(range(1, ${Dims + 1})) t(i)
       |    GROUP BY x.cell_id, t.i) GROUP BY cell_id""".stripMargin

  private val annIvfSql =
    s"""WITH c0 AS (SELECT vec_id AS cell_id, CAST(embedding AS DOUBLE[]) AS ce
       |            FROM embeddings WHERE vec_id % 50 = 7),
       |a1 AS (${assignSql("c0")}),
       |c1 AS (${updateSql("a1")}),
       |a2 AS (${assignSql("c1")}),
       |c2 AS (${updateSql("a2")}),
       |assigned AS (
       |  SELECT f.vec_id, e.embedding, f.cell_id
       |  FROM (${assignSql("c2")}) f JOIN embeddings e ON f.vec_id = e.vec_id),
       |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |      WHERE vec_id % 50 = 0),
       |probed AS (
       |  SELECT query_id, qe, cell_id FROM (
       |    SELECT q.query_id, q.qe, c.cell_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${VectorOps.cosineSql("qe", "ce")} DESC, c.cell_id) AS rn
       |    FROM q CROSS JOIN c2 c) WHERE rn <= 2),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    ${VectorOps.cosineSql("qe", "a.embedding")} AS cos
       |  FROM probed p JOIN assigned a ON p.cell_id = a.cell_id
       |  WHERE a.vec_id <> p.query_id),
       |ranked AS (SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos6
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  // -- #33 embedding near-dup pairs ----------------------------------------
  // Same banded-signature candidates, symmetric self-join form, verified
  // by exact cosine ≥ 0.4 (this corpus has no ≥0.9 pairs; the threshold
  // exercises the shape). Oracle replays the hyperplanes.
  private def embeddingDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).withColumn("sig", signature($"embedding"))
    val bands = emb.select($"vec_id", explode(bandsOf($"sig")).as("band"))
    // candidate dedup on the id pair alone (2 longs/row); vectors are
    // fetched after, so the wide arrays never enter the distinct shuffle
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band.band_id" === $"b.band.band_id" &&
          $"a.band.band_val" === $"b.band.band_val" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"))
      .distinct()
    val ea = Tables.embeddings(s, d).select($"vec_id".as("ia"), $"embedding".as("emb_a"))
    val eb = Tables.embeddings(s, d).select($"vec_id".as("ib"), $"embedding".as("emb_b"))
    cand
      .join(ea, $"vec_a" === $"ia").join(eb, $"vec_b" === $"ib")
      .select($"vec_a", $"vec_b", VectorOps.cosine($"emb_a", $"emb_b").as("cos"))
      .filter($"cos" >= 0.4)
      .select($"vec_a", $"vec_b", round($"cos", 6).as("cos6"))
      .orderBy($"vec_a", $"vec_b")
  }
  private val embeddingDedupSql =
    s"""WITH sigs AS (SELECT vec_id, embedding, $signatureSql AS sig FROM embeddings),
       |bands AS (SELECT vec_id, embedding, b AS band_id,
       |            (sig // POWER(2, b * $BandBits)::BIGINT) % ${1 << BandBits} AS band_val
       |          FROM sigs, unnest(range(0, ${Planes / BandBits})) t(b)),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, a.embedding AS ea,
       |                b.vec_id AS vec_b, b.embedding AS eb
       |         FROM bands a JOIN bands b ON a.band_id = b.band_id
       |           AND a.band_val = b.band_val AND a.vec_id < b.vec_id),
       |scored AS (SELECT vec_a, vec_b, ${VectorOps.cosineSql("ea", "eb")} AS cos FROM cand)
       |SELECT vec_a, vec_b, round(cos, 6) AS cos6
       |FROM scored WHERE cos >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  // -- int8 scalar quantization with error accounting ----------------------
  // The compression step before any large-scale ANN index: per-vector
  // symmetric max-abs quantization to int8 (scale = max|x|/127,
  // q = round(x/scale)) shrinks the corpus 4× (float32 → int8) while
  // keeping cosine ranking nearly intact — and the error ACCOUNTING is
  // what makes it an operator rather than a cast: per-vector RMSE and
  // max-abs reconstruction error, aggregated per label. Everything is
  // per-row higher-order-function math over the array (zero shuffle
  // before the final tiny aggregate). Rounding is floor(x + 0.5) on
  // BOTH engines — `round()` is HALF_UP in Spark but half-away-from-
  // zero in DuckDB, another cross-engine landmine; floor is exact. The
  // per-row left-to-right array fold is deterministic in both engines,
  // and cross-row sums go through decimal.
  /** Per-row quantization-error kernel over any frame with an `e`
    * (array<float> or array<double>) column: attaches scale, rmse,
    * max_abs via the codegen'd one-pass [[graft.functions.QuantizeStats]]
    * expression (the HOF spelling is five interpreted lambda passes with
    * three intermediate arrays per row). Public so the spec can assert
    * the |err| <= scale/2 bound row by row. */
  def quantizeErrors(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.withColumn("qs", graft.functions.GraftFunctions.quantize_stats($"e"))
      .withColumn("scale", $"qs.scale")
      .withColumn("rmse", $"qs.rmse")
      .withColumn("max_abs", $"qs.max_abs")
      .drop("qs")
  }

  private def quantizeInt8(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    quantizeErrors(Tables.embeddings(s, d)
        .select($"vec_id", $"label", $"embedding".as("e")))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        (sum($"rmse".cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .cast("double") / count(lit(1))).as("avg_rmse"),
        max($"max_abs").as("max_abs_err"))
      .orderBy($"label")
  }
  private val quantizeInt8Sql =
    """WITH v AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |s AS (
      |  SELECT label, e,
      |    list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      |  FROM v),
      |q AS (
      |  SELECT label, e,
      |    CASE WHEN scale = 0.0
      |         THEN list_transform(e, x -> CAST(0.0 AS DOUBLE))
      |         ELSE list_transform(e, x -> x - floor(x / scale + 0.5) * scale)
      |    END AS err
      |  FROM s),
      |m AS (
      |  SELECT label,
      |    sqrt(list_aggregate(list_transform(err, x -> x * x), 'sum')
      |         / len(e)) AS rmse,
      |    list_max(list_transform(err, x -> abs(x))) AS max_abs
      |  FROM q)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(CAST(rmse AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS avg_rmse,
      |  MAX(max_abs) AS max_abs_err
      |FROM m GROUP BY label ORDER BY label""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("sim_quantize_int8", quantizeInt8, Some(quantizeInt8Sql)),
    QueryDef("sim_bruteforce_topk", bruteforceTopk, Some(bruteforceTopkSql)),
    QueryDef("sim_ann_lsh", annLsh, Some(annLshSql)),
    QueryDef("sim_ann_ivf", annIvf, Some(annIvfSql)),
    QueryDef("dedup_embedding", embeddingDedup, Some(embeddingDedupSql)),
  )
}
