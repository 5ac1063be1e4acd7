package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the LLM-data-pipeline operators
  * (SURVEY.md §2.3) — the hot-path primitives that built-in functions
  * can't express in one pass. All three implement `doGenCode`, so they
  * stay inside WholeStageCodegen: per-row work with zero boxing, no UDF
  * serialization, and no shuffle — the properties that matter when the
  * input is 100 TB of documents.
  */
object impl {
  /** xxhash64 over a UTF8String with an explicit seed. */
  @inline def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  /** Lower md5 half: digest bytes 8..15 as a little-endian long — the
    * one 64-bit string hash BOTH engines evaluate natively (DuckDB's
    * `md5_number_lower`), which is what makes simhash signatures — and
    * therefore hamming distances — oracle-replayable. ~10× an xxh64
    * per call, which is noise next to the band join it feeds. */
  def md5Lower64(s: UTF8String, md: java.security.MessageDigest): Long = {
    val d = md.digest(s.getBytes) // digest() resets the instance
    var h = 0L
    var k = 0
    while (k < 8) { h |= (d(8 + k) & 0xffL) << (8 * k); k += 1 }
    h
  }

  /** MessageDigest is stateful and not thread-safe; interpreted eval
    * shares Expression instances across tasks, so give each thread its
    * own. Codegen allocates a per-operator instance instead. */
  val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** One-pass MinHash signature over a set of shingles.
  *
  * Instead of k independent passes (`array_min(transform(...))` × k —
  * k array scans per row), this computes all k lanes in a single scan
  * using standard double hashing: lane_i(x) = h1(x) + i·h2(x), where
  * h1/h2 are xxhash64 with different seeds. One signature per document;
  * near-dup candidate generation then bands the signature (LSH), so the
  * candidate join is O(docs × bands), never O(docs²).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = impl.hash(s, 42L)
        val h2 = impl.hash(s, 77L) | 1L // odd => all lanes distinct mod 2^64
        var k = 0
        var lane = h1
        while (k < numHashes) {
          if (lane < mins(k)) mins(k) = lane
          lane += h2
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val lane = ctx.freshName("lane")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    UTF8String $s = $arr.getUTF8String($i);
         |    long $h1 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    long $h2 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 77L) | 1L;
         |    long $lane = $h1;
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      if ($lane < $mins[$k]) $mins[$k] = $lane;
         |      $lane += $h2;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per-token hash votes ±1 on each
  * of 64 bit positions; the sign of each counter becomes the bit.
  * Near-identical documents differ in a handful of bits, so Hamming
  * distance ≤ k finds near-dups; banding the 64 bits into 16-bit chunks
  * gives an exact-match LSH key (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 of 4
  * bands identical).
  *
  * The per-token hash is [[impl.md5Lower64]] — md5's low half rather
  * than xxh64 — specifically so the DuckDB oracle can replay the
  * signature bit-for-bit (`md5_number_lower`) and value-check the
  * emitted hamming distances, the same replayability discipline every
  * other operator follows. md5's bits are uniform, so simhash quality
  * is unchanged; the extra hash cost is confined to the one signature
  * pass per document.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = impl.mdLocal.get()
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = impl.md5Lower64(arr.getUTF8String(i), md)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val md = ctx.addMutableState("java.security.MessageDigest", "simhashMd",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              """.stripMargin)
      // Scala emits static forwarders on the object's plain class name
      val implCls = impl.getClass.getName.stripSuffix("$")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $implCls.md5Lower64($arr.getUTF8String($i), $md);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) if ($counts[$b] > 0) $sig |= (1L << $b);
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** [[impl.md5Lower64]] as a scalar expression: the low md5 half of a
  * string, the cross-engine-replayable 64-bit hash (DuckDB:
  * `md5_number_lower`). Feeds the deterministic HLL registers of
  * `q_approx_distinct` — a sketch whose oracle can rebuild it exactly.
  */
case class Md5Lower64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5lower64"

  override def nullSafeEval(input: Any): Any =
    impl.md5Lower64(input.asInstanceOf[UTF8String], impl.mdLocal.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val md = ctx.addMutableState("java.security.MessageDigest", "md5lowMd",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              """.stripMargin)
      val implCls = impl.getClass.getName.stripSuffix("$")
      s"${ev.value} = $implCls.md5Lower64($s, $md);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Lower64 =
    copy(child = newChild)
}

/** One-pass stopword scoring for language ID: count, with multiplicity,
  * how many tokens of `child` (an `array<string>`) hit each of the
  * per-language stopword lists; returns `array<int>` with one count per
  * list. The naive spelling — one `size(filter(words, w -> w IN (...)))`
  * per language — is N interpreted higher-order lambdas per row
  * (higher-order functions don't codegen), which dominated the text
  * bench 8× over its codegen'd siblings. Here: a single compiled scan
  * with one hash-map probe per token, all languages scored at once.
  * Lists must be disjoint (a token votes for exactly one language).
  */
case class StopwordScores(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_stopword_scores"

  /** token → language index; rebuilt lazily on each executor. */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](lists.map(_.size).sum * 2)
    lists.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val u = UTF8String.fromString(w)
        require(!m.containsKey(u), s"stopword '$w' appears in two lists")
        m.put(u, Int.box(i))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](lists.size)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val idx = lookup.get(arr.getUTF8String(i))
        if (idx != null) counts(idx) += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mapRef = ctx.addReferenceObj("stopwordMap", lookup, "java.util.HashMap")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      s"""
         |int[] $counts = new int[${lists.size}];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    Object $idx = $mapRef.get($arr.getUTF8String($i));
         |    if ($idx != null) $counts[((Integer) $idx).intValue()]++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StopwordScores =
    copy(child = newChild)
}

/** 64-bit content fingerprint over a string's UTF-8 bytes — a rolling
  * byte-wise polynomial hash (h ← (h ⊕ byte)·MULT), one pass, codegen'd.
  * Used for compact document identity at 100 TB: dedup/shuffle on the
  * 8-byte fingerprint instead of multi-KB texts.
  *
  * `lane` selects an independent hash family member for multi-lane
  * (128-bit) fingerprints. Lanes differ in the MULTIPLIER, not just the
  * seed: two FNV chains with the same multiplier and different seeds
  * satisfy h₁(x) − h₂(x) = (s₁ − s₂)·p^len for every input, so
  * equal-length texts that collide in one lane would ALWAYS collide in
  * the other — a seed-only second lane adds zero collision resistance.
  *  - lane 0: FNV-1a (offset 0xcbf29ce484222325, prime 0x100000001b3)
  *  - lane 1: same structure, Murmur64A multiplier 0xc6a4a7935bd1e995
  */
case class Fingerprint64(child: Expression, lane: Int = 0)
    extends UnaryExpression {
  require(lane == 0 || lane == 1, s"fingerprint lane must be 0 or 1, got $lane")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_fingerprint64"

  private val init = if (lane == 0) 0xcbf29ce484222325L else 0x9747b28c8e3c0e53L
  private val mult = if (lane == 0) 0x100000001b3L else 0xc6a4a7935bd1e995L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = init
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * mult
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $str.getBytes();
         |long $h = ${init}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h ^ ($bytes[$i] & 0xffL)) * ${mult}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** One-pass int8 quantization statistics over an embedding array:
  * returns struct(scale, rmse, max_abs) for per-vector symmetric
  * max-abs quantization (scale = max|x|/127, q = floor(x/scale + 0.5)).
  *
  * The higher-order-function spelling — transform(abs) → array_max →
  * transform(err) → aggregate(sq) → array_max(abs) — is FIVE
  * interpreted lambda passes with three materialized intermediate
  * arrays per row (HOFs don't codegen); on 100 TB of embeddings that
  * is the hot path. This expression fuses everything into two compiled
  * scans of the raw array (max pass, then error pass), zero
  * allocations beyond the 3-field result row. Accepts array<float> or
  * array<double>; floats are widened exactly like CAST(x AS DOUBLE),
  * the error fold is left-to-right, and rounding is floor(x + 0.5) —
  * bit-identical to the HOF chain and to the DuckDB oracle. A null
  * element or an empty array yields NULL (matching the HOF chain's
  * null propagation).
  */
case class QuantizeStats(child: Expression) extends UnaryExpression {
  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_quantize_stats needs array<float> or array<double>, got ${other.sql}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("rmse", DoubleType, nullable = false),
    StructField("max_abs", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  // NULL on empty arrays / null elements regardless of child nullability
  // (same convention as ArrayMax/ArrayMin); without this, a non-nullable
  // input makes nullSafeCodeGen emit the non-nullable branch, whose
  // assignment to ev.isNull doesn't compile and falls back to
  // interpreted eval.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantize_stats"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = math.abs(if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scale = maxAbs / 127.0
    var sq = 0.0
    var maxErr = 0.0
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val err = x - math.floor(x / scale + 0.5) * scale
        sq += err * err
        val a = math.abs(err)
        if (a > maxErr) maxErr = a
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, math.sqrt(sq / n), maxErr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val sq = ctx.freshName("sq")
      val maxErr = ctx.freshName("maxErr")
      val x = ctx.freshName("x")
      val err = ctx.freshName("err")
      val a = ctx.freshName("a")
      val bad = ctx.freshName("bad")
      val get = (idx: String) =>
        if (elemIsFloat) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |int $n = $arr.numElements();
         |boolean $bad = ($n == 0);
         |double $maxAbs = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) { $bad = true; break; }
         |  double $a = Math.abs(${get(i)});
         |  if ($a > $maxAbs) $maxAbs = $a;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $scale = $maxAbs / 127.0;
         |  double $sq = 0.0;
         |  double $maxErr = 0.0;
         |  if ($scale != 0.0) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $x = ${get(i)};
         |      double $err = $x - Math.floor($x / $scale + 0.5) * $scale;
         |      $sq += $err * $err;
         |      double $a = Math.abs($err);
         |      if ($a > $maxErr) $maxErr = $a;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $scale, Math.sqrt($sq / $n), $maxErr });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeStats =
    copy(child = newChild)
}

/** Column-API entry points + SQL registration for the custom exprs. */
object GraftFunctions {
  def minhash_sig(c: Column, numHashes: Int): Column =
    graftshim.column(MinHashSig(graftshim.expression(c), numHashes))
  def simhash64(c: Column): Column =
    graftshim.column(SimHash64(graftshim.expression(c)))
  def fingerprint64(c: Column): Column =
    graftshim.column(Fingerprint64(graftshim.expression(c)))
  def md5lower64(c: Column): Column =
    graftshim.column(Md5Lower64(graftshim.expression(c)))
  /** 128-bit fingerprint: two multiplier-independent 64-bit lanes as a
    * struct — at 100 TB doc counts the 64-bit birthday bound (~50%
    * collision odds at 5×10⁹ docs) silently merges distinct documents;
    * 128 bits pushes it past 10¹⁸. */
  def fingerprint128(c: Column): Column = {
    val e = graftshim.expression(c)
    org.apache.spark.sql.functions.struct(
      graftshim.column(Fingerprint64(e, 0)).as("h0"),
      graftshim.column(Fingerprint64(e, 1)).as("h1"))
  }
  def shingles(c: Column, n: Int): Column =
    graftshim.column(Shingles(graftshim.expression(c), n))
  def vec_dot(a: Column, b: Column): Column =
    graftshim.column(VecDot(graftshim.expression(a), graftshim.expression(b)))
  def vec_l2sq(a: Column, b: Column): Column =
    graftshim.column(VecL2Sq(graftshim.expression(a), graftshim.expression(b)))
  def vec_cosine(a: Column, b: Column): Column =
    graftshim.column(VecCosine(graftshim.expression(a), graftshim.expression(b)))
  def adc_sum(code: Column, tab: Column): Column =
    graftshim.column(AdcLookupSum(graftshim.expression(code), graftshim.expression(tab)))
  def zorder64(a: Column, b: Column): Column =
    graftshim.column(ZOrder64(graftshim.expression(a), graftshim.expression(b)))
  def stopword_scores(c: Column, lists: Seq[Seq[String]]): Column =
    graftshim.column(StopwordScores(graftshim.expression(c), lists))
  def quantize_stats(c: Column): Column =
    graftshim.column(QuantizeStats(graftshim.expression(c)))

  /** Validated SQL builder for graft_stopword_scores(words, 'w1,w2,…',
    * …): every list argument must be a foldable non-null string of
    * non-empty comma-separated tokens, and tokens must not repeat
    * across lists — checked HERE, at function-build (analysis) time,
    * with an actionable message, instead of surfacing later as an NPE
    * in `eval` or the lookup-map `require` blowing up inside codegen.
    * (Comma-containing stopwords are inexpressible in this form by
    * design; none of the supported languages tokenize them.)
    */
  private[functions] def stopwordScoresBuilder(es: Seq[Expression]): Expression = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"graft_stopword_scores(words, 'w1,w2,…', …): $msg")
    if (es.size < 2) fail("needs the token-array column and at least one stopword list")
    val seen = scala.collection.mutable.HashMap[String, Int]()
    val lists = es.tail.zipWithIndex.map { case (e, i) =>
      val argNo = i + 2
      if (!e.foldable) fail(s"argument $argNo must be a literal string, got: $e")
      val v = e.eval()
      if (v == null) fail(s"argument $argNo must not be NULL")
      val toks = v.toString.split(",").map(_.trim).toSeq
      if (toks.isEmpty || toks.exists(_.isEmpty))
        fail(s"argument $argNo contains an empty stopword token ('${v.toString}')")
      toks.foreach { t =>
        seen.put(t, argNo).foreach(prev =>
          fail(s"stopword '$t' appears in both argument $prev and argument $argNo " +
            "— lists must be disjoint (a token votes for exactly one language)"))
      }
      toks
    }
    StopwordScores(es.head, lists)
  }

  private[functions] def sqlFunctionSeq: Seq[(String, Class[_], Seq[Expression] => Expression)] =
    sqlFunctions

  // (name, implementing expression class, builder) — the class rides
  // along so DESCRIBE FUNCTION / catalog metadata points at the
  // expression, not at this registry object
  private val sqlFunctions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_minhash_sig", classOf[MinHashSig], es => MinHashSig(es.head,
      es(1).eval().asInstanceOf[Int])),
    ("graft_simhash64", classOf[SimHash64], es => SimHash64(es.head)),
    ("graft_fingerprint64", classOf[Fingerprint64], es => Fingerprint64(es.head)),
    ("graft_md5lower64", classOf[Md5Lower64], es => Md5Lower64(es.head)),
    ("graft_shingles", classOf[Shingles], es => Shingles(es.head,
      es(1).eval().asInstanceOf[Int])),
    ("graft_vec_dot", classOf[VecDot], es => VecDot(es.head, es(1))),
    ("graft_vec_l2sq", classOf[VecL2Sq], es => VecL2Sq(es.head, es(1))),
    ("graft_vec_cosine", classOf[VecCosine], es => VecCosine(es.head, es(1))),
    ("graft_adc_sum", classOf[AdcLookupSum], es => AdcLookupSum(es.head, es(1))),
    ("graft_zorder64", classOf[ZOrder64], es => ZOrder64(es.head, es(1))),
    // graft_stopword_scores(words, 'w1,w2,...', 'w3,w4,...'): one
    // comma-joined string literal per language list
    ("graft_stopword_scores", classOf[StopwordScores], stopwordScoresBuilder _),
    ("graft_quantize_stats", classOf[QuantizeStats], es => QuantizeStats(es.head)),
    // aggregate: the analyzer wraps a bare AggregateFunction in
    // AggregateExpression exactly as for built-in registry entries
    ("graft_misra_gries", classOf[MisraGriesAgg], es => {
      def fail(): Nothing = throw new IllegalArgumentException(
        "graft_misra_gries(key, m): m must be a literal int")
      if (es.size != 2 || !es(1).foldable) fail()
      // exact integral values only — a string literal must get the
      // friendly error (not a ClassCastException) and a fractional
      // literal must not silently truncate (m changes the
      // no-false-negative threshold n/(m+1))
      val m = es(1).eval() match {
        case i: Int => i
        case l: Long if l.isValidInt => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case _ => fail()
      }
      MisraGriesAgg(es.head, m)
    }))

  /** Make the functions callable from SQL in an existing session —
    * scalar expressions, the `graft_asof_join` table function, and the
    * as-of planner strategy (the TVF is useless without it). */
  def register(spark: SparkSession): Unit = {
    sqlFunctions.foreach { case (name, _, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
    }
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_asof_join", graft.plans.Asof.sqlBuilder, "built-in")
    graft.plans.Asof.ensureStrategy(spark)
  }
}

/** `SparkSessionExtensions` hook — production registration path:
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // scalar functions come from the SAME list register() uses — the
    // two paths used to be maintained by hand and drifted (zorder64 was
    // temp-registered but never injected here)
    GraftFunctions.sqlFunctionSeq.foreach { case (name, cls, builder) =>
      ext.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))
    }
    // whole-operator extension: native as-of join (graft.plans) + its
    // SQL table-valued function
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectTableFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_asof_join"),
      new ExpressionInfo(classOf[graft.plans.AsofJoinByName].getName, "graft_asof_join"),
      graft.plans.Asof.sqlBuilder _))
  }
}

/** One-pass shingling: normalize (lower, collapse whitespace, trim),
  * split, emit DISTINCT word n-grams. Semantically identical to
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', ...)))`
  * over `split(lower(trim(regexp_replace(text,'\s+',' '))), ' ')` — but
  * one compiled pass instead of re-running the regex split for every
  * lambda element access (higher-order functions don't codegen and
  * re-evaluate the split per element: O(words²) regex work per row).
  * On the documents corpus this is the difference between an operator
  * that scans 100 TB and one that dies re-tokenizing it.
  */
object ShingleUtil {
  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val words = text.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    if (words.length < n || (words.length == 1 && words(0).isEmpty))
      return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.ShingleUtil.shingles($str, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Dot product of two `array<float|double>` columns, accumulated in
  * double LEFT-TO-RIGHT (index order) — the exact summation order the
  * DuckDB oracles replay, and the same semantics as
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)`, which Spark runs
  * interpreted (higher-order functions don't codegen). One compiled
  * loop instead: the hot inner kernel of every similarity operator.
  */
/** Morton (Z-order) interleave of the low 32 bits of two longs — the
  * clustering key for multi-dimensional data skipping: sort/partition by
  * z-value and BOTH dimensions' min/max parquet stats stay tight per
  * file, so a 2-d box predicate prunes row groups on both axes (a
  * single-column sort only ever prunes one). Standard bit-spreading via
  * magic masks, one pass, codegen'd.
  */
case class ZOrder64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder64"

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrder64.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder64.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {
  @inline private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
  /** even bits ← a, odd bits ← b */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

case class VecDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  private def get(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(a, i, left.dataType) * get(b, i, right.dataType)
      i += 1
    }
    acc
  }

  private def genGet(v: String, i: String, dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $v.getFloat($i)"
    case _ => s"$v.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${genGet(a, i.toString, left.dataType)} * ${genGet(b, i.toString, right.dataType)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared L2 distance Σ(aᵢ−bᵢ)² — the [[VecDot]] twin for
  * the ANN re-rank path, replacing the interpreted
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)²), 0d, +)` fold. The loop
  * accumulates LEFT-TO-RIGHT, so the IEEE result is bit-identical to
  * that fold and to the DuckDB `list_sum(list_transform(...))` the
  * queries are oracled against. */
case class VecL2Sq(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_vec_l2sq"

  private def get(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, i, left.dataType) - get(b, i, right.dataType)
      acc += d * d
      i += 1
    }
    acc
  }

  private def genGet(v: String, i: String, dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $v.getFloat($i)"
    case _ => s"$v.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dv = ${genGet(a, i.toString, left.dataType)} - ${genGet(b, i.toString, right.dataType)};
         |  $acc += $dv * $dv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd ADC table-lookup sum Σₘ tab[m][code[m]] — the inner loop
  * of every PQ scoring pass (one row per (query, candidate) in the
  * ANN/hybrid paths), replacing the interpreted
  * `aggregate(zip_with(code, tab, (c, t) -> t[c]), 0D, (a, v) -> a + v)`
  * fold (higher-order functions don't codegen; measured the dominant
  * CPU of the hybrid dense leg at sf0.1). Accumulates LEFT-TO-RIGHT in
  * subspace order m = 0..M−1, exactly the fold order of the expression
  * it replaces, so the IEEE double result is bit-identical. Null
  * semantics match the fold's null-poisoning: mismatched lengths, a
  * null element on either side, or an out-of-range code index all made
  * some lambda result null, which `a + v` then carried to the end —
  * here any of those returns null directly. */
case class AdcLookupSum(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even for non-null children (the bad-shape guard returns
  // null), else codegen folds ev.isNull to a literal and the guard
  // assignment does not compile
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc_sum"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val code = l.asInstanceOf[ArrayData]
    val tab = r.asInstanceOf[ArrayData]
    val n = code.numElements()
    if (tab.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (code.isNullAt(i) || tab.isNullAt(i)) return null
      val c = code.getInt(i)
      val row = tab.getArray(i)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getDouble(c)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, tab) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $code.numElements();
         |double $acc = 0.0;
         |boolean $bad = ($tab.numElements() != $n);
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($code.isNullAt($i) || $tab.isNullAt($i)) { $bad = true; break; }
         |  int $c = $code.getInt($i);
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $tab.getArray($i);
         |  if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) { $bad = true; break; }
         |  $acc += $row.getDouble($c);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd one-pass cosine similarity: dot, |a|² and |b|² accumulate
  * in a single traversal (the composed dot/sqrt form walks each pair
  * three times). Each of the three sums accumulates LEFT-TO-RIGHT
  * independently, so every partial is bit-identical to the separate
  * [[VecDot]] passes and to the DuckDB
  * `list_sum(list_transform(...)) / (sqrt(..) * sqrt(..))` fragment
  * the queries are oracled against; the final combination is the same
  * `dot / (sqrt(na) * sqrt(nb))` expression tree. */
case class VecCosine(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_vec_cosine"

  private def get(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, left.dataType)
      val y = get(b, i, right.dataType)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def genGet(v: String, i: String, dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $v.getFloat($i)"
    case _ => s"$v.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${genGet(a, i.toString, left.dataType)};
         |  double $y = ${genGet(b, i.toString, right.dataType)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}
