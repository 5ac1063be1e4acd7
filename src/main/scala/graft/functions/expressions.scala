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

/** 64-bit SimHash over a token array: per-token xxhash64 votes ±1 on
  * each of 64 bit positions; the sign of each counter becomes the bit.
  * Near-identical documents differ in a handful of bits, so Hamming
  * distance ≤ k finds near-dups; banding the 64 bits into 16-bit chunks
  * gives an exact-match LSH key (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 of 4
  * bands identical).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = impl.hash(arr.getUTF8String(i), 42L)
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
      val s = ctx.freshName("s")
      val xxh = classOf[XXH64].getName
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    UTF8String $s = $arr.getUTF8String($i);
         |    long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
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

/** 64-bit FNV-1a content fingerprint over a string's UTF-8 bytes — a
  * rolling byte-wise polynomial hash (h ← (h ⊕ byte)·FNV_PRIME), one
  * pass, codegen'd. Used for compact document identity at 100 TB:
  * dedup/shuffle on the 8-byte fingerprint instead of multi-KB texts.
  */
case class Fingerprint64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_fingerprint64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
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
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h ^ ($bytes[$i] & 0xffL)) * 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
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

  private val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("graft_minhash_sig", es => MinHashSig(es.head,
      es(1).eval().asInstanceOf[Int])),
    ("graft_simhash64", es => SimHash64(es.head)),
    ("graft_fingerprint64", es => Fingerprint64(es.head)))

  /** Make the functions callable from SQL in an existing session. */
  def register(spark: SparkSession): Unit = sqlFunctions.foreach { case (name, b) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "builtin")
  }
}

/** `SparkSessionExtensions` hook — production registration path:
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es.head, es(1).eval().asInstanceOf[Int])))
    ext.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "graft_fingerprint64"),
      (es: Seq[Expression]) => Fingerprint64(es.head)))
  }
}
