package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary: `graft_misra_gries(key, m)` keeps
  * at most `m` counters and returns map<key, lower_bound_count>.
  *
  * Guarantees (the classic MG bounds, preserved under merge):
  *  - every key with true frequency > n/(m+1) IS in the summary
  *    (no false negatives — the summary is a candidate SUPERSET);
  *  - each reported count understates the true count by at most
  *    n/(m+1).
  *
  * This is the mergeable-sketch shape for heavy hitters at 100 TB: the
  * per-partition state is m counters (constant), partial aggregation
  * happens map-side, and merge combines two summaries then re-prunes to
  * m — so the shuffle carries one tiny map per partition instead of a
  * per-key aggregate of the whole table. Because reported counts are
  * lower bounds (and WHICH near-threshold keys survive depends on merge
  * order), a deterministic query takes the summary as candidates and
  * exact-counts only those keys in a cheap second pass — see
  * `q_heavy_hitters`.
  *
  * Merge: sum counts, then if more than m keys survive, subtract the
  * (m+1)-th largest count from all and drop non-positives — the
  * standard MG summary merge (Agarwal et al., "Mergeable summaries",
  * PODS'12) which keeps the error additive across merges.
  */
case class MisraGriesAgg(
    child: Expression,
    m: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(m >= 1, s"graft_misra_gries needs m >= 1, got $m")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long], input: InternalRow):
      java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.toString
      // getOrDefault instead of get: the scala.Long value type would
      // silently unbox a null (absent key) to 0; 0 is unambiguous here
      // because zero counts are always removed
      val cur = buf.getOrDefault(k, 0L)
      if (cur > 0L) buf.put(k, cur + 1L)
      else if (buf.size < m) buf.put(k, 1L)
      else {
        // decrement step: all m counters and the new key each give up
        // one occurrence (m+1 distinct keys cancel)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b2.forEach((k, v) => b1.put(k, b1.getOrDefault(k, 0L) + v))
    if (b1.size > m) {
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - m - 1) // (m+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue - d <= 0L) it.remove() else e.setValue(e.getValue - d)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    // deterministic rendering: sort keys so the map's internal order
    // never leaks into results
    val keys = buf.keySet().toArray(new Array[String](buf.size))
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    new ArrayBasedMapData(
      new GenericArrayData(keys.map(k => UTF8String.fromString(k): Any)),
      new GenericArrayData(keys.map(k => buf.get(k): Any)))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (k, v) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf.put(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGries {
  /** Column API: heavy-hitter candidate summary with at most m counters. */
  def misra_gries(c: Column, m: Int): Column =
    graftshim.column(MisraGriesAgg(graftshim.expression(c), m)
      .toAggregateExpression())
}
