package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{DataFrame, graftshim}

/** Native as-of (point-in-time) join — the whole-operator extension path
  * (custom LogicalPlan + SparkStrategy + SparkPlan) for the one operator
  * family Spark genuinely lacks a built-in for.
  *
  * Physical contract: both sides hash-clustered on the key and sorted by
  * (key, time) — the SAME distribution a sort-merge join would demand,
  * so Catalyst inserts exactly one Exchange per side and can reuse
  * existing partitioning. Execution is then a single streaming merge
  * pass per partition: O(|L| + |R|), O(1) state (one buffered right
  * row), no row multiplication — vs the union+window formulation, which
  * materializes L+R rows through one window sort. At 100 TB both scale;
  * the native operator halves the sorted volume and never widens rows.
  *
  * Semantics: for each left row, the LATEST right row of the same key
  * with rightTime <= leftTime (ties on time impossible when (key, time)
  * is unique; otherwise the last in (key, time, input) order wins —
  * matching `MAX(time)` oracles). Unmatched left rows emit null right
  * columns (left-outer as-of, the standard form).
  */
final case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** SQL-reachable form of the as-of join, built by the
  * `graft_asof_join('left','right','lk','rk','lt','rt')` table function
  * before its relations resolve. Key/time columns are Expression fields
  * (initially `UnresolvedAttribute`s), so the stock analyzer resolves
  * them against the children generically and — critically — they count
  * toward `references`, which keeps ColumnPruning from stripping the
  * key/time columns out of a child when the outer query doesn't project
  * them. [[AsofJoinStrategy]] then checks side membership and types at
  * planning time, failing fast with a message that lists the available
  * columns.
  */
final case class AsofJoinByName(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinByName =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      Asof.validateTypes(lk, rk, lt, rt)
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case AsofJoinByName(l, r, lkE, rkE, ltE, rtE) =>
      val lk = Asof.sideAttr(lkE, l, "left_key", "left")
      val lt = Asof.sideAttr(ltE, l, "left_time", "left")
      val rk = Asof.sideAttr(rkE, r, "right_key", "right")
      val rt = Asof.sideAttr(rtE, r, "right_time", "right")
      Asof.validateTypes(lk, rk, lt, rt)
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  // belt-and-suspenders: the strategy validates before building this
  // node, but a hand-constructed exec must fail here, at plan time, not
  // as a ClassCastException deep inside the merge loop
  Asof.validateTypes(leftKey, rightKey, leftTime, rightTime)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightArity = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(leftKey: Expression, left.output)
      val lt = BindReferences.bindReference(leftTime: Expression, left.output)
      val rk = BindReferences.bindReference(rightKey: Expression, right.output)
      val rt = BindReferences.bindReference(rightTime: Expression, right.output)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val proj = UnsafeProjection.create(output, left.output ++ right.output)

      new Iterator[InternalRow] {
        // one-row lookahead into the right side + the current best match
        private var rHead: InternalRow = _
        private var lastMatch: InternalRow = _ // copied (unsafe rows are reused)
        private var lastMatchKey: Any = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lk.eval(l)
          val t = lt.eval(l)
          if (k == null || t == null) return proj(joined(l, nullRight))
          // consume right rows that are still at-or-before (k, t);
          // each consumed same-key row supersedes the previous match
          var advancing = true
          while (advancing && (rHead != null || rIter.hasNext)) {
            if (rHead == null) rHead = rIter.next()
            val rkv = rk.eval(rHead)
            val rtv = rt.eval(rHead)
            if (rkv == null || rtv == null) rHead = null // null keys never match
            else {
              val c = keyOrd.compare(rkv, k)
              if (c < 0) rHead = null // stale key: discard, O(1) state
              else if (c == 0 && timeOrd.compare(rtv, t) <= 0) {
                lastMatch = rHead.copy(); lastMatchKey = rkv
                rHead = null
              } else advancing = false // right side is ahead of this left row
            }
          }
          val matched = lastMatch != null && keyOrd.compare(lastMatchKey, k) == 0
          proj(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }
}

/** DataFrame-level API + SQL table-valued function. Columns are
  * resolved by NAME against each side (avoids cross-side ambiguity);
  * the strategy self-registers in the session on first use, and
  * `GraftExtensions` injects it for `spark.sql.extensions`-configured
  * clusters.
  *
  * SQL surface (after `GraftFunctions.register(spark)` or via the
  * extensions class):
  * {{{
  *   SELECT * FROM graft_asof_join('purchases', 'views',
  *                                 'user_id', 'v_user', 'ts', 'v_ts')
  * }}}
  * where the first two arguments name tables/temp views and the last
  * four name the key/time columns on each side. Column arguments
  * resolve by name across BOTH inputs (the stock analyzer's generic
  * resolution), so the two sides must use distinct key/time column
  * names — alias inside a view when they clash.
  */
object Asof {
  import org.apache.spark.sql.catalyst.expressions.RowOrdering

  private[plans] def attr(p: LogicalPlan, n: String): Attribute =
    p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"as-of join: column '$n' not found in [${p.output.map(_.name).mkString(", ")}]"))

  /** An analyzer-resolved TVF argument must be a plain column reference
    * belonging to the stated side. */
  private[plans] def sideAttr(e: Expression, side: LogicalPlan,
      arg: String, sideName: String): Attribute = e match {
    case a: Attribute if side.outputSet.contains(a) => a
    case a: Attribute => throw new IllegalArgumentException(
      s"as-of join: $arg column '${a.name}' must come from the $sideName input " +
        s"[${side.output.map(_.name).mkString(", ")}]")
    case other => throw new IllegalArgumentException(
      s"as-of join: $arg must resolve to a column reference, got: $other")
  }

  /** Key types must match exactly and time types must match exactly and
    * be orderable — checked at PLAN time so a mismatch (e.g. INT keys
    * joined to BIGINT keys) fails with a clear message instead of a
    * ClassCastException inside the streaming merge.
    */
  private[plans] def validateTypes(leftKey: Attribute, rightKey: Attribute,
      leftTime: Attribute, rightTime: Attribute): Unit = {
    def fail(what: String, l: Attribute, r: Attribute): Nothing =
      throw new IllegalArgumentException(
        s"as-of join: $what types must match exactly — left '${l.name}' is " +
          s"${l.dataType.sql} but right '${r.name}' is ${r.dataType.sql}; " +
          "cast one side before joining")
    if (leftKey.dataType != rightKey.dataType) fail("key", leftKey, rightKey)
    if (leftTime.dataType != rightTime.dataType) fail("time", leftTime, rightTime)
    for (a <- Seq(leftKey, leftTime) if !RowOrdering.isOrderable(a.dataType))
      throw new IllegalArgumentException(
        s"as-of join: column '${a.name}' of type ${a.dataType.sql} is not orderable")
  }

  private[graft] def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }

  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lplan = left.queryExecution.analyzed
    val rplan = right.queryExecution.analyzed
    val (lk, lt) = (attr(lplan, leftKey), attr(lplan, leftTime))
    val (rk, rt) = (attr(rplan, rightKey), attr(rplan, rightTime))
    validateTypes(lk, rk, lt, rt)
    graftshim.ofRows(spark, AsofJoinPlan(lplan, rplan, lk, rk, lt, rt))
  }

  /** Table-function builder: 6 foldable string arguments →
    * [[AsofJoinByName]] over two [[UnresolvedRelation]]s. Registered as
    * `graft_asof_join` by `GraftFunctions.register` /`GraftExtensions`.
    */
  def sqlBuilder(es: Seq[Expression]): LogicalPlan = {
    if (es.length != 6 || es.exists(e => !e.foldable))
      throw new IllegalArgumentException(
        "graft_asof_join expects 6 string literals: " +
          "(left_table, right_table, left_key, right_key, left_time, right_time)")
    val a = es.map { e =>
      val v = e.eval()
      if (v == null) throw new IllegalArgumentException(
        "graft_asof_join: arguments must be non-null strings")
      v.toString
    }
    def rel(name: String) = org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(
      name.split('.').toSeq)
    def col(name: String) = org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(name)
    AsofJoinByName(rel(a(0)), rel(a(1)), col(a(2)), col(a(3)), col(a(4)), col(a(5)))
  }
}
