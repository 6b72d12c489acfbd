package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** The engine's §7.3(c) layer demonstrated end-to-end: a WHOLE-OPERATOR
  * backward as-of join as a custom Catalyst logical node +
  * [[SparkStrategy]] + physical [[AsofJoinExec]], registered through
  * `SparkSessionExtensions.injectPlannerStrategy` — the layer below
  * custom expressions (graft_dot) and typed aggregates (TopKAgg),
  * reserved for semantics no composition can express as ONE operator.
  *
  * The composition ([[graft.operators.AsofJoin.asofBackward]], q63's
  * union + last-ignoreNulls window) remains the DEFAULT — it is
  * AQE-friendly, null-transparent and column-general. This node exists
  * to prove the layer and to hold the as-of's minimal physical form:
  * EnsureRequirements gives both children one hash shuffle on the key
  * and a per-partition (key, time) sort, and the exec is then a single
  * zipPartitions MERGE pass — no union row inflation, no window-state
  * machinery, strictly linear after the sort. Same shuffle count as
  * the composition; less per-row work. q183 gates it against q63's
  * oracle, and the spec pins row-identity against the composition on
  * adversarial data (ties, empty sides, key gaps).
  *
  * Contract (narrower than the composition, by design): single LONG
  * key and LONG time on both sides; right unique per (key, time); a
  * NULL key or time never matches (SQL join semantics — the
  * composition's window groups nulls instead). Tie rule pinned as
  * everywhere else: right.time <= left.time matches.
  *
  * Distribution requirement carries `requiredNumPartitions`, so
  * EnsureRequirements plans BOTH shuffles at exactly that count and
  * AQE's partition coalescing cannot desynchronize the zip.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, lt, rk, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  private def numParts: Int = conf.numShufflePartitions

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = Some(numParts)),
    ClusteredDistribution(Seq(rightKey), requiredNumPartitions = Some(numParts)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of key/time attributes must come from the respective child")
    val nRight = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // current best candidate: the LAST right row seen with
      // (key == candKey, time <= the left time that advanced past it)
      var cand: InternalRow = null
      var candKey = 0L
      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      def advanceRight(lk: Long, lt: Long): Unit = {
        var going = true
        while (going && rNext != null) {
          val skip = rNext.isNullAt(rkOrd) || rNext.isNullAt(rtOrd)
          if (skip) {
            rNext = if (rIter.hasNext) rIter.next() else null
          } else {
            val rk = rNext.getLong(rkOrd)
            val rt = rNext.getLong(rtOrd)
            if (rk < lk || (rk == lk && rt <= lt)) {
              if (rk == lk) { cand = rNext.copy(); candKey = rk }
              rNext = if (rIter.hasNext) rIter.next() else null
            } else going = false
          }
        }
      }
      lIter.map { l =>
        if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) {
          proj(joined(l, nullRight))
        } else {
          val lk = l.getLong(lkOrd)
          val lt = l.getLong(ltOrd)
          advanceRight(lk, lt)
          if (cand != null && candKey == lk) proj(joined(l, cand))
          else proj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over [[AsofJoinNode]]. Right columns must not
  * collide with left columns by name (rename upstream) — the node
  * passes both sides' attributes through unchanged. */
object AsofNative {
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute = {
      val a = p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(",")}"))
      require(a.dataType == LongType,
        s"native as-of requires LONG $name, got ${a.dataType}")
      a
    }
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "native as-of requires disjoint column names; rename upstream")
    GraftPlanBridge.ofRows(spark,
      AsofJoinNode(lp, rp, attr(lp, leftKey), attr(lp, leftTime),
        attr(rp, rightKey), attr(rp, rightTime)))
  }
}
