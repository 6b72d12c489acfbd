package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Second whole-operator proof of the §7.3(c) layer (beside
  * [[AsofJoinNode]]): the banded range join `|left.time − right.time|
  * ≤ gap` per key as ONE physical operator — a sorted MERGE with a
  * sliding right-side band buffer, instead of the composition's
  * 3×-explode + equi-join + filter ([[graft.operators.RangeJoin]]).
  *
  * The composition stays the DEFAULT (AQE-friendly, multi-key,
  * column-general); this node holds the operator's minimal physical
  * form: EnsureRequirements gives both children one hash shuffle on
  * the key and a per-partition (key, time) sort, and the exec streams
  * the left side once while maintaining the right rows inside
  * [lt − gap, lt + gap] — memory bounded by the band occupancy (the
  * true output-bound working set), no row inflation, no post-filter.
  * q323 gates it against q66's oracle; the spec pins row-identity
  * against the composition on adversarial data.
  *
  * Contract (narrower than the composition, by design): single LONG
  * key and LONG time on both sides, disjoint column names, INNER
  * semantics — a NULL key or time on either side never matches.
  * Distribution carries `requiredNumPartitions` so AQE coalescing
  * cannot desynchronize the zip (the as-of lesson). */
case class BandJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute, gap: Long)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): BandJoinNode =
    copy(left = newLeft, right = newRight)
}

object BandStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandJoinNode(l, r, lk, lt, rk, rt, gap) =>
      BandJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, gap) :: Nil
    case _ => Nil
  }
}

case class BandJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute, gap: Long)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

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
      "band-join key/time attributes must come from the respective child")
    val g = gap
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      // right rows of the CURRENT left key whose time may still fall
      // inside a future left row's band; sorted by time (right's sort)
      val buf = new java.util.ArrayDeque[InternalRow]()
      var bufKey = Long.MinValue
      var haveBufKey = false
      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      def pull(lk: Long, lt: Long): Unit = {
        var going = true
        while (going && rNext != null) {
          if (rNext.isNullAt(rkOrd) || rNext.isNullAt(rtOrd)) {
            rNext = if (rIter.hasNext) rIter.next() else null
          } else {
            val rk = rNext.getLong(rkOrd)
            val rt = rNext.getLong(rtOrd)
            if (rk < lk) {
              rNext = if (rIter.hasNext) rIter.next() else null
            } else if (rk == lk && rt <= lt + g) {
              buf.addLast(rNext.copy())
              rNext = if (rIter.hasNext) rIter.next() else null
            } else going = false
          }
        }
      }
      lIter.flatMap { l =>
        if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) Iterator.empty
        else {
          val lk = l.getLong(lkOrd)
          val lt = l.getLong(ltOrd)
          if (!haveBufKey || bufKey != lk) {
            buf.clear(); bufKey = lk; haveBufKey = true
          }
          pull(lk, lt)
          // band lower edge: left times are nondecreasing within the
          // key, so rows before lt - gap can never match again
          while (!buf.isEmpty && buf.peekFirst.getLong(rtOrd) < lt - g)
            buf.removeFirst()
          val lCopy = l.copy()
          val it = buf.iterator()
          new Iterator[InternalRow] {
            override def hasNext: Boolean = it.hasNext
            override def next(): InternalRow =
              proj(joined(lCopy, it.next()))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over [[BandJoinNode]]. Column names must be
  * disjoint across sides (rename upstream). */
object RangeNative {
  def bandJoin(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String, gap: Long): DataFrame = {
    require(gap > 0, "gap must be positive")
    val spark = left.sparkSession
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute = {
      val a = p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(",")}"))
      require(a.dataType == LongType,
        s"native band join requires LONG $name, got ${a.dataType}")
      a
    }
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "native band join requires disjoint column names; rename upstream")
    GraftPlanBridge.ofRows(spark,
      BandJoinNode(lp, rp, attr(lp, leftKey), attr(lp, leftTime),
        attr(rp, rightKey), attr(rp, rightTime), gap))
  }
}
