// Hosted in an org.apache.spark.sql subpackage for the private[sql]
// Dataset.ofRows bridge — the standard placement for whole-operator
// SparkSessionExtensions addons (logical node + rule + strategy + exec).
package org.apache.spark.sql.graftext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Attribute, Cast, Expression, JoinedRow, PredicateHelper, SortOrder, UnixDate, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Backward as-of join: for every left row, attach the single right row with
  * the same key and the greatest right time ≤ the left time (left-outer —
  * unmatched left rows null-extend). The operator Spark genuinely lacks:
  * the composable forms are either a union + window `last(ignoreNulls)`
  * trick (same-schema sides only, double sort) or a non-equi join + rank
  * (quadratic fan-out per key). This node is the 100 TB shape: both sides
  * hash-cluster on the key, sort within partitions by (key, time), and one
  * streaming merge pass emits each left row exactly once — shuffle volume
  * is one pass over each input, state is a single buffered right row.
  *
  * Reference semantics: `exper_sql.py` answers "latest view before each
  * purchase" with exactly this backward-as-of shape (see
  * [[graft.operators.EventOps.asofViewBeforePurchase]] for the windowed
  * composition kept as the oracle baseline).
  */
/** Match direction: which side of the left time qualifying right rows sit
  * on. `Backward` (the default, and the only form most engines ship) takes
  * the greatest right time ≤ left time; `Forward` the least right time ≥
  * left time; `Nearest` whichever of the two is closer, ties resolved
  * backward (the earlier row) so results stay deterministic.
  */
sealed trait AsofDirection extends Serializable
object AsofDirection {
  case object Backward extends AsofDirection
  case object Forward extends AsofDirection
  case object Nearest extends AsofDirection
  def parse(s: String): AsofDirection = s.toLowerCase match {
    case "backward" => Backward
    case "forward"  => Forward
    case "nearest"  => Nearest
    case other => throw new IllegalArgumentException(
      s"asof direction must be backward|forward|nearest, got '$other'")
  }
}

case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: AsofDirection = AsofDirection.Backward,
    tolerance: Long = -1L) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Left-side filter pushdown through [[AsofJoinPlan]]. Catalyst's built-in
  * pushdown rules don't know custom nodes, so `Filter(pred, AsofJoin)`
  * would otherwise evaluate after the shuffle+merge. Predicates that only
  * reference left output commute with the join (dropping a left row never
  * changes another row's match); right-side predicates do NOT (they can
  * change which right row is "latest") and stay put.
  */
object PushFilterThroughAsofJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoinPlan) =>
      val (pushable, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, dir, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol) :: Nil
    case _ => Nil
  }
}

/** Physical merge as-of. `requiredChildDistribution` makes EnsureRequirements
  * co-partition both sides on the key (AQE-compatible exchanges);
  * `requiredChildOrdering` gets each partition sorted by (key, time); the
  * merge then walks both sorted streams once, remembering only the latest
  * qualifying right row. Join keys/times are physically 64-bit (long,
  * timestamp-micros; ints/dates are cast by the API), so comparisons are
  * primitive.
  */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: AsofDirection = AsofDirection.Backward,
    tolerance: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  // each partition's left rows stream through in their sorted order
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey; val lTimeExpr = leftTime
    val rKeyExpr = rightKey; val rTimeExpr = rightTime
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, time) extracted through a tiny projection per side; both are
      // physically long (nanos already truncated to micros upstream)
      val lkProj = UnsafeProjection.create(Seq(lKeyExpr, lTimeExpr), lOut)
      val rkProj = UnsafeProjection.create(Seq(rKeyExpr, rTimeExpr), rOut)
      val result = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = InternalRow.fromSeq(Seq.fill[Any](rOut.length)(null))

      // single-row right-side lookahead
      var rHead: InternalRow = null
      var rKeyNull = false; var rTimeNull = false
      var rKey = 0L; var rTime = 0L
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rHead = rIter.next()
          val k = rkProj(rHead)
          rKeyNull = k.isNullAt(0); rTimeNull = k.isNullAt(1)
          rKey = if (rKeyNull) 0L else k.getLong(0)
          rTime = if (rTimeNull) 0L else k.getLong(1)
        } else rHead = null
      advanceRight()

      // latest consumed same-key right row — the backward candidate; the
      // un-consumed lookahead `rHead` (first same-key row with time >
      // lTime) doubles as the forward candidate
      var matchRow: InternalRow = null
      var matchKey = 0L
      var matchTime = 0L
      var hasMatch = false
      val dir = direction
      val tol = tolerance

      lIter.map { lRow =>
        val k = lkProj(lRow)
        val lKeyNull = k.isNullAt(0); val lTimeNull = k.isNullAt(1)
        if (!lKeyNull) {
          val lKey = k.getLong(0); val lTime = k.getLong(1)
          // consume right rows that can never match a later left row:
          // null keys / null times sort first, smaller keys are passed,
          // and same-key rows with time ≤ lTime become the newest backward
          // candidate (left is also time-sorted, so the pointer never backs
          // up; forward rows stay un-consumed — a later left row may need
          // the same one)
          var advance = true
          while (advance && rHead != null) {
            if (rKeyNull || rKey < lKey || (rKey == lKey && rTimeNull)) advanceRight()
            else if (rKey == lKey && !lTimeNull && rTime <= lTime) {
              matchRow = rHead.copy(); matchKey = rKey; matchTime = rTime
              hasMatch = true
              advanceRight()
            } else advance = false
          }
          // distances are non-negative by construction; tolerance < 0 = none
          val bOk = hasMatch && matchKey == lKey && !lTimeNull &&
            (tol < 0L || lTime - matchTime <= tol)
          val fOk = rHead != null && !rKeyNull && rKey == lKey && !lTimeNull &&
            (tol < 0L || rTime - lTime <= tol)
          val chosen: InternalRow = dir match {
            case AsofDirection.Backward => if (bOk) matchRow else null
            case AsofDirection.Forward  =>
              // a consumed equal-time row is a distance-0 forward match
              if (bOk && matchTime == lTime) matchRow
              else if (fOk) rHead else null
            case AsofDirection.Nearest  =>
              if (bOk && fOk) {
                if (lTime - matchTime <= rTime - lTime) matchRow else rHead
              } else if (bOk) matchRow
              else if (fOk) rHead
              else null
          }
          if (chosen != null) joined(lRow, chosen) else joined(lRow, nullRight)
        } else joined(lRow, nullRight)
        numOutputRows += 1
        result(joined)
      }
    }
  }
}

/** DataFrame-level API + session registration. */
object AsofJoin {

  /** Register the strategy + optimizer rule on a live session (idempotent);
    * [[GraftExtensions]] does the same for `spark.sql.extensions` configs.
    */
  def ensureRegistered(spark: classic.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsofJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsofJoin
  }

  /** `left ASOF LEFT JOIN right ON left.key = right.key AND
    * right.time <= left.time` picking the greatest qualifying right time.
    * Key/time columns are resolved by name per side; int/date narrow types
    * widen to long so the merge compares primitives. The right side is
    * re-aliased so self-joins (both sides off one scan) keep distinct
    * attribute ids.
    *
    * `direction` selects which side of the left time qualifies:
    * `backward` (greatest right time ≤ left time — the default), `forward`
    * (least right time ≥ left time), or `nearest` (the closer of the two;
    * an exact distance tie resolves backward). `tolerance` (< 0 = none)
    * bounds the absolute time distance of a match, expressed in the
    * *widened* unit of the time columns — epoch micros for timestamps/
    * longs, days for dates. Among several right rows at the identical
    * qualifying time the matched row's non-time payload is whichever the
    * sort delivered — callers needing a deterministic payload should
    * pre-aggregate equal-time right rows.
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String,
           direction: String = "backward",
           tolerance: Long = -1L): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[classic.SparkSession]
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    val rPlan = Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"asof column '$name' not found among ${out.map(_.name).mkString(", ")}"))
    def widen(e: Attribute): Expression = e.dataType match {
      // TIMESTAMP and TIMESTAMP_NTZ are both physically epoch-ordered
      // micros longs — directly merge-comparable
      case LongType | TimestampType | TimestampNTZType => e
      case IntegerType              => Cast(e, LongType)
      // date→numeric casts fail analysis since Spark 3.0; UnixDate reads
      // the physical day count (monotonic, which is all the merge needs)
      case DateType                 => Cast(UnixDate(e), LongType)
      case t => throw new IllegalArgumentException(
        s"asof key/time must be long-comparable, got $t for ${e.name}")
    }
    // A Date column widens to *days* while a Timestamp widens to *epoch
    // micros*; pairing them would analyze fine but compare incompatible
    // units and silently match garbage. Date→Timestamp promotion is also
    // not done implicitly — midnight is timezone-dependent, so the caller
    // must cast explicitly and own that choice. Same rule for
    // TIMESTAMP vs TIMESTAMP_NTZ: local-wall-time micros only equal
    // UTC-instant micros in a UTC session, so mixing them must be an
    // explicit caller cast, not a silent reinterpretation.
    def widenPair(a: Attribute, b: Attribute): (Expression, Expression) = {
      val types = Set(a.dataType, b.dataType)
      val timeish = Set[org.apache.spark.sql.types.DataType](
        DateType, TimestampType, TimestampNTZType)
      if (types.size == 2 && types.subsetOf(timeish))
        throw new IllegalArgumentException(
          s"asof columns '${a.name}' (${a.dataType.simpleString}) and '${b.name}' " +
          s"(${b.dataType.simpleString}) mix distinct time types, which widen to " +
          "different units or epochs (days vs local vs UTC micros); cast one side " +
          "explicitly")
      (widen(a), widen(b))
    }
    val (lKey, rKey) = widenPair(attr(lPlan.output, leftKey), attr(rPlan.output, rightKey))
    val (lTime, rTime) = widenPair(attr(lPlan.output, leftTime), attr(rPlan.output, rightTime))
    classic.Dataset.ofRows(spark, AsofJoinPlan(lPlan, rPlan, lKey, rKey, lTime, rTime,
      AsofDirection.parse(direction), tolerance))
  }
}
