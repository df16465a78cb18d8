// In org.apache.spark.sql because the bloom expressions are catalyst-internal
// and the Expression/Column bridge (ExpressionUtils) is private[sql].
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column API over Spark's internal bloom-filter expressions — the same
  * machinery Catalyst's runtime row-level filtering injects
  * (`InjectRuntimeFilter`), exposed for *declared* semi-join prefilters
  * where the planner can't infer one (e.g. decontamination against an
  * eval-set too large to broadcast exactly: the sketch is compact and
  * `might_contain` admits no false negatives, so a bloom prefilter + exact
  * verify is result-identical to the exact join).
  *
  * Values must be `LongType` (hash keys first — `xxhash64` — exactly like
  * the planner's own usage).
  */
object BloomFns {

  /** Aggregate a long column into a serialized bloom filter (binary). */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        ExpressionUtils.expression(c),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a [[bloomAgg]] sketch: false ⇒ definitely
    * absent; true ⇒ verify exactly.
    */
  def mightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        ExpressionUtils.expression(bloom),
        ExpressionUtils.expression(value)))

  /** A one-row DataFrame as a scalar-subquery expression — `might_contain`
    * requires its sketch to be a constant or scalar subquery (the same
    * shape `InjectRuntimeFilter` plants), so the sketch never rides a join
    * and never materializes on the driver.
    */
  def scalar(df: org.apache.spark.sql.DataFrame): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        df.queryExecution.analyzed))
}
