package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column faces for Spark's internal Bloom-filter sketch pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime row-group filters, not exposed in `functions._` or the
  * SQL registry). Same bridge-package rationale as the codegen expressions:
  * the types are public but live behind `private[sql]` construction
  * helpers. Keys are hashed with `xxhash64` (the aggregate's expected
  * input form).
  */
object SketchExpressions {

  /** Aggregate a key column into a serialized Bloom filter (binary). */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(key))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a [[bloomAgg]] sketch: false ⇒ definitely
    * absent; true ⇒ present or false positive. `might_contain` requires
    * its sketch operand to be constant-foldable or a scalar subquery, so
    * the sketch relation is wired in as the latter (exactly how Spark's own
    * `InjectRuntimeFilter` plans it) — no driver-side collect of the bits.
    */
  def mightContain(bloomRelation: org.apache.spark.sql.Dataset[_], key: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          bloomRelation.queryExecution.analyzed),
        new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
