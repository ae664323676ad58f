package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a whitespace-tokenized text column in one codegen
  * pass: `["t0 t1 t2", "t1 t2 t3", …]`, with the reference's short-document
  * fallback (fewer than `n` tokens ⇒ `[text]`) and optional first-occurrence
  * dedup.
  *
  * Exactly reproduces the builtin-HOF formulation it replaces
  * (`transform(sequence(1, size-(n-1)), i -> array_join(slice(tokens, i, n),
  * ' '))` over `split(text, ' ')`, see
  * [[graft.ops.TextAnalysis.shinglesOfTokens]]) — same treatment of empty
  * tokens from repeated spaces, same fallback — but as a single linear scan.
  * The HOF form evaluates an interpreted lambda per shingle (a `slice` +
  * `array_join` allocation each) AND blocks whole-stage codegen for its
  * stage; shingling feeds every MinHash / LSH-banding / Jaccard /
  * fingerprint pipeline, so on a 100 TB corpus scan this is a hot map-side
  * loop.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextShingleUtil.shingles(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TextShingleUtil.shingles($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextShingleUtil {

  /** One pass: split on single spaces (keeping empty tokens, like
    * `split(text, ' ')` with its default -1 limit), emit the n-gram windows
    * (or `[text]` when fewer than n tokens), optionally deduped keeping
    * first occurrence.
    */
  def shingles(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val s = text.toString
    // manual single-char split keeping leading/trailing empties — identical
    // to the regex split on " " the HOF form used, without the regex engine
    val toks = new java.util.ArrayList[String](64)
    var start = 0
    var i = s.indexOf(' ')
    while (i >= 0) {
      toks.add(s.substring(start, i))
      start = i + 1
      i = s.indexOf(' ', start)
    }
    toks.add(s.substring(start))
    val m = toks.size()
    if (m < n) return new GenericArrayData(Array[Any](text))
    val count = m - n + 1
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < count) {
      sb.setLength(0)
      var w = 0
      while (w < n) {
        if (w > 0) sb.append(' ')
        sb.append(toks.get(j + w))
        w += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    if (!distinct) return new GenericArrayData(out)
    val seen = new java.util.LinkedHashSet[Any](count * 2)
    var k = 0
    while (k < count) { seen.add(out(k)); k += 1 }
    if (seen.size() == count) new GenericArrayData(out)
    else new GenericArrayData(seen.toArray)
  }
}

object TextExpressions {
  /** Column API for [[WordShingles]]. */
  def wordShingles(text: Column, n: Int, distinct: Boolean = false): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(text), n, distinct))
}
