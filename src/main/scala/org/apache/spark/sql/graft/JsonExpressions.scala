package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JSON "partition" for the reference's leftover-field fold
  * (F9/F10, reference db.py:269-270,878-879): given a JSON object string and
  * an ordered list of `known` keys, return
  * `array(value(known₀), …, value(knownₙ₋₁), additional_info)` where
  * `additional_info` is the canonical encoding of every *other* field —
  * keys sorted, `{"k":"v",…}` minimal punctuation, values re-encoded as JSON
  * strings (the same canonical form [[graft.ops.Scalars.additionalInfoFromMap]]
  * documents; that HOF formulation is kept as the reference semantics spec).
  *
  * Why an expression: the HOF chain (`from_json` → `map_filter` →
  * `array_sort(map_keys)` → `transform` → `array_join`) evaluates interpreted
  * lambda frames per key per row and re-walks the map repeatedly; at
  * 100 TB the encode is a pure map-side pass, so per-row constant factors are
  * the entire cost. This expression parses the object once and emits every
  * output in that single pass, staying inside whole-stage codegen (the
  * generated code calls one static routine — no interpreted fallback).
  *
  * Scalar-value stringification matches `from_json(… map<string,string>)`:
  * string tokens unescape to their content, numeric/bool tokens keep their
  * literal text, nested objects/arrays keep their source text minus
  * insignificant whitespace (the minified shape the `from_json` twin
  * produces). Escape sequences and number literals inside nested values
  * pass through as written — Jackson's re-encoding of `\u`-escapes or
  * exotic number forms is out of the pinned-parity contract, which the
  * reference's flat scalar records never exercise. JSON-null valued
  * fields are dropped from the leftover encoding (the HOF form's
  * null-element `array_join` skip). Malformed input → null, like `from_json`.
  * Duplicate keys: last wins.
  */
case class JsonPartitionEncode(child: Expression, known: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  // malformed JSON yields null even when the child is non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "json_partition_encode"

  @transient private lazy val knownArr: Array[String] = known.toArray

  override def nullSafeEval(input: Any): Any =
    JsonEncodeUtil.encode(input.asInstanceOf[UTF8String], knownArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("known", knownArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.JsonEncodeUtil.encode($c, $ref);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The parse/encode routine behind [[JsonPartitionEncode]] — one linear scan,
  * no Jackson allocation churn, called from generated code.
  */
object JsonEncodeUtil {

  private object Malformed extends Exception with scala.util.control.NoStackTrace

  /** Code-point order == UTF-8 binary order == the `UTF8String` comparison
    * Spark's `array_sort` applies in the HOF twin.
    */
  private[graft] val codePointOrder: java.util.Comparator[String] =
    new java.util.Comparator[String] {
      override def compare(a: String, b: String): Int = {
        val la = a.length; val lb = b.length
        var i = 0
        while (i < la && i < lb) {
          val ca = a.codePointAt(i); val cb = b.codePointAt(i)
          if (ca != cb) return Integer.compare(ca, cb)
          i += Character.charCount(ca)
        }
        Integer.compare(la - i, lb - i)
      }
    }

  /** @return array of (known values ++ canonical leftover JSON), or null on
    *         malformed input.
    */
  def encode(json: UTF8String, known: Array[String]): GenericArrayData =
    try {
      val s = json.toString
      val n = s.length
      var i = 0

      def ws(): Unit = { while (i < n && s.charAt(i) <= ' ') i += 1 }
      def expect(c: Char): Unit = {
        if (i >= n || s.charAt(i) != c) throw Malformed
        i += 1
      }
      // at an opening quote: JSON string content, unescaped
      def str(): String = {
        expect('"')
        var sb: java.lang.StringBuilder = null // allocate only if escapes seen
        val start = i
        while (i < n) {
          val c = s.charAt(i)
          if (c == '"') {
            val out = if (sb == null) s.substring(start, i) else sb.toString
            i += 1
            return out
          } else if (c == '\\') {
            if (sb == null) sb = new java.lang.StringBuilder(i - start + 16).append(s, start, i)
            i += 1
            if (i >= n) throw Malformed
            s.charAt(i) match {
              case '"'  => sb.append('"')
              case '\\' => sb.append('\\')
              case '/'  => sb.append('/')
              case 'n'  => sb.append('\n')
              case 't'  => sb.append('\t')
              case 'r'  => sb.append('\r')
              case 'b'  => sb.append('\b')
              case 'f'  => sb.append('\f')
              case 'u' =>
                if (i + 4 >= n) throw Malformed
                sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
                i += 4
              case _ => throw Malformed
            }
            i += 1
          } else {
            if (sb != null) sb.append(c)
            i += 1
          }
        }
        throw Malformed
      }
      // at a value start that is not a string: raw literal / nested structure
      def rawValue(): String = {
        val start = i
        val c = s.charAt(i)
        if (c == '{' || c == '[') {
          // balance-scan, string-aware; copied with insignificant whitespace
          // dropped so nested values match the minified form the from_json
          // HOF twin produces (escape sequences and number text pass through
          // as written — see the contract note on the class scaladoc)
          val out = new java.lang.StringBuilder(16)
          var depth = 0
          while (i < n) {
            val ch = s.charAt(i)
            ch match {
              case '{' | '[' => depth += 1; out.append(ch); i += 1
              case '}' | ']' =>
                depth -= 1; out.append(ch); i += 1
                if (depth == 0) return out.toString
              case '"' =>
                val st = i; str(); out.append(s, st, i)
              case w if w <= ' ' => i += 1
              case _ => out.append(ch); i += 1
            }
          }
          throw Malformed
        } else { // number / true / false / null literal
          while (i < n && { val c = s.charAt(i); c != ',' && c != '}' && c != ']' && c > ' ' }) i += 1
          if (i == start) throw Malformed
          s.substring(start, i)
        }
      }

      val keys = new java.util.ArrayList[String](8)
      val vals = new java.util.ArrayList[String](8)
      ws(); expect('{'); ws()
      if (i < n && s.charAt(i) == '}') i += 1
      else {
        var more = true
        while (more) {
          val k = str()
          ws(); expect(':'); ws()
          if (i >= n) throw Malformed
          val v =
            if (s.charAt(i) == '"') str()
            else if (s.startsWith("null", i)) { i += 4; null }
            else rawValue()
          val dup = keys.indexOf(k) // last-wins duplicate policy
          if (dup >= 0) vals.set(dup, v) else { keys.add(k); vals.add(v) }
          ws()
          if (i < n && s.charAt(i) == ',') { i += 1; ws() }
          else { expect('}'); more = false }
        }
      }
      ws()
      if (i != n) throw Malformed

      val out = new Array[Any](known.length + 1)
      var ki = 0
      while (ki < known.length) {
        val at = keys.indexOf(known(ki))
        if (at >= 0 && vals.get(at) != null) out(ki) = UTF8String.fromString(vals.get(at))
        ki += 1
      }
      // leftover keys: not in known, non-null value, sorted
      val left = new java.util.ArrayList[String](keys.size())
      var j = 0
      while (j < keys.size()) {
        val k = keys.get(j)
        var isKnown = false
        var ki2 = 0
        while (ki2 < known.length && !isKnown) { isKnown = known(ki2) == k; ki2 += 1 }
        if (!isKnown && vals.get(j) != null) left.add(k)
        j += 1
      }
      // code-point order (== UTF-8 binary order), matching the UTF8String
      // comparison array_sort uses in the HOF twin; String.compareTo would
      // order supplementary-plane keys by UTF-16 code unit instead
      left.sort(JsonEncodeUtil.codePointOrder)
      val sb = new java.lang.StringBuilder(64)
      sb.append('{')
      var li = 0
      while (li < left.size()) {
        if (li > 0) sb.append(',')
        val k = left.get(li)
        sb.append('"').append(k).append("\":\"").append(vals.get(keys.indexOf(k))).append('"')
        li += 1
      }
      sb.append('}')
      out(known.length) = UTF8String.fromString(sb.toString)
      new GenericArrayData(out)
    } catch {
      case Malformed => null
      case _: NumberFormatException => null
    }
}

object JsonExpressions {
  /** Column API for [[JsonPartitionEncode]]. */
  def jsonPartitionEncode(json: Column, known: Seq[String]): Column =
    ExpressionUtils.column(JsonPartitionEncode(ExpressionUtils.expression(json), known))
}
