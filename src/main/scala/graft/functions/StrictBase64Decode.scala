package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Speculative strict base64 decode: if the input is *canonical* base64
  * (charset + mandatory padding + length % 4 == 0), decode it and return the
  * decoded bytes as a UTF-8 string; otherwise return the input unchanged.
  *
  * Reproduces the reference's per-text-column behavior (reference
  * `main.go:136-146`): Go's `base64.StdEncoding.DecodeString` requires
  * canonical padding, so the ambiguity class is exactly
  * "length ≡ 0 (mod 4) over the base64 alphabet with valid padding".
  * Spark's built-in `unbase64` is lax (accepts unpadded input and skips
  * whitespace), hence this custom, codegen-capable expression
  * (SURVEY.md §2.3 hazard H1).
  */
case class StrictBase64Decode(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    StrictBase64.decodeOrPassthrough(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StrictBase64.decodeOrPassthrough($c)")

  override protected def withNewChildInternal(newChild: Expression): StrictBase64Decode =
    copy(child = newChild)

  override def prettyName: String = "strict_base64_decode"
}

object StrictBase64 {
  // Canonical std-base64: 4-char blocks, '=' padding only in the last block.
  // Matches what Go's base64.StdEncoding.DecodeString accepts (it does not
  // verify that unused trailing bits are zero, and neither does
  // java.util.Base64 — same lenience on both sides).
  private val CanonicalB64 =
    "^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{4})$".r

  /** Static entry point shared by interpreted eval and generated code. */
  def decodeOrPassthrough(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.isEmpty) return s // Go decodes "" to "" — identity either way
    if (str.length % 4 != 0 || !CanonicalB64.matches(str)) return s
    try {
      val bytes = java.util.Base64.getDecoder.decode(str)
      // Go casts raw bytes to string; on JSON marshal invalid UTF-8 becomes
      // U+FFFD — java's REPLACE-on-malformed decode gives the same output.
      val cs = java.nio.charset.StandardCharsets.UTF_8
        .newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      UTF8String.fromString(cs.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    } catch {
      case _: IllegalArgumentException => s
    }
  }

  /** Column-level API. */
  def strict_base64_decode(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      StrictBase64Decode(org.apache.spark.sql.GraftColumnBridge.toExpression(c)))
}
