package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 32 Poisson-bootstrap replicate weights of one row, in a single
  * codegen'd expression.
  *
  * Semantics are bit-identical to the portable SQL device used since r12
  * (and still used verbatim by the DuckDB oracle): the row's digest is
  * `md5("boot:<id>:0") || md5("boot:<id>:1")` (64 lowercase hex chars);
  * replicate b (1-based) reads hex chars (2b−1, 2b) — i.e. unsigned BYTE
  * b−1 of the 32 raw digest bytes — uniform on 0..255, and maps it through
  * the quantized-Poisson(1) inverse CDF (94/94/47/16/5 of 256 ≈
  * e⁻¹/e⁻¹/e⁻¹2/…, mean 1.004).
  *
  * Why an expression and not the compositional form: the built-in pipeline
  * (2× md5 → 64-char hex string → 32× conv(substring)) costs a hex
  * materialization plus 32 general base-conversions per row — measured
  * ~1.6× the whole rest of the query at sf0.1. Here the digest bytes ARE
  * the uniforms (no hex round-trip anywhere), the MD5 instance is
  * thread-local, and the 256-entry inverse-CDF table is a static array —
  * one tight loop per row feeding an UnsafeArrayData of 32 longs.
  */
case class BootstrapWeights(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bootstrap_weights requires string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    BootstrapWeights.weights(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BootstrapWeights.weights($c)")

  override protected def withNewChildInternal(newChild: Expression): BootstrapWeights =
    copy(child = newChild)

  override def prettyName: String = "bootstrap_weights"
}

object BootstrapWeights {

  /** Quantized-Poisson(1) inverse CDF over one uniform byte. */
  private val Table: Array[Long] = {
    val t = new Array[Long](256)
    var u = 0
    while (u < 256) {
      t(u) = if (u < 94) 0L else if (u < 188) 1L else if (u < 235) 2L
             else if (u < 251) 3L else 4L
      u += 1
    }
    t
  }

  private val Prefix = "boot:".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val Salt0 = ":0".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val Salt1 = ":1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private val Md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def weights(id: UTF8String): UnsafeArrayData = {
    val md = Md.get()
    val idBytes = id.getBytes
    md.reset(); md.update(Prefix); md.update(idBytes); md.update(Salt0)
    val d0 = md.digest()
    md.reset(); md.update(Prefix); md.update(idBytes); md.update(Salt1)
    val d1 = md.digest()
    val out = new Array[Long](32)
    var i = 0
    while (i < 16) {
      out(i) = Table(d0(i) & 0xff)
      out(16 + i) = Table(d1(i) & 0xff)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-level API. */
  def bootstrap_weights(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      BootstrapWeights(org.apache.spark.sql.GraftColumnBridge.toExpression(c)))
}
