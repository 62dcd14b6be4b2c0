package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated Java — the
  * generated code calls these directly, so the whole projection stays
  * inside whole-stage codegen with no UDF serialization/row-conversion
  * overhead. */
object HexKernels {
  /** "0x…" (odd length ok) → bytes. */
  def decode(s: UTF8String): Array[Byte] = graft.evm.Hex.decode(s.toString)

  def decodeLong(s: UTF8String): Long = graft.evm.Hex.decodeLong(s.toString)

  def encode(b: Array[Byte]): UTF8String =
    UTF8String.fromString(graft.evm.Hex.encode(b))

  def encodeQuantity(n: Long): UTF8String =
    UTF8String.fromString(graft.evm.Hex.encodeQuantity(n))

  /** "0x…" quantity (≤256 bits) → canonical 32-byte big-endian binary
    * (the UInt256 form — see U256.scala for why binary compares work). */
  def decodeU256(s: UTF8String): Array[Byte] = {
    val raw = graft.evm.Hex.decode(s.toString)
    val src = raw.dropWhile(_ == 0)
    if (src.length > 32)
      throw new IllegalArgumentException(s"quantity exceeds 256 bits: $s")
    val out = new Array[Byte](32)
    System.arraycopy(src, 0, out, 32 - src.length, src.length)
    out
  }

  /** canonical 32-byte binary → exact decimal string. */
  def u256Str(b: Array[Byte]): UTF8String =
    UTF8String.fromString(BigInt(1, b).toString)
}

/** Native Catalyst expressions for the EVM hex codec — the codegen'd
  * fast path for the reference's highest-frequency UDFs (46+57 call
  * sites of evm_hex_decode/_int, SURVEY.md §2.D). The UDF registrations
  * in EvmFunctions remain the semantic reference; these are the hot-path
  * equivalents (same underlying Hex kernel, so behavior is identical).
  */
case class EvmHexDecodeExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "evm_hex_decode"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"evm_hex_decode expects STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    HexKernels.decode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexKernels.decode($c)")
  override protected def withNewChildInternal(newChild: Expression): EvmHexDecodeExpr =
    copy(child = newChild)
}

case class EvmHexDecodeLongExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "evm_hex_decode_int"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"evm_hex_decode_int expects STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    HexKernels.decodeLong(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexKernels.decodeLong($c)")
  override protected def withNewChildInternal(newChild: Expression): EvmHexDecodeLongExpr =
    copy(child = newChild)
}

case class EvmHexEncodeExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "evm_hex_encode"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"evm_hex_encode expects BINARY, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    HexKernels.encode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexKernels.encode($c)")
  override protected def withNewChildInternal(newChild: Expression): EvmHexEncodeExpr =
    copy(child = newChild)
}

case class EvmHexEncodeQuantityExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "evm_hex_encode_int"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"evm_hex_encode_int expects BIGINT, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    HexKernels.encodeQuantity(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexKernels.encodeQuantity($c)")
  override protected def withNewChildInternal(newChild: Expression): EvmHexEncodeQuantityExpr =
    copy(child = newChild)
}

/** UInt256 decode — the canonical-form counterpart of evm_hex_decode_int
  * for quantities that exceed 64 bits (tx value, gas_price, difficulty…).
  * Output is fixed 32-byte big-endian BinaryType (numeric-ordered under
  * Spark's unsigned-lexicographic binary compare; see U256.scala). */
case class EvmHexDecodeU256Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "evm_hex_decode_u256"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"evm_hex_decode_u256 expects STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    HexKernels.decodeU256(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexKernels.decodeU256($c)")
  override protected def withNewChildInternal(newChild: Expression): EvmHexDecodeU256Expr =
    copy(child = newChild)
}

/** Exact decimal string of a canonical U256 — the driver-stable (and
  * JSON wire) rendering; use in driver-facing projections instead of any
  * DecimalType cast (DECIMAL output is not canonicalized stably by
  * engine-portable hashers). */
case class U256ToStringExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "u256_to_string"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"u256_to_string expects BINARY, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    HexKernels.u256Str(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexKernels.u256Str($c)")
  override protected def withNewChildInternal(newChild: Expression): U256ToStringExpr =
    copy(child = newChild)
}

case class Keccak256Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "keccak256"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"keccak256 expects BINARY, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    graft.evm.Keccak256.hash(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.evm.Keccak256.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): Keccak256Expr =
    copy(child = newChild)
}

/** Column-level API + SQL registration for the native expressions. */
object HexExpressions {
  def evmHexDecodeN(c: Column): Column =
    ColumnBridge.column(EvmHexDecodeExpr(ColumnBridge.expression(c)))
  def evmHexDecodeLongN(c: Column): Column =
    ColumnBridge.column(EvmHexDecodeLongExpr(ColumnBridge.expression(c)))
  def evmHexEncodeN(c: Column): Column =
    ColumnBridge.column(EvmHexEncodeExpr(ColumnBridge.expression(c)))
  def evmHexEncodeQuantityN(c: Column): Column =
    ColumnBridge.column(EvmHexEncodeQuantityExpr(ColumnBridge.expression(c)))
  def evmHexDecodeU256N(c: Column): Column =
    ColumnBridge.column(EvmHexDecodeU256Expr(ColumnBridge.expression(c)))
  def u256ToStringN(c: Column): Column =
    ColumnBridge.column(U256ToStringExpr(ColumnBridge.expression(c)))
  /** keccak256 over binary (cast strings first: keccak256N(c.cast("binary"))). */
  def keccak256N(c: Column): Column =
    ColumnBridge.column(Keccak256Expr(ColumnBridge.expression(c)))

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("evm_hex_decode_n",
      exprs => EvmHexDecodeExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("evm_hex_decode_int_n",
      exprs => EvmHexDecodeLongExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("evm_hex_encode_n",
      exprs => EvmHexEncodeExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("evm_hex_encode_int_n",
      exprs => EvmHexEncodeQuantityExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("evm_hex_decode_u256_n",
      exprs => EvmHexDecodeU256Expr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("u256_to_string_n",
      exprs => U256ToStringExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("keccak256_n",
      exprs => Keccak256Expr(exprs.head), "built-in")
  }
}
