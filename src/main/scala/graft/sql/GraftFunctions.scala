package graft.sql

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.analysis.Analyzer

/** Native Catalyst expressions for the analyzer — the SQL surface of
  * the engine's tokenization (the reference exposes its analyzer by
  * name through IndexConfiguration.java:167-174; here the analyzer is
  * a catalog function any SQL query can call). Both expressions are
  * codegen'd (`doGenCode` emits a direct static call into the
  * allocation-free scanner — no UDF row conversion, stays inside
  * WholeStageCodegen).
  */

/** Java-callable helpers the generated code binds to (Scala object
  * static forwarders are directly referencable from Janino). */
object ExprHelpers {
  def docLen(s: UTF8String): Int = Analyzer.docLen(s.toString)
  def tokenize(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    Analyzer.foreachEmitted(s.toString)((t, _) => out += UTF8String.fromString(t))
    new GenericArrayData(out.toArray)
  }
  def tokenizeRaw(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    Analyzer.scanRaw(s.toString)((t, _) => out += UTF8String.fromString(t))
    new GenericArrayData(out.toArray)
  }
}

/** graft_doclen(text) — emitted-token count (BM25 document length). */
case class DocLenExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_doclen requires a string argument, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_doclen"
  override def nullSafeEval(input: Any): Any =
    ExprHelpers.docLen(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.ExprHelpers.docLen($c)")
  override protected def withNewChildInternal(newChild: Expression): DocLenExpr =
    copy(child = newChild)
}

/** graft_tokenize(text) — emitted (stop-filtered) tokens, in order. */
case class TokenizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tokenize requires a string argument, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"
  override def nullSafeEval(input: Any): Any =
    ExprHelpers.tokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.ExprHelpers.tokenize($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
}

/** graft_tokenize_raw(text) — ALL raw tokens (stopwords included), in
  * order; element index + 1 is the engine's 1-based raw position. The
  * pipeline's shared tokenization stage (rawTok) runs on this instead
  * of a Dataset flatMap, keeping the scan inside WholeStageCodegen
  * with no tuple encode/decode per token. */
case class TokenizeRawExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tokenize_raw requires a string argument, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize_raw"
  override def nullSafeEval(input: Any): Any =
    ExprHelpers.tokenizeRaw(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.ExprHelpers.tokenizeRaw($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeRawExpr =
    copy(child = newChild)
}

object GraftFunctions {

  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.sql.GraftFunctions", null, name, usage, "")

  val docLen: Description = (
    FunctionIdentifier("graft_doclen"),
    info("graft_doclen", "graft_doclen(text) - emitted-token count (BM25 dl)"),
    (children: Seq[Expression]) => DocLenExpr(children.head))

  val tokenize: Description = (
    FunctionIdentifier("graft_tokenize"),
    info("graft_tokenize", "graft_tokenize(text) - emitted tokens, stopwords removed"),
    (children: Seq[Expression]) => TokenizeExpr(children.head))

  val tokenizeRaw: Description = (
    FunctionIdentifier("graft_tokenize_raw"),
    info("graft_tokenize_raw",
      "graft_tokenize_raw(text) - raw tokens, stopwords included"),
    (children: Seq[Expression]) => TokenizeRawExpr(children.head))

  val all: Seq[Description] = Seq(docLen, tokenize, tokenizeRaw)

  /** Imperative registration on an existing session (for sessions not
    * created with `spark.sql.extensions=graft.sql.GraftExtensions`). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    MatchQuery.register(spark)
  }

  // Column-level API (no SQL registration needed)
  def docLenCol(c: Column): Column =
    ColumnShim.column(DocLenExpr(ColumnShim.expression(c)))
  def tokenizeCol(c: Column): Column =
    ColumnShim.column(TokenizeExpr(ColumnShim.expression(c)))
  def tokenizeRawCol(c: Column): Column =
    ColumnShim.column(TokenizeRawExpr(ColumnShim.expression(c)))
}

/** Plug-in entry point:
  * `--conf spark.sql.extensions=graft.sql.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectTableFunction(MatchQuery.description)
  }
}
