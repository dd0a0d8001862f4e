package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's scalar-function surface that Spark does not ship under
  * the same name/semantics (reference: FlinkSqlOperatorTable.java +
  * SqlFunctionUtils.java, SURVEY.md §2.8).
  *
  * Implementation stance: compose built-in `org.apache.spark.sql.functions`
  * wherever semantics allow — composed columns stay inside whole-stage
  * codegen for free. Only `HASH_CODE` (Java String.hashCode parity —
  * reference SqlFunctionUtils.hashCode) needs a native [[Expression]], and
  * it gets a real `doGenCode` so it fuses into the generated stage rather
  * than falling back to interpreted eval.
  */
object GraftFunctions {

  /** SPLIT_INDEX(s, sep, i): i-th (0-based) field after splitting on the
    * literal separator; NULL when out of range (reference
    * SqlFunctionUtils.splitIndex). `split` takes a regex, so quote the
    * separator; limit -1 keeps trailing empty fields. */
  def splitIndex(s: Column, sep: String, i: Int): Column =
    element_at(split(s, java.util.regex.Pattern.quote(sep), -1), i + 1)

  /** KEYVALUE(s, pairSep, kvSep, key): value for `key` in a
    * "k1=v1&k2=v2"-style string (reference SqlFunctionUtils.keyValue). */
  def keyValue(s: Column, pairSep: String, kvSep: String, key: String): Column =
    element_at(str_to_map(s,
      lit(java.util.regex.Pattern.quote(pairSep)),
      lit(java.util.regex.Pattern.quote(kvSep))), key)

  /** IS_DECIMAL(s): string parses as a decimal number. */
  def isDecimal(s: Column): Column =
    s.rlike("^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$")

  /** IS_DIGIT(s): non-empty and all ASCII digits. */
  def isDigit(s: Column): Column = s.rlike("^[0-9]+$")

  /** IS_ALPHA(s): non-empty and all ASCII letters. */
  def isAlpha(s: Column): Column = s.rlike("^[A-Za-z]+$")

  /** DIV_INT(a, b): integral division truncating toward zero. */
  def divInt(a: Column, b: Column): Column = call_function("div", a, b)

  /** HASH_CODE(s): Java String.hashCode of the UTF-16 representation. */
  def hashCode(s: Column): Column =
    Bridge.column(JavaHashCode(Bridge.expression(s)))

  /** Register SQL names so `spark.sql` queries can call the gap functions
    * by their reference names. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("split_index",
      (s: String, sep: String, i: Int) =>
        if (s == null) null
        else { val p = s.split(java.util.regex.Pattern.quote(sep), -1)
               if (i >= 0 && i < p.length) p(i) else null })
    spark.udf.register("keyvalue",
      (s: String, ps: String, ks: String, key: String) =>
        if (s == null) null
        else s.split(java.util.regex.Pattern.quote(ps), -1).iterator
          .map(_.split(java.util.regex.Pattern.quote(ks), 2))
          .collectFirst { case Array(k, v) if k == key => v }.orNull)
    spark.udf.register("is_decimal", (s: String) =>
      s != null && s.matches("[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)"))
    spark.udf.register("is_digit", (s: String) => s != null && s.matches("[0-9]+"))
    spark.udf.register("is_alpha", (s: String) => s != null && s.matches("[A-Za-z]+"))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash_code", graft.GraftExtensions.hashCodeBuilder _, "scala_udf")
  }
}

/** Java `String.hashCode` as a codegen'd Catalyst expression — the
  * reference exposes HASH_CODE(str) (FlinkSqlOperatorTable.java:486) with
  * JVM-hashCode semantics, which no Spark built-in matches (Spark `hash` is
  * Murmur3). Null-safe unary; fuses into whole-stage codegen. */
case class JavaHashCode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash_code requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hash_code"

  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"($c).toString().hashCode()")

  override protected def withNewChildInternal(newChild: Expression): JavaHashCode =
    copy(child = newChild)
}
