package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.JavaHashCode

/** Spark extensions entry point: makes the library's native expressions
  * available to pure-SQL users via
  * `spark.sql.extensions=graft.GraftExtensions` (the same wiring any
  * Spark-native library ships — no session-side registration calls
  * needed). Scalar gap functions that are column compositions are
  * registered per-session by [[graft.functions.GraftFunctions.register]];
  * only true Catalyst expressions belong here. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.hashCodeFn)
  }
}

object GraftExtensions {

  /** SQL builder for hash_code with arity validation — a bare
    * `children.head` would silently drop extra arguments and crash with a
    * NoSuchElementException on zero arguments. */
  def hashCodeBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"Function hash_code requires exactly 1 argument, got ${children.length}")
    JavaHashCode(children.head)
  }

  val hashCodeFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hash_code"),
    new ExpressionInfo(classOf[JavaHashCode].getName, "hash_code"),
    hashCodeBuilder _)
}
