package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Hashing, Similarity, TextFunctions}

/** Native Catalyst expressions for the hot normalizers (SURVEY §7:
  * "promote the hot ones to Catalyst `UnaryExpression` with codegen").
  * Each stays inside whole-stage codegen — the generated code calls the
  * engine's single-source-of-truth scalar functions, so Column-land and
  * typed-transform-land can never diverge.
  *
  * Registered via [[GraftExtensions]]:
  *   SparkSession.builder.withExtensions(new GraftExtensions) →
  *   SELECT graft_ascii_fold(s), graft_escape_title(s),
  *          graft_jaro_winkler(a, b)
  */
case class AsciiFold(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  // registered SQL functions are user-reachable: declare the input
  // contract so a wrong-typed argument is an ANALYSIS error, not a
  // runtime ClassCastException / codegen compile failure (ADVICE r05)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TextFunctions.asciiFold(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.TextFunctions$$.MODULE$$.asciiFold($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): AsciiFold =
    copy(child = newChild)
  override def prettyName: String = "graft_ascii_fold"
}

/** Percent-encoding with urllib.parse.quote semantics (P9). */
case class EscapeTitle(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TextFunctions.escapeTitle(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.TextFunctions$$.MODULE$$.escapeTitle($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): EscapeTitle =
    copy(child = newChild)
  override def prettyName: String = "graft_escape_title"
}

/** Jaro-Winkler similarity as a native binary expression (the north rule's
  * pairwise scorer, also exposed at the Column level). */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    Similarity.jaroWinkler(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Similarity$$.MODULE$$.jaroWinkler($a.toString(), $b.toString())")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_jaro_winkler"
}

/** Winnowed Rabin-Karp 8-gram fingerprints as a native array-returning
  * expression (q55/q59/q60's hot path): one pass per document over the
  * codepoint array, emitting only the `h % 64 == 0` skim — replaces a
  * 64×-larger explode whose pushed-down winnow filter re-evaluated the
  * polynomial hash through nested O(position) UTF8String substrings.
  * Values are pinned to the SQL oracle's per-gram formula by
  * [[graft.functions.Hashing.rollingFingerprints]]'s Scaladoc contract
  * and asserted in GraftExpressionsSpec. */
case class RollingFingerprintsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Hashing.rollingFingerprints(
        input.asInstanceOf[UTF8String].toString, 8, 64))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Hashing$$.MODULE$$.rollingFingerprints($c.toString(), 8, 64))")
  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprintsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_rolling_fp"
}

/** SparkSessionExtensions injector for the graft native functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_ascii_fold"),
      new ExpressionInfo(classOf[AsciiFold].getName, "graft_ascii_fold"),
      (args: Seq[Expression]) => AsciiFold(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_escape_title"),
      new ExpressionInfo(classOf[EscapeTitle].getName, "graft_escape_title"),
      (args: Seq[Expression]) => EscapeTitle(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "graft_jaro_winkler"),
      (args: Seq[Expression]) => JaroWinklerExpr(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_fp"),
      new ExpressionInfo(classOf[RollingFingerprintsExpr].getName, "graft_rolling_fp"),
      (args: Seq[Expression]) => RollingFingerprintsExpr(args.head)))
  }
}
