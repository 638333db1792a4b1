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

/** One-pass char-class counters for the C4-style quality gate (q66 /
  * CorpusBuild) — the scalar kernel behind [[CharClassCountsExpr]].
  * Counts over the UTF-8 BYTES: every counted class is pure ASCII, and
  * ASCII bytes never occur inside multi-byte UTF-8 sequences
  * (continuation bytes are ≥ 0x80), so byte counts equal the
  * codepoint-level `length(regexp_replace(text, '[^X]', ''))` counts the
  * gate formerly computed with FOUR full rewritten copies of every
  * document (VERDICT r06 #5/#6 — three transient copies per doc at
  * 100 TB just to count characters). Value equivalence with the regex
  * battery is asserted in GraftExpressionsSpec. */
object CharClass {
  private val Js = "javascript".getBytes("US-ASCII")

  /** (ellipsis_ct, upper_ct, alpha_ct, digit_ct, has_brace, has_js) —
    *  - ellipsis_ct: leftmost non-overlapping "..." matches (the
    *    `(len - len(replace(text,'...',''))) div 3` identity);
    *  - upper/alpha/digit: [A-Z] / [A-Za-z] / [0-9] char counts;
    *  - has_brace: any '{' or '}' (q66's bit-1 predicate);
    *  - has_js: case-insensitive ASCII "javascript" substring — equal to
    *    `lower(text).contains("javascript")` (no Unicode lowering maps
    *    into the pattern's letters: the only single-char ASCII-producing
    *    lowering, U+212A→k, is not in "javascript"). */
  def counts(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    val n = b.length
    var ell = 0L; var up = 0L; var al = 0L; var dig = 0L
    var brace = 0L; var js = 0L
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == '.' && i + 2 < n && b(i + 1) == '.' && b(i + 2) == '.') {
        ell += 1; i += 3
      } else {
        if (c >= 'A' && c <= 'Z') { up += 1; al += 1 }
        else if (c >= 'a' && c <= 'z') al += 1
        else if (c >= '0' && c <= '9') dig += 1
        else if (c == '{' || c == '}') brace = 1L
        if (js == 0L && (c | 0x20) == 'j' && i + Js.length <= n) {
          var k = 1
          while (k < Js.length && (b(i + k) | 0x20) == Js(k)) k += 1
          if (k == Js.length) js = 1L
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ell, up, al, dig, brace, js))
  }
}

/** `graft_charclass_counts(text)` → struct of the six gate counters in
  * ONE codegen'd pass over the document bytes (the q55 native-expression
  * pattern applied to the quality gate). */
case class CharClassCountsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("ellipsis_ct", LongType, nullable = false),
    StructField("upper_ct", LongType, nullable = false),
    StructField("alpha_ct", LongType, nullable = false),
    StructField("digit_ct", LongType, nullable = false),
    StructField("has_brace", LongType, nullable = false),
    StructField("has_js", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    CharClass.counts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CharClass$$.MODULE$$.counts($c)")
  override protected def withNewChildInternal(
      newChild: Expression): CharClassCountsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_charclass_counts"
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
    ext.injectFunction((
      FunctionIdentifier("graft_charclass_counts"),
      new ExpressionInfo(classOf[CharClassCountsExpr].getName, "graft_charclass_counts"),
      (args: Seq[Expression]) => CharClassCountsExpr(args.head)))
  }
}
