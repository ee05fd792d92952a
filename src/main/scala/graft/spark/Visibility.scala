package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/**
 * Row-level visibility filtering — the reference stores an
 * Accumulo-style ColumnVisibility boolean expression per row
 * (core/store/.../data/visibility/VisibilityManagement.java; evaluation
 * is delegated to the store's VisibilityFilter) and a scan passes only
 * rows whose expression is satisfied by the caller's authorization set.
 *
 * Expression grammar (Accumulo ColumnVisibility): labels
 * `[A-Za-z0-9_.:-]+`, `&` (all), `|` (any), parentheses; `&` binds
 * tighter than `|`; the empty expression is visible to everyone.
 */
object Visibility {

  sealed trait Node
  case class Label(s: String) extends Node
  case class AndN(xs: List[Node]) extends Node
  case class OrN(xs: List[Node]) extends Node
  case object True extends Node

  def parse(expr: String): Node = {
    val s = expr.trim
    if (s.isEmpty) return True
    var pos = 0
    def peek: Char = if (pos < s.length) s.charAt(pos) else '\u0000'
    def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    def isLabelChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '.' || c == ':' || c == '-'
    def term(): Node = {
      skipWs()
      if (peek == '(') {
        pos += 1
        val e = orExpr()
        skipWs()
        require(peek == ')', s"visibility parse error at $pos in '$s': expected ')'")
        pos += 1
        e
      } else {
        val start = pos
        while (pos < s.length && isLabelChar(s.charAt(pos))) pos += 1
        require(pos > start, s"visibility parse error at $pos in '$s': expected label")
        Label(s.substring(start, pos))
      }
    }
    def andExpr(): Node = {
      var xs = List(term())
      skipWs()
      while (peek == '&') { pos += 1; xs = term() :: xs; skipWs() }
      if (xs.size == 1) xs.head else AndN(xs.reverse)
    }
    def orExpr(): Node = {
      var xs = List(andExpr())
      skipWs()
      while (peek == '|') { pos += 1; xs = andExpr() :: xs; skipWs() }
      if (xs.size == 1) xs.head else OrN(xs.reverse)
    }
    val root = orExpr()
    skipWs()
    require(pos == s.length, s"visibility parse error: trailing input at $pos in '$s'")
    root
  }

  def evaluate(node: Node, auths: Set[String]): Boolean = node match {
    case True => true
    case Label(l) => auths.contains(l)
    case AndN(xs) => xs.forall(evaluate(_, auths))
    case OrN(xs) => xs.exists(evaluate(_, auths))
  }

  /** per-row visibility test against a constant authorization set;
    * expressions repeat heavily across rows, so parses are memoized
    * task-locally. Codegen'd instance call keeps the filter fused. */
  case class VisibilityMatches(child: Expression, auths: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    @transient private lazy val authSet: Set[String] = auths.toSet
    @transient private lazy val cache = new java.util.HashMap[String, Node]()

    def test(vis: org.apache.spark.unsafe.types.UTF8String): Boolean = {
      val s = vis.toString
      var node = cache.get(s)
      if (node == null) { node = parse(s); cache.put(s, node) }
      evaluate(node, authSet)
    }

    override def nullSafeEval(vis: Any): Any =
      test(vis.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("visibilityMatches", this, classOf[VisibilityMatches].getName)
      defineCodeGen(ctx, ev, vis => s"$ref.test($vis)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def visible(visCol: Column, auths: Seq[String]): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(VisibilityMatches(expression(visCol), auths))
  }

  // ---------------------------------------------- field-level visibility

  /**
   * Field-level visibility from a JSON definition attribute — the
   * reference's JsonDefinitionColumnVisibilityManagement +
   * FieldLevelVisibilityHandler (extensions/adapters/vector/.../visibility/
   * JsonDefinitionColumnVisibilityManagement.java:30-120,
   * FieldLevelVisibilityHandler.java:70-88): the `visJson` column holds a
   * JSON object mapping field names — or field-name REGEXES, first match in
   * document order wins — to visibility expressions. Resolution order per
   * field: exact JSON key match, then the first key the field name FULLY
   * matches as a Java regex (String.matches — anchored), else the default
   * visibility. A null or unparseable definition falls through to the
   * default, as the reference's error path does. Pure column expressions
   * (from_json preserves key order; the regex probe anchors with `^(?:…)$`
   * to reproduce Java full-match semantics).
   */
  def fieldVis(visJson: Column, fieldName: String, defaultVis: String): Column = {
    import org.apache.spark.sql.types.{MapType, StringType}
    val m = from_json(visJson, MapType(StringType, StringType))
    val exact = try_element_at(m, lit(fieldName))
    val firstRegex = try_element_at(
      org.apache.spark.sql.functions.filter(map_entries(m),
        e => regexp_like(lit(fieldName), concat(lit("^(?:"), e.getField("key"), lit(")$")))),
      lit(1)).getField("value")
    coalesce(exact, firstRegex, lit(defaultVis))
  }

  /**
   * Field-level read under an authorization set: every listed field is
   * kept only where its resolved visibility expression passes the auths,
   * NULLed otherwise — the Spark-native form of the reference's read path
   * skipping field values whose visibility the scanner's authorizations
   * cannot satisfy (row identity survives; only fields redact).
   */
  def redactFields(df: DataFrame, visCol: String, auths: Seq[String],
                   fields: Seq[String], defaultVis: String): DataFrame =
    fields.foldLeft(df) { (d, f) =>
      d.withColumn(f, when(visible(fieldVis(col(visCol), f, defaultVis), auths), col(f)))
    }

  /** the reference's visibility rewrite: `replaceFirst(regex, replacement)`
    * on the expression string, then strip ONE leading dangling operator the
    * replacement may have exposed (an empty replacement of a leading term
    * leaves "&rest" / "|rest") — VisibilityTransformer.transform, reference
    * extensions/datastores/accumulo/.../util/VisibilityTransformer.java:25-60. */
  def replaceFirstAndStrip(vis: String, p: java.util.regex.Pattern,
                           replacement: String): String = {
    val replaced = p.matcher(vis).replaceFirst(replacement)
    if (replaced.nonEmpty && (replaced.charAt(0) == '&' || replaced.charAt(0) == '|'))
      replaced.substring(1)
    else replaced
  }

  /** codegen'd per-row visibility rewrite with constant regex/replacement
    * (the pattern compiles once per expression instance). */
  case class VisibilityReplaceFirst(child: Expression, regex: String, replacement: String)
      extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def nullIntolerant: Boolean = true
    @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

    def rewrite(vis: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        replaceFirstAndStrip(vis.toString, pattern, replacement))

    override def nullSafeEval(vis: Any): Any =
      rewrite(vis.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("visReplaceFirst", this, classOf[VisibilityReplaceFirst].getName)
      defineCodeGen(ctx, ev, vis => s"$ref.rewrite($vis)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def replaceFirst(visCol: Column, regex: String, replacement: String): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(VisibilityReplaceFirst(expression(visCol), regex, replacement))
  }

  /** scan-side filter: keep rows whose visibility expression the caller's
    * authorizations satisfy. */
  def filter(df: org.apache.spark.sql.DataFrame, visCol: String,
             auths: Seq[String]): org.apache.spark.sql.DataFrame =
    df.where(visible(org.apache.spark.sql.functions.col(visCol), auths))
}
