package graft.fm

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that hides its child's STRUCTURE (not its value)
  * from parent-expression nullability analysis.
  *
  * Why it exists: `ElementAt(CreateArray(...), <const in-bounds idx>,
  * failOnError = false)` — the shape every DuckDB-style
  * `['a', x, y][1]` bracket index desugars to — computes
  * `nullable = false` from the specific referenced element, but its
  * codegen still emits the runtime bounds-check branch that assigns
  * `ev.isNull`. With `nullable = false` that variable is never
  * declared, Janino rejects the generated class ("not an rvalue"),
  * and every row pays the interpreted-projection fallback. Wrapping
  * the collection operand makes `ElementAt` take its conservative
  * `nullable = true` path, whose generated code is well-formed; the
  * wrapper itself generates NO code (it forwards the child's
  * isNull/value slots verbatim).
  */
case class NullabilityGuard(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  // Pessimistic on purpose — this is the whole point of the wrapper.
  override def nullable: Boolean = true
  override def prettyName: String = "guard"

  override def eval(input: InternalRow): Any = child.eval(input)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eval = child.genCode(ctx)
    ev.copy(code = eval.code, isNull = eval.isNull, value = eval.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
