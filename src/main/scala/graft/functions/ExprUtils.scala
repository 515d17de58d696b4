package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression combinators.
  *
  * [[bind]] is the workhorse: evaluate a subexpression ONCE and expose
  * it to the body as a lambda-bound variable. Interpreted higher-order
  * functions re-evaluate every referenced subtree per lambda element
  * (no loop-invariant hoisting, and CollapseProject inlines projected
  * aliases back into consumers), so an expression like
  * `transform(seq, i => slice(tokens, i, k))` re-runs the whole
  * `tokens` pipeline — regex splits included — once per element.
  * `bind(tokens)(t => ...)` turns `tokens` into a NamedLambdaVariable:
  * computed once per row, referenced by value thereafter.
  *
  * Implementation: `element_at(transform(array(c), x => f(x)), 1)` —
  * a 1-element array mapped by the body, then unwrapped.
  */
object ExprUtils {

  def bind(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), x => f(x)), 1)

  /** Bind several columns at once (nested single binds): each is
    * evaluated exactly once per row no matter how often the body
    * references it. */
  def bindSeq(cs: Seq[Column])(f: Seq[Column] => Column): Column = {
    def go(rem: List[Column], acc: List[Column]): Column = rem match {
      case Nil => f(acc.reverse)
      case h :: t => bind(h)(hc => go(t, hc :: acc))
    }
    go(cs.toList, Nil)
  }

  def bind2(a: Column, b: Column)(f: (Column, Column) => Column): Column =
    element_at(zip_with(array(a), array(b), (x, y) => f(x, y)), 1)
}
