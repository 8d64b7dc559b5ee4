package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.ColumnBridge

/** Character-level Shannon entropy of a text column, in bits per
  * character — the classic gibberish/encoded-blob signal in corpus
  * quality filtering: natural prose sits around 4–4.5 bits, base64 and
  * hex dumps near their alphabet's log₂, single-character runs near 0.
  * Complements [[DeflateRatio]] (which sees repetition structure deflate
  * can model) with a model-free distributional signal.
  *
  * entropy = −Σ_c p(c)·log₂ p(c) over Unicode code points; null for
  * null/empty text (no distribution).
  *
  * The naive SQL-composable form explodes ONE ROW PER CHARACTER
  * (explode → groupBy(doc, char) → join totals → sum), turning a 100 TB
  * corpus into a quadrillion-row shuffle. This expression is the right
  * shape: one pass per row, row-local, shuffle-free.
  *
  * Determinism: the per-row tally iterates code points in one pass, then
  * sums the entropy terms in ASCENDING CODE POINT order (sorted keys) —
  * a fixed summation order, so the value is bit-stable run to run and
  * partition-layout-independent. Cross-engine (oracle) agreement is then
  * only up to final-ulp differences in log₂, absorbed by rounding at the
  * query layer.
  *
  * CodegenFallback: per-row work is a full scan of the text — far above
  * expression-dispatch overhead (the [[DeflateRatio]]/[[NGramShingles]]
  * precedent).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return null
    // tally code points; a sorted map keeps the term-summation order fixed
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var total = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1L
      total += 1L
      i += Character.charCount(cp)
    }
    val ln2 = math.log(2.0)
    var ent = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / total
      ent -= p * (math.log(p) / ln2)
    }
    ent
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EntropyExprs {
  def charEntropy(text: Column): Column =
    ColumnBridge.toColumn(CharEntropy(ColumnBridge.toExpr(text)))
}
