package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.ColumnBridge

/** All features of the Gopher repetition gate (Rae et al. 2021 §A1.1.1)
  * in ONE single-pass native expression: duplicate-line fraction and
  * char fraction, the char share of the most frequent word n-gram per
  * `topNs` entry, the char share COVERED by within-doc-repeated n-grams
  * per `repNs` entry, and the composed verdict.
  *
  * Why native and not SQL-composable: the HOF composition of these
  * features is correct but CANNOT survive Catalyst substitution — a
  * filter on the verdict is pushed through the projections by
  * substituting every alias, which re-inlines the gram/sort/dedup
  * subtrees into lambda BODIES, where interpreted HOF eval re-evaluates
  * them PER ELEMENT (no codegen, no subexpression elimination inside
  * lambdas). Measured: a `rep_ok = 1` filter over 500 short docs ran for
  * MINUTES. This is the [[VectorExprs.PqEncode]] lesson on the text
  * side: one expression node is substitution-proof — a pushed-down
  * filter costs at most one extra single-pass eval per row.
  *
  * Exact-semantics contract with the DuckDB oracle (q160/q164):
  *  - words = `\s+` split of the lower-cased trimmed text (empty text
  *    yields the single empty token, as `split` does);
  *  - lines = `\n` split of the RAW text (line dedup is exact-match,
  *    case preserved);
  *  - all char counts are CODE POINTS (Spark `length` semantics);
  *  - top-gram ties break to the smallest gram in UTF8 binary order
  *    (code-point order — what `array_sort` ordered);
  *  - a doc too short for an n-gram family yields null there, and a
  *    null feature cannot fire its rule;
  *  - a NULL text yields all-null features and verdict 1 (nothing can
  *    fire) — the null-propagation the HOF form had.
  *
  * CodegenFallback: per-row work is a full scan of the text, far above
  * expression-dispatch overhead (the [[CharEntropy]] precedent). */
case class RepetitionStats(child: Expression,
                           maxDupLineFrac: Double,
                           maxDupLineCharFrac: Double,
                           topNs: Seq[(Int, Double)],
                           repNs: Seq[(Int, Double)])
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "repetition_stats"
  override def nullable: Boolean = false

  override def dataType: DataType = StructType(
    Seq(StructField("n_words", LongType, nullable = true),
      StructField("n_lines", LongType, nullable = true),
      StructField("dup_line_frac", DoubleType, nullable = true),
      StructField("dup_line_char_frac", DoubleType, nullable = true)) ++
    topNs.map { case (n, _) =>
      StructField(s"top${n}_char_frac", DoubleType, nullable = true) } ++
    repNs.map { case (n, _) =>
      StructField(s"rep${n}_char_frac", DoubleType, nullable = true) } :+
    StructField("rep_ok", IntegerType, nullable = false))

  private val nFields = 5 + topNs.size + repNs.size

  /** Code-point count of a Java string (Spark `length` semantics). */
  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Code-point-order comparison — UTF8 binary order, what array_sort
    * ordered (Java String.compareTo is UTF-16 order, which disagrees on
    * supplementary characters). */
  private def cpLess(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    val values = new Array[Any](nFields)
    var fired = false
    if (raw == null) {
      // null text: all-null features, nothing can fire
      values(nFields - 1) = 1
      return InternalRow.fromSeq(values.toIndexedSeq)
    }
    val u = raw.asInstanceOf[UTF8String]
    val rawStr = u.toString
    val t = u.toLowerCase.trim.toString

    // lines over the RAW text
    val lines = rawStr.split("\n", -1)
    val distinct = new java.util.LinkedHashSet[String]()
    var lineChars = 0L
    var i = 0
    while (i < lines.length) { distinct.add(lines(i)); lineChars += cp(lines(i)); i += 1 }
    var distChars = 0L
    val dit = distinct.iterator()
    while (dit.hasNext) distChars += cp(dit.next())
    val dupLineFrac = 1.0 - distinct.size.toDouble / lines.length
    val dupLineCharFrac: Any =
      if (lineChars > 0L) (lineChars - distChars).toDouble / lineChars else null
    values(0) = java.lang.Long.valueOf(0L) // placeholder, set below
    values(1) = lines.length.toLong
    values(2) = dupLineFrac
    values(3) = dupLineCharFrac
    if (dupLineFrac > maxDupLineFrac) fired = true
    dupLineCharFrac match {
      case d: java.lang.Double => if (d > maxDupLineCharFrac) fired = true
      case _ =>
    }

    // words of the lower-cased trimmed text; split("\\s+", -1) on a
    // trimmed string has no trailing empties, and "" yields [""]
    val w = t.split("\\s+", -1)
    values(0) = w.length.toLong
    val wLen = new Array[Long](w.length)
    var tot = 0L
    i = 0
    while (i < w.length) { wLen(i) = cp(w(i)); tot += wLen(i); i += 1 }

    // one pass per n-gram family: count map -> top / coverage
    def gramCounts(n: Int): java.util.HashMap[String, Array[Int]] = {
      val m = new java.util.HashMap[String, Array[Int]]()
      var s = 0
      while (s + n <= w.length) {
        val sb = new java.lang.StringBuilder(w(s))
        var j = 1
        while (j < n) { sb.append(' '); sb.append(w(s + j)); j += 1 }
        val slot = m.computeIfAbsent(sb.toString, _ => new Array[Int](1))
        slot(0) += 1
        s += 1
      }
      m
    }

    var f = 4
    for ((n, th) <- topNs) {
      if (w.length >= n && tot > 0L) {
        val m = gramCounts(n)
        var bestCnt = 0
        var bestGram: String = null
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue()(0)
          if (c > bestCnt || (c == bestCnt && cpLess(e.getKey, bestGram)))
            { bestCnt = c; bestGram = e.getKey }
        }
        // gram chars = code points minus the n-1 joining spaces
        val frac = bestCnt.toLong * (cp(bestGram) - (n - 1)) .toDouble / tot
        values(f) = frac
        if (frac > th) fired = true
      } else if (w.length >= n) {
        // tot == 0: all-whitespace text never reaches here (w = [""]),
        // but keep the HOF form's null-on-zero-denominator behavior
        values(f) = null
      }
      f += 1
    }
    for ((n, th) <- repNs) {
      if (w.length >= n && tot > 0L) {
        val m = gramCounts(n)
        val covered = new Array[Boolean](w.length)
        var s = 0
        while (s + n <= w.length) {
          val sb = new java.lang.StringBuilder(w(s))
          var j = 1
          while (j < n) { sb.append(' '); sb.append(w(s + j)); j += 1 }
          if (m.get(sb.toString)(0) >= 2) {
            var p = s
            while (p < s + n) { covered(p) = true; p += 1 }
          }
          s += 1
        }
        var cov = 0L
        i = 0
        while (i < w.length) { if (covered(i)) cov += wLen(i); i += 1 }
        val frac = cov.toDouble / tot
        values(f) = frac
        if (frac > th) fired = true
      } else if (w.length >= n) {
        values(f) = null
      }
      f += 1
    }
    values(nFields - 1) = if (fired) 0 else 1
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionExprs {
  def repetitionStats(text: Column, maxDupLineFrac: Double,
                      maxDupLineCharFrac: Double,
                      topNs: Seq[(Int, Double)],
                      repNs: Seq[(Int, Double)]): Column =
    ColumnBridge.toColumn(RepetitionStats(ColumnBridge.toExpr(text),
      maxDupLineFrac, maxDupLineCharFrac, topNs, repNs))
}
