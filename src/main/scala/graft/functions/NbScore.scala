package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused multinomial-Naive-Bayes scorer (the MinHashKernel pattern applied
  * to [[graft.operators.NaiveBayes]]).
  *
  * The relational scorer pays, per test document: a token explode, a
  * (doc, word) pre-aggregation shuffle, a ×|classes| expansion, a model
  * join, and a per-(doc, class) DECIMAL(18,9) sum — ~2.1 s at sf0.1, the
  * sweep's slowest stable query. This kernel walks each document's tokens
  * once against the broadcast model and returns the argmax directly:
  *   - the model rides as scaled longs (the DECIMAL(18,9) ln terms ×10⁹ —
  *     decimal addition at one scale IS integer addition of unscaled
  *     values, so Long accumulation is bit-identical to the decimal sum;
  *     |Σ| < 10¹⁰ in value, nowhere near Long range);
  *   - per-occurrence accumulation ≡ the relational tf·lp product (decimal
  *     × integer is exact repeated addition);
  *   - argmax scans classes in ascending name order keeping strict
  *     improvements — exactly `ORDER BY score DESC, cls ASC` rank 1.
  * Output: struct(predicted STRING, score DECIMAL(29,9)) — the same score
  * type the relational form's (18,9) prior + (28,9) sum addition yields.
  */
object NbScoreKernel extends Serializable {

  /** One trained model, value-equal by construction (Seq fields) so the
    * carrying expression keeps catalyst semanticEquals.
    *
    * @param classes  class names ASCENDING (the tie-break order)
    * @param priors   per-class ln-prior, unscaled 10⁻⁹ units
    * @param unseen   per-class unseen-word fallback, unscaled 10⁻⁹ units
    * @param words    vocabulary, parallel to `lps`
    * @param lps      per word: |classes| ln-likelihoods, unscaled 10⁻⁹
    *                 (flattened row-major: word i, class c at i·|C|+c)
    */
  final case class Model(classes: Seq[String], priors: Seq[Long],
      unseen: Seq[Long], words: Seq[String], lps: Seq[Long]) {
    require(priors.size == classes.size && unseen.size == classes.size)
    require(lps.size == words.size * classes.size)

    @transient lazy val classesU: Array[UTF8String] =
      classes.map(UTF8String.fromString).toArray
    @transient lazy val priorsA: Array[Long] = priors.toArray
    @transient lazy val unseenA: Array[Long] = unseen.toArray
    /** word → row-major offset into [[lpsA]] */
    @transient lazy val index: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](words.size * 2)
      words.zipWithIndex.foreach { case (w, i) => m.put(w, i * classes.size) }
      m
    }
    @transient lazy val lpsA: Array[Long] = lps.toArray
  }

  /** (predicted, score) for one document under `m`; a token-free text
    * scores by the priors alone (the relational form's left-join +
    * COALESCE(ll, 0) contract — callers map null text to "" to keep it). */
  def predict(text: UTF8String, m: Model): InternalRow = {
    val k = m.classesU.length
    val sums = new Array[Long](k)
    if (text != null) {
      val words = text.toString.split(" ", -1)
      var i = 0
      while (i < words.length) {
        val w = words(i)
        if (!w.isEmpty) {
          val off = m.index.get(w)
          if (off == null) {
            var c = 0
            while (c < k) { sums(c) += m.unseenA(c); c += 1 }
          } else {
            val o = off.intValue()
            var c = 0
            while (c < k) { sums(c) += m.lpsA(o + c); c += 1 }
          }
        }
        i += 1
      }
    }
    var best = 0
    var bestScore = Long.MinValue
    var c = 0
    while (c < k) {
      val s = m.priorsA(c) + sums(c)
      sums(c) = s
      if (s > bestScore) { bestScore = s; best = c } // strict: ties keep the
      c += 1                                         // earlier (smaller) class
    }
    new GenericInternalRow(Array[Any](m.classesU(best),
      org.apache.spark.sql.types.Decimal(bestScore, 29, 9)))
  }
}

/** Codegen wrapper over [[NbScoreKernel.predict]]: one static call per row,
  * model shipped once per stage via the references array. */
case class NbPredictExpr(child: Expression, model: NbScoreKernel.Model)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("predicted", StringType, nullable = false),
    StructField("score", DecimalType(29, 9), nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text must be STRING, got ${other.catalogString}")
  }
  override protected def withNewChildInternal(newChild: Expression): NbPredictExpr =
    copy(child = newChild)
  override def prettyName: String = "nb_predict"

  override def nullSafeEval(input: Any): Any =
    NbScoreKernel.predict(input.asInstanceOf[UTF8String], model)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("nbModel", model,
      "graft.functions.NbScoreKernel.Model")
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.functions.NbScoreKernel.predict($t, $mRef);
       """.stripMargin
    })
  }
}
