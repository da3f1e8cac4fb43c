package graft.functions

import graft.families.Family
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class GlmRow(features: Seq[Double], label: Double)
case class LossGrad(loss: Double, grad: Seq[Double])

/** Typed SQL-visible UDAF façade over the fused loss+gradient kernel
  * (SURVEY §2.7 UDAF surface): the same math as `Kernels.lossGrad`,
  * expressed as an `Aggregator` so it runs inside a DataFrame aggregation
  * (`ds.select(agg.toColumn)`) or registers for SQL via
  * `functions.udaf`. The RDD kernel remains the solver hot path
  * (partition-ordered combine for bit determinism); this form trades that
  * ordering guarantee for Catalyst integration.
  */
class GlmLossGradAggregator(family: Family, beta: Array[Double])
    extends Aggregator[GlmRow, LossGrad, LossGrad] {

  override def zero: LossGrad = LossGrad(0.0, Vector.fill(beta.length)(0.0))

  override def reduce(acc: LossGrad, row: GlmRow): LossGrad = {
    var xb = 0.0
    var i = 0
    while (i < beta.length) { xb += row.features(i) * beta(i); i += 1 }
    val w = family.dLoss(xb, row.label)
    val g = acc.grad.toArray
    i = 0
    while (i < beta.length) { g(i) += w * row.features(i); i += 1 }
    LossGrad(acc.loss + family.loss(xb, row.label), g.toSeq)
  }

  override def merge(a: LossGrad, b: LossGrad): LossGrad = {
    val g = a.grad.toArray
    var i = 0
    while (i < g.length) { g(i) += b.grad(i); i += 1 }
    LossGrad(a.loss + b.loss, g.toSeq)
  }

  override def finish(acc: LossGrad): LossGrad = acc

  override def bufferEncoder: Encoder[LossGrad] = Encoders.product[LossGrad]
  override def outputEncoder: Encoder[LossGrad] = Encoders.product[LossGrad]
}
