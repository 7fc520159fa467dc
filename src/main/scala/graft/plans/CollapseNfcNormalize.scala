package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NfcNormalize

/** Optimizer rule: NFC normalization is idempotent, so
  * `nfc_normalize(nfc_normalize(x))` collapses to one application.
  *
  * The nested form arises naturally in layered pipelines — a cleaning
  * stage normalizes defensively, then a fingerprinting stage normalizes
  * again because it cannot assume its input was cleaned. Each redundant
  * application costs a full `isNormalized` scan of every row at 100 TB,
  * so the plan, not the author, should drop it. Installed via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`) — the engine's
  * demonstration of the Rule[LogicalPlan] extension tier, alongside its
  * custom expressions (tier b) and TypedImperativeAggregates.
  */
case class CollapseNfcNormalize(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_)) => inner
    }
}
