package graft.core

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins._

/** The single shared physical-plan walker: traverses the subtrees AQE
  * hides (AdaptiveSparkPlanExec / QueryStageExec report no children),
  * reused exchanges, AND subquery plans — a join inside an uncorrelated
  * scalar/IN subquery is invisible to a plain `children` walk. Used by the
  * test-side plan lints (`SparkSpec.planNodes`) and the scale-audit
  * tooling ([[graft.tools.ScaleAudit]]); plan assertions must not each
  * hand-roll this. */
object PlanWalk {

  def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Nil
    }
    val subs = p.subqueries.flatMap {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s => Seq(s)
    }
    p +: (p.children ++ extra ++ subs).flatMap(nodes)
  }

  /** Scale-relevant facts of one executed plan, cheap to diff across scale
    * factors: join-strategy counts, AQE skew/coalesce activity, shuffle
    * count, and total bytes spilled (sum of every `*spill*` SQLMetric —
    * sort, aggregate and shuffle spills all carry the word). Call AFTER
    * the plan has executed, so AQE has finalized and metrics are live. */
  final case class Facts(bhj: Int, smj: Int, shj: Int, bnlj: Int, cart: Int,
      skewJoins: Int, shuffles: Int, broadcasts: Int,
      aqeSkewReads: Int, aqeCoalescedReads: Int, spillBytes: Long,
      skewedPartitions: Long, skewedSplits: Long) {
    def json: String =
      s""""bhj":$bhj,"smj":$smj,"shj":$shj,"bnlj":$bnlj,"cart":$cart,""" +
      s""""skew_joins":$skewJoins,"shuffles":$shuffles,"broadcasts":$broadcasts,""" +
      s""""aqe_skew_reads":$aqeSkewReads,"aqe_coalesced_reads":$aqeCoalescedReads,""" +
      s""""spill_bytes":$spillBytes,""" +
      s""""skewed_partitions":$skewedPartitions,"skewed_splits":$skewedSplits"""
  }

  /** [[nodes]] deduplicated by object identity. `nodes` intentionally
    * descends into `ReusedExchangeExec.child` (an assertion like "a
    * broadcast of X exists somewhere under this reuse" must see the
    * subtree), but that child IS the original exchange object, so a
    * counting consumer would tally the reused subtree once per reuse —
    * inflating join/shuffle counts and summing the same spill SQLMetric
    * multiple times. Facts counts over this deduplicated view. */
  def distinctNodes(p: SparkPlan): Seq[SparkPlan] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    nodes(p).filter(seen.add)
  }

  def facts(root: SparkPlan): Facts = {
    val ns = distinctNodes(root)
    Facts(
      bhj = ns.count(_.isInstanceOf[BroadcastHashJoinExec]),
      smj = ns.count(_.isInstanceOf[SortMergeJoinExec]),
      shj = ns.count(_.isInstanceOf[ShuffledHashJoinExec]),
      bnlj = ns.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      cart = ns.count(_.isInstanceOf[CartesianProductExec]),
      skewJoins = ns.count {
        case j: SortMergeJoinExec => j.isSkewJoin
        case j: ShuffledHashJoinExec => j.isSkewJoin
        case _ => false
      },
      shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec]),
      broadcasts = ns.count(_.isInstanceOf[BroadcastExchangeExec]),
      aqeSkewReads = ns.count {
        case r: AQEShuffleReadExec => r.hasSkewedPartition
        case _ => false
      },
      aqeCoalescedReads = ns.count {
        case r: AQEShuffleReadExec => r.hasCoalescedPartition
        case _ => false
      },
      spillBytes = ns.flatMap(_.metrics.collect {
        case (k, m) if k.toLowerCase.contains("spill") => m.value
      }).sum,
      // split GRANULARITY, not just the join count: how many reduce
      // partitions AQE adjudicated skewed, and how many physical splits
      // it cut them into — the number that must grow with the DATA at a
      // fixed task count for the skew handling to be scale-honest
      skewedPartitions = ns.collect {
        case r: AQEShuffleReadExec if r.hasSkewedPartition =>
          r.metrics.get("numSkewedPartitions").map(_.value).getOrElse(0L)
      }.sum,
      skewedSplits = ns.collect {
        case r: AQEShuffleReadExec if r.hasSkewedPartition =>
          r.metrics.get("numSkewedSplits").map(_.value).getOrElse(0L)
      }.sum)
  }
}
