package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Opt-in pair-existence rewrite — the qds95 multi-warehouse rewrite.
  *
  * TPC-DS q95 (reference: tpcds/queries/1/q95.sql) probes "orders that
  * shipped from more than one warehouse" with a self-join CTE:
  *
  * {{{
  *   ws_wh as (select ws1.ws_order_number
  *             from web_sales ws1, web_sales ws2
  *             where ws1.ws_order_number = ws2.ws_order_number
  *               and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
  *   ... where exists (select * from ws_wh where ...)
  * }}}
  *
  * The CTE's OUTPUT SIZE is quadratic per order key: an order with n
  * lines emits THETA(n^2) rows, and the downstream `web_returns, ws_wh`
  * exists multiplies again — so one hot order key explodes the query's
  * own intermediate combinatorially. Measured on the r11 skew fixtures:
  * a hot order carrying 40k web_sales lines (0.02 of sf1) OOM'd a 24 GB
  * heap; 12k lines (0.006) ran 33+ minutes before being killed. This is
  * NOT a scheduling problem — AQE's skew split balances partitions but
  * cannot shrink output — and the reference's planner keeps the join
  * too, so this is an above-reference optimization, OFF by default.
  *
  * Mechanism. The CTE result is consumed only for KEY MEMBERSHIP (the
  * right side of a semi/anti join), where multiplicity is irrelevant.
  * Under a per-key SET reading, "some pair of same-key rows differs in
  * w" is exactly "the key has >= 2 distinct non-null w values", i.e.
  * `min(w) <> max(w)`:
  *
  *  - pair (r1, r2) with r1.k = r2.k and r1.w <> r2.w exists
  *    => two distinct non-null w under k => min(w) <> max(w);
  *  - min(w) <> max(w) (both non-null, min/max skip nulls) => two rows
  *    whose w differ => a qualifying pair. A key with 0 or 1 non-null
  *    w yields min = max or NULL <> NULL = NULL — filtered out, exactly
  *    matching the join (a row never pairs with itself; null w fails
  *    `<>`). NULL join keys produce no pairs; the rewrite filters
  *    `IsNotNull(k)` to match.
  *
  * So inside a dup-insensitive context the rule replaces
  *
  * {{{ Project(k-only, Join(Inner, a.k = b.k && NOT(a.w = b.w), A, B)) }}}
  *
  * (A, B the same relation by `sameResult`, k and w the same columns of
  * it by output position) with
  *
  * {{{ Project(k, Filter(isnotnull(k) && min_w <> max_w,
  *       Aggregate(k, [k, min(w) min_w, max(w) max_w], A))) }}}
  *
  * — linear in the relation, with map-side partial min/max, so the hot
  * key that exploded the join becomes an ordinary skewed aggregate; the
  * semi join above it stays AQE-skew-splittable.
  *
  * Dup-insensitive context: the rewrite changes row MULTIPLICITY (one
  * row per qualifying key instead of one per pair), so it applies only
  * where the consumer is provably multiplicity-blind — the RIGHT
  * subtree of a LeftSemi/LeftAnti join, descending through nodes whose
  * output SET depends only on their children's SETS: Project, Filter,
  * Distinct/Deduplicate, and Inner/LeftSemi/LeftAnti joins. The descent
  * stops at anything else (Aggregate, Window, Union, Limit, Sample,
  * outer joins, Generate — counts or row identity leak through those).
  *
  * Enable with `spark.graft.pairExistsToMinMax.enabled=true`. Injected
  * unconditionally into `spark.experimental.extraOptimizations`
  * alongside [[TransitiveSelfJoinFilter]]; no-ops unless the flag is
  * set.
  */
object PairExistsToMinMax extends Rule[LogicalPlan] {

  val FLAG = "spark.graft.pairExistsToMinMax.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(FLAG, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, LeftSemi | LeftAnti, cond, hint) =>
        val newRight = rewriteSetCtx(right)
        if (newRight eq right) j
        else Join(left, newRight, j.joinType, cond, hint)
    }
  }

  /** Walk a multiplicity-blind subtree; rewrite every matching
    * Project-over-pair-join. Returns the input instance unchanged (eq)
    * when nothing matched. */
  private def rewriteSetCtx(p: LogicalPlan): LogicalPlan = p match {
    // a nondeterministic Project/Filter over the pair output is NOT
    // set-equivalent (deduplicating the pairs changes e.g. a rand()
    // sample's distribution) — Spark mostly forbids nondeterminism in
    // subqueries, but the rule also fires on hand-built Dataset plans,
    // so the descent stops there (falls to `case other`)
    case proj @ Project(pl, jn: Join) if pl.forall(_.deterministic) =>
      pairRewrite(proj, jn).getOrElse {
        val c = rewriteSetCtx(jn)
        if (c eq jn) proj else proj.copy(child = c)
      }
    case f: Filter if f.condition.deterministic =>
      val c = rewriteSetCtx(f.child)
      if (c eq f.child) f else f.copy(child = c)
    case pr: Project if pr.projectList.forall(_.deterministic) =>
      val c = rewriteSetCtx(pr.child)
      if (c eq pr.child) pr else pr.copy(child = c)
    case d: Distinct =>
      val c = rewriteSetCtx(d.child)
      if (c eq d.child) d else d.copy(child = c)
    case jn @ Join(l, r, Inner | LeftSemi | LeftAnti, _, _) =>
      val (nl, nr) = (rewriteSetCtx(l), rewriteSetCtx(r))
      if ((nl eq l) && (nr eq r)) jn else jn.copy(left = nl, right = nr)
    case other => other // not provably multiplicity-blind: stop
  }

  /** The Project(k-only, Join(Inner, k-eq && w-neq, A, B)) match. */
  private def pairRewrite(proj: Project, jn: Join): Option[LogicalPlan] = {
    if (jn.joinType != Inner) return None
    val cond = jn.condition.getOrElse(return None)
    val (eqs, neqs, notNulls, others) = {
      val cs = splitConjuncts(cond)
      val e = cs.collect { case EqualTo(a: AttributeReference,
        b: AttributeReference) => (a, b) }
      val n = cs.collect { case Not(EqualTo(a: AttributeReference,
        b: AttributeReference)) => (a, b) }
      val nn = cs.collect { case IsNotNull(a: AttributeReference) => a }
      val o = cs.filterNot {
        case EqualTo(_: AttributeReference, _: AttributeReference) => true
        case Not(EqualTo(_: AttributeReference, _: AttributeReference)) => true
        case IsNotNull(_: AttributeReference) => true // validated below
        case _ => false
      }
      (e, n, nn, o)
    }
    if (eqs.size != 1 || neqs.size != 1 || others.nonEmpty) return None
    val (l, r) = (jn.left, jn.right)
    if (!l.sameResult(r)) return None
    if (!l.collect { case n => n.expressions.forall(_.deterministic) }
      .forall(identity)) return None
    def orient(pair: (Attribute, Attribute)): Option[(Attribute, Attribute)] = {
      val (a, b) = pair
      if (l.outputSet.contains(a) && r.outputSet.contains(b)) Some((a, b))
      else if (l.outputSet.contains(b) && r.outputSet.contains(a)) Some((b, a))
      else None
    }
    val (k1, k2) = orient(eqs.head).getOrElse(return None)
    val (w1, w2) = orient(neqs.head).getOrElse(return None)
    // IsNotNull conjuncts are only redundant when they cover the eq/neq
    // columns themselves; an isnotnull over a THIRD column is a real
    // predicate the min/max form would silently drop — disqualify
    val eqNeqIds = Set(k1, k2, w1, w2).map(_.exprId)
    if (!notNulls.forall(a => eqNeqIds.contains(a.exprId))) return None
    // k and w must be the SAME column of the shared relation on both
    // sides — output position is the identity that survives sameResult
    def pos(side: LogicalPlan, a: Attribute): Int =
      side.output.indexWhere(_.exprId == a.exprId)
    if (pos(l, k1) != pos(r, k2) || pos(l, w1) != pos(r, w2)) return None
    if (pos(l, k1) < 0 || pos(l, w1) < 0) return None
    // the context consumes only the key (either side's incarnation)
    val keyIds = Set(k1.exprId, k2.exprId)
    val projOk = proj.projectList.forall {
      case a: AttributeReference => keyIds.contains(a.exprId)
      case Alias(a: AttributeReference, _) => keyIds.contains(a.exprId)
      case _ => false
    }
    if (!projOk) return None

    val minA = Alias(Min(w1).toAggregateExpression(), "__graft_min_w")()
    val maxA = Alias(Max(w1).toAggregateExpression(), "__graft_max_w")()
    val agg = Aggregate(Seq(k1), Seq(k1.asInstanceOf[NamedExpression],
      minA, maxA), l)
    val having = Filter(And(IsNotNull(k1),
      Not(EqualTo(minA.toAttribute, maxA.toAttribute))), agg)
    // reproduce the consumed output attrs: k2's incarnation aliases k1
    // under k2's own exprId so references above stay valid
    val outList = proj.projectList.map {
      case a: AttributeReference if a.exprId == k1.exprId => a
      case a: AttributeReference => Alias(k1, a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) if a.exprId != k1.exprId =>
        Alias(k1, name)(exprId = al.exprId, qualifier = al.qualifier,
          explicitMetadata = Some(al.metadata))
      case other => other
    }
    Some(Project(outList, having))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
