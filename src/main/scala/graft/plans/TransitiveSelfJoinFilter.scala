package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.internal.SQLConf

/** Opt-in transitive join-filter — the qds72 week-set rewrite.
  *
  * TPC-DS q72 (reference: tpcds/queries/1/q72.sql) joins date_dim three
  * times; the only static date predicate sits on d1 (`d1.d_year = ...`)
  * while the 344M-row inventory scan is constrained only TRANSITIVELY
  * through `d1.d_week_seq = d2.d_week_seq` — d2 itself carries no static
  * predicate, so Spark's InjectRuntimeFilter structurally cannot prune
  * inventory's join (it requires a selective static predicate on the
  * creation side; verified with the size gate zeroed — SCALE.md "Why
  * qds72 cannot be pruned further"). The reference's planner performs no
  * such rewrite either; this is an above-reference optimization, OFF by
  * default.
  *
  * Mechanism. For an INNER join with equality `a = b`:
  *
  *  - Soundness: semi-joining `b`'s side against ANY superset of the
  *    `a` values entering the join is purely reductive — every surviving
  *    joined row satisfies `b = a` for some `a`-row, so rows removed by
  *    the semi-join could never have joined. No relationship between the
  *    two sides is required for correctness.
  *  - The superset used: the SLICE of `a`'s side rooted at the node that
  *    produces `a` (join-free: a pure dimension pipeline of
  *    Project/Filter/Aggregate over one leaf). Ignoring the rest of
  *    `a`'s side can only widen the value set — still a superset.
  *  - Profitability gate (this is where the self-join intuition lives,
  *    as a cost heuristic rather than a soundness condition): the slice
  *    must carry a static selective literal predicate (e.g. d_year =
  *    1998 pushed down into d1's pipeline) OR an already-injected
  *    reduction, and `b`'s own producing slice must carry neither (else
  *    the rewrite is redundant); slices must be deterministic, few-leaf,
  *    and join-free except for injected semi-joins, so the build is
  *    always a small filtered dimension AQE will broadcast.
  *  - Chaining: because an injected reduction makes its slice count as
  *    selective, the rewrite propagates across the rule's fixed-point
  *    batch without any join reordering: iteration 1 reduces d2 by d1's
  *    week set; iteration 2 sees the inv_date_sk = d2.d_date_sk
  *    equality with a now-selective d2 and semi-joins the inventory
  *    slice itself by the ~1-year date set — the 344M-row relation is
  *    reduced BELOW its sort-merge join, where a broadcast semi probe
  *    replaces most of the sort volume. This is the step Spark's
  *    InjectRuntimeFilter structurally cannot reach (no static predicate
  *    on the creation side) and the rule exists to reach.
  *
  * The injected build side is a fresh-copied subplan (leaf relations via
  * MultiInstanceRelation.newInstance(), aliases re-minted) so attribute
  * ids never collide with the originals.
  *
  * Enable with `spark.graft.transitiveSelfJoinFilter.enabled=true`
  * (session conf). SessionFactory injects the rule unconditionally into
  * `spark.experimental.extraOptimizations` — which run AFTER the main
  * optimizer batches, so pushdown has already placed static predicates
  * inside the producing slices — and the rule no-ops unless the flag is
  * set.
  */
object TransitiveSelfJoinFilter extends Rule[LogicalPlan] {

  val FLAG = "spark.graft.transitiveSelfJoinFilter.enabled"

  /** Marks an injected semi-join so fixed-point re-application skips the
    * already-reduced instance. */
  private val Injected = TreeNodeTag[Boolean]("graft.transitiveSelfJoinFilter")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(FLAG, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val eqs = splitConjuncts(cond).collect {
          case EqualTo(x: AttributeReference, y: AttributeReference) => (x, y)
        }
        // orient each equality: (a = filtered-slice side, b = bare side)
        val candidates = eqs.flatMap { case (x, y) =>
          Seq((x, y), (y, x)).flatMap { case (a, b) =>
            val aLeft = left.outputSet.contains(a)
            val (aSide, bSide) = if (aLeft) (left, right) else (right, left)
            if (aSide.outputSet.contains(a) && bSide.outputSet.contains(b))
              rewriteFor(a, b, aSide, bSide).map(r => (aLeft, r))
            else None
          }
        }
        candidates.headOption match {
          case Some((aLeft, (bPlan, semi))) =>
            val newSide = (if (aLeft) right else left).transformUp {
              case n if n eq bPlan => semi
            }
            if (aLeft) Join(left, newSide, Inner, Some(cond), hint)
            else Join(newSide, right, Inner, Some(cond), hint)
          case None => j
        }
    }
  }

  /** Build the (node-to-replace, replacement) pair if the (a, b) pair
    * passes the soundness + profitability gates. The injected semi-join
    * makes the reduced slice itself count as "selective", so the rule
    * CHAINS across the fixed point: d1 (static filter) reduces d2
    * through `d1.d_week_seq = d2.d_week_seq` on one iteration, and the
    * now-selective d2 reduces inventory through
    * `inv_date_sk = d2.d_date_sk` on the next — the reduction reaches
    * the fact scan without any join reordering. */
  private def rewriteFor(a: AttributeReference, b: AttributeReference,
      aSide: LogicalPlan, bSide: LogicalPlan)
      : Option[(LogicalPlan, LogicalPlan)] = for {
    sliceA <- sliceFor(a, aSide)
    sliceB <- sliceFor(b, bSide)
    if isSelectiveSlice(sliceA)
    if !isSelectiveSlice(sliceB) && injectedJoins(sliceB).isEmpty
  } yield {
    val fresh = freshCopy(sliceA)
    val aFresh = fresh.output(sliceA.output.indexWhere(_.exprId == a.exprId))
    val build = Project(Seq(aFresh), fresh)
    val semi = Join(sliceB, build, LeftSemi,
      Some(EqualTo(b, aFresh)), JoinHint.NONE)
    semi.setTagValue(Injected, true)
    (sliceB, semi)
  }

  /** The MAXIMAL slice-like subplan of `side` containing `attr`'s
    * producer: descend from the root toward the producer until the
    * remaining subtree qualifies as a slice. None if even the producer's
    * own subtree is not slice-like (e.g. an aggregate over a join), or
    * if any node on the path is not attr-value-local (see skippable) —
    * both uses of the slice depend on every skipped node preserving the
    * per-value row mapping. */
  private def sliceFor(attr: AttributeReference,
      side: LogicalPlan): Option[LogicalPlan] = {
    if (!side.outputSet.contains(attr)) return None
    var cur = side
    while (!isSliceLike(cur)) {
      if (!skippable(cur, attr)) return None
      cur.children.find(_.outputSet.contains(attr)) match {
        case Some(c) => cur = c
        case None => return None
      }
    }
    Some(cur)
  }

  /** May this node sit BETWEEN the side's root and the returned slice?
    *
    * Required invariant ("attr-value-local"): removing the input rows
    * whose `attr` value is v removes exactly the node's output rows with
    * value v and leaves every other output row unchanged. The b-side
    * needs it because the semi-join filters BELOW this node (its effect
    * must commute up to the top join unchanged); the a-side needs it so
    * the slice's value set stays a superset of what the node emits into
    * the join.
    *
    * Holds for: Filter and Project (row-local; attr passes through by
    * exprId), Aggregate when attr is a grouping attribute (dropping
    * group v's inputs drops exactly group v's output row), and joins
    * that are purely per-value reductive on the descended input — Inner
    * (removing value-v rows from one input removes exactly the value-v
    * output pairs) and LeftSemi/LeftAnti (descent can only enter the
    * left, preserved, input).
    *
    * Breaks for — and the descent must therefore bail on — Window
    * (surviving rows' rank/row_number shift), Limit/Offset/Sample
    * (different rows admitted), Union (output reuses child-0 exprIds, so
    * descent would cover one branch: the a-side build would NOT be a
    * superset and matching rows would be wrongly dropped), Generate,
    * outer joins (null-extension changes under reduction), and anything
    * else not listed. */
  private def skippable(p: LogicalPlan, attr: AttributeReference): Boolean =
    p match {
      case _: Filter | _: Project => true
      case a: Aggregate =>
        a.groupingExpressions.exists {
          case ar: AttributeReference => ar.exprId == attr.exprId
          case _ => false
        }
      case jn: Join =>
        jn.joinType == Inner || jn.joinType == LeftSemi ||
          jn.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti
      case _ => false
    }

  /** A subplan that is safe AND cheap to fresh-copy as a semi-join
    * build: deterministic, every leaf re-instantiable, at most a few
    * leaves, and the only joins inside are semi-joins this rule
    * injected (so a reduced dimension still counts as a slice, but a
    * fact join never does). */
  private def isSliceLike(p: LogicalPlan): Boolean = {
    val joins = p.collect { case jn: Join => jn }
    val leaves = p.collectLeaves()
    joins.forall(jn => jn.joinType == LeftSemi &&
        jn.getTagValue(Injected).isDefined) &&
      leaves.size <= 4 &&
      leaves.forall(_.isInstanceOf[MultiInstanceRelation]) &&
      p.collect { case n => n.expressions.forall(_.deterministic) }
        .forall(identity)
  }

  private def injectedJoins(p: LogicalPlan): Seq[Join] =
    p.collect { case jn: Join if jn.getTagValue(Injected).isDefined => jn }

  /** Worth propagating from: a static selective literal filter, or a
    * reduction this rule already injected (the chaining case). */
  private def isSelectiveSlice(p: LogicalPlan): Boolean =
    injectedJoins(p).nonEmpty ||
      p.collectFirst { case Filter(fc, _) if isSelective(fc) => () }.isDefined

  /** A filter worth propagating: at least one conjunct comparing against
    * literals (IsNotNull alone prunes nothing). */
  private def isSelective(fc: Expression): Boolean =
    splitConjuncts(fc).exists {
      case _: IsNotNull => false
      case e: BinaryComparison => e.children.exists(_.isInstanceOf[Literal])
      case In(_, list) => list.forall(_.isInstanceOf[Literal])
      case _: InSet => true
      case StartsWith(_, _: Literal) => true
      case _ => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Deep copy of a subplan with every attribute re-instantiated — leaf
    * relations via MultiInstanceRelation.newInstance(), Aliases re-minted
    * with fresh ExprIds — so the copy can live in the same tree as the
    * original without attribute-id collisions. */
  private def freshCopy(plan: LogicalPlan): LogicalPlan = {
    val mapping = scala.collection.mutable.Map.empty[ExprId, Attribute]
    plan.transformUp {
      case leaf: LeafNode =>
        val fresh = leaf.asInstanceOf[MultiInstanceRelation].newInstance()
          .asInstanceOf[LogicalPlan]
        leaf.output.zip(fresh.output).foreach { case (o, n) =>
          mapping(o.exprId) = n
        }
        fresh
      case node =>
        node.transformExpressionsDown {
          case ar: AttributeReference if mapping.contains(ar.exprId) =>
            mapping(ar.exprId)
          case al: Alias =>
            val na = Alias(al.child, al.name)(
              qualifier = al.qualifier,
              explicitMetadata = Some(al.metadata))
            mapping(al.exprId) = na.toAttribute
            na
        }
    }
  }
}
