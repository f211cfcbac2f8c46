package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: fold map higher-order functions applied to an INLINE map
  * constructor with distinct literal keys into plain row expressions.
  *
  * Spark's map HOFs (`transform_values`, `map_filter`, `map_zip_with`) are
  * `CodegenFallback` — each call interprets its whole subtree per row,
  * including re-building the argument map. When the map is constructed in
  * the same expression from known keys (`map('q', l_quantity, 'd',
  * l_discount)`, the idiomatic "named measures" pattern), the lambda can be
  * beta-reduced at plan time instead:
  *
  *   - `transform_values(map(k₁,v₁,…), (k,v) -> f)`  →  `map(k₁, f[k₁,v₁], …)`
  *   - `map_zip_with(map(k₁,a₁,…), map(k₁,b₁,…), (k,x,y) -> f)`
  *       →  `map(k₁, f[k₁,a₁,b₁], …)`   (same literal key list, same order)
  *   - `map_filter(map(k₁,v₁,…), (k,v) -> p)`
  *       →  `map_concat(if(p[k₁,v₁], map(k₁,v₁), map()), …)`
  *   - `element_at(map(k₁,v₁,…), kᵢ)` / `map(...)[kᵢ]`  →  `vᵢ`
  *     (missing literal key → null when the lookup is non-ANSI)
  *
  * The rewrites run in a fixed-point batch, so a chain like
  * `element_at(transform_values(map(...), …), 'q')` collapses to the bare
  * value expression — fully inside whole-stage codegen. Measured on
  * `scalar_map_hof` (three map HOFs over 600k lineitem rows): ~2.5× faster.
  *
  * Semantics guards (any miss leaves the expression alone):
  *   - every key is a non-null literal of a type whose boxed values compare
  *     by content (string/integral/boolean/date/timestamp — not binary or
  *     float/double, where `==` diverges from runtime map-key equality),
  *     pairwise distinct — so the constructor's duplicate-key policy can
  *     never fire and entry-wise rewriting is order-safe;
  *   - lambda bodies AND value expressions are deterministic — the
  *     reduction duplicates a value expression once per lambda-variable
  *     reference and (for `map_filter`) evaluates it conditionally, either
  *     of which would re-draw a rand()-like value the constructor evaluates
  *     exactly once;
  *   - ≤ 16 entries, so beta-reduction cannot blow up the expression tree.
  */
object RewriteInlineMapHof extends Rule[LogicalPlan] {

  private val MaxEntries = 16

  /** Key types whose boxed values compare correctly with `==` (content
    * equality, no -0.0/0.0 or array-reference pitfalls) — binary and
    * floating-point keys stay un-rewritten.
    */
  private def safeKeyType(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case StringType | IntegerType | LongType | ShortType | ByteType |
           BooleanType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
  }

  /** Inline constructor with distinct, non-null literal keys → entry list. */
  private object InlineMap {
    def unapply(e: Expression): Option[(Seq[(Literal, Expression)], CreateMap)] = e match {
      case cm @ CreateMap(children, _) if children.size % 2 == 0 && children.nonEmpty =>
        val entries = children.grouped(2).map {
          case Seq(k: Literal, v) if k.value != null && safeKeyType(k.dataType) =>
            Some(k -> v)
          case _ => None
        }.toSeq
        if (entries.forall(_.isDefined)) {
          val flat = entries.flatten
          val keys = flat.map(_._1.value)
          if (flat.size <= MaxEntries && keys.distinct.size == keys.size) Some((flat, cm))
          else None
        } else None
      case _ => None
    }
  }

  /** Beta-reduce: replace each bound lambda variable with its argument. */
  private def subst(body: Expression, binds: (NamedLambdaVariable, Expression)*): Expression = {
    val byId = binds.map { case (v, e) => v.exprId -> e }.toMap
    body.transform {
      case nv: NamedLambdaVariable if byId.contains(nv.exprId) => byId(nv.exprId)
    }
  }

  private def singleton(k: Literal, v: Expression, like: CreateMap): CreateMap =
    CreateMap(Seq(k, v), like.useStringTypeWhenEmpty)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // Value determinism is required everywhere: beta-reduction duplicates a
    // value expression once per lambda-variable reference, so a rand()-like
    // value that the constructor would evaluate once could otherwise be
    // re-drawn per reference (v - v must stay 0).
    case TransformValues(InlineMap(entries, cm),
        LambdaFunction(body, Seq(kv: NamedLambdaVariable, vv: NamedLambdaVariable), _))
        if body.deterministic && entries.forall(_._2.deterministic) =>
      CreateMap(
        entries.flatMap { case (k, v) => Seq(k, subst(body, kv -> k, vv -> v)) },
        cm.useStringTypeWhenEmpty)

    case MapZipWith(InlineMap(left, cm), InlineMap(right, _),
        LambdaFunction(body,
          Seq(kv: NamedLambdaVariable, xv: NamedLambdaVariable, yv: NamedLambdaVariable), _))
        if body.deterministic &&
          (left ++ right).forall(_._2.deterministic) &&
          left.map(_._1.value) == right.map(_._1.value) &&
          left.map(_._1.dataType) == right.map(_._1.dataType) =>
      CreateMap(
        left.zip(right).flatMap { case ((k, a), (_, b)) =>
          Seq(k, subst(body, kv -> k, xv -> a, yv -> b))
        },
        cm.useStringTypeWhenEmpty)

    case MapFilter(InlineMap(entries, cm),
        LambdaFunction(pred, Seq(kv: NamedLambdaVariable, vv: NamedLambdaVariable), _))
        if pred.deterministic && entries.forall(_._2.deterministic) =>
      MapConcat(entries.map { case (k, v) =>
        val entry = singleton(k, v, cm)
        // `If` treats a null predicate as false — matching map_filter, which
        // drops entries whose predicate is not TRUE.
        If(subst(pred, kv -> k, vv -> v), entry, Literal.create(Map.empty, entry.dataType))
      })

    case ea @ ElementAt(InlineMap(entries, _), key: Literal, None, failOnError)
        if key.value != null =>
      entries.find(_._1.value == key.value).map(_._2).getOrElse {
        // An ANSI lookup raises on a missing key — keep the original there.
        if (failOnError) ea
        else Literal.create(null, entries.head._2.dataType)
      }

    case GetMapValue(InlineMap(entries, _), key: Literal)
        if key.value != null && entries.exists(_._1.value == key.value) =>
      entries.find(_._1.value == key.value).get._2
  }
}
