package org.apache.spark.sql.graftglue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation,
  DataSourceV2ScanRelation}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Answer covered aggregates from a materialized ROLLUP instead of the base
 * files — the aggregate-shaped half of transparent projection routing (the
 * reference server picks semi-sorted projections for scans,
 * /root/reference/vastdb/table.py:274-309; this picks pre-aggregated ones
 * for GROUP BYs). At 100 TB the difference is the whole query: a nightly
 * `SELECT dim, sum(m) FROM fact GROUP BY dim` stops re-reading the fact
 * table and reads a few thousand pre-merged rows.
 *
 * Runs in the "User Provided Optimizers" batch (self-registered on the
 * session by [[GraftSqlCatalog]], same mechanism as the changefeed pushdown
 * rule), i.e. AFTER V2ScanRelationPushDown — so the matched shape is the
 * final `Aggregate [→ Project] [→ Filter] → DataSourceV2ScanRelation` and
 * the emitted child is a ready-built parquet scan relation over the rollup
 * (a new `DataSourceV2Relation` here would never get scan-converted).
 *
 * Routes ONLY when every piece is provably answerable from decomposable
 * partials, else leaves the plan untouched:
 *  - grouping expressions are plain columns ⊆ the rollup's group columns
 *    (any SUBSET re-aggregates correctly — partial merges are associative);
 *  - residual filters reference group columns only (applied to rollup rows,
 *    where they select exactly the same groups) and carry no subqueries;
 *  - aggregate calls are DISTINCT-free, FILTER-free sum/count/min/max/avg
 *    over plain measure columns (or count(*)), rewritten as merges:
 *    sum→SUM(__sum_m), count→SUM(__cnt_m) (0 for no groups), min/max→
 *    MIN/MAX over the stored extrema, avg→SUM(__sum_m)/SUM(__cnt_m);
 *  - avg is restricted to non-decimal numerics (decimal avg carries
 *    Spark-version-specific precision/scale promotion — never worth a
 *    silently-different result).
 *
 * Output attribute ids of the original Aggregate are preserved via aliases,
 * so parent operators (sorts, joins, havings) re-resolve untouched. The
 * table only ever reaches this rule when the rollup was FRESH at load time
 * (DML stales rollups under the same manifest CAS as projections), so a
 * routed answer is exactly the base-table answer.
 */
/** Implemented by every catalog table shape that can carry FRESH rollups
  * for [[AggProjectionRewrite]]: (meta, resolved data dir) pairs. */
private[graftglue] trait HasAggRollups {
  def aggRollups: Seq[(graft.api.Manifest.AggProjectionMeta, String)]
  def name(): String
}

object AggProjectionRewrite extends Rule[LogicalPlan] {

  /** (table, rollup) of the most recent route — observability for specs. */
  private[graftglue] val lastRouted =
    new java.util.concurrent.atomic.AtomicReference[(String, String)]

  def register(session: SparkSession): Unit = synchronized {
    if (!session.experimental.extraOptimizations.contains(this))
      session.experimental.extraOptimizations =
        session.experimental.extraOptimizations :+ this
  }

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.aggProjection.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }
  }

  /** Strip column-pruning Projects (pass-through attributes only) and at
    * most one residual Filter above the scan relation. */
  private def unwrap(p: LogicalPlan)
      : Option[(Option[Expression], DataSourceV2ScanRelation)] = p match {
    case sr: DataSourceV2ScanRelation => Some((None, sr))
    case Filter(c, inner) => unwrap(inner) match {
      case Some((None, sr)) => Some((Some(c), sr))
      case _ => None // two filters never survive CombineFilters; bail
    }
    case Project(pl, inner) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(inner)
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (cond, sr) = unwrap(agg.child) match {
      case Some((c, s)) => (c, s)
      case None => return None
    }
    val zt = sr.relation.table match {
      case z: HasAggRollups if z.aggRollups.nonEmpty => z
      case _ => return None
    }
    // grouping must be plain columns; record name → original attribute
    val groupAttrs: Seq[AttributeReference] = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    // no subqueries in the residual filter (their semantics are planned
    // against the base relation; re-parenting them is not worth the risk)
    if (cond.exists(_.exists(_.isInstanceOf[PlanExpression[_]]))) return None
    val filterRefs = cond.map(_.references.map(_.name).toSet)
      .getOrElse(Set.empty)

    // candidate rollups covering groups + filters; fewest dims = fewest
    // rollup rows to merge
    val candidates = zt.aggRollups.filter { case (m, _) =>
      val dims = m.groupColumns.toSet
      // recorded schema must still carry every dim (metadata and files can
      // only diverge transiently; never route through a mismatch)
      val recorded = try DataType.fromJson(m.schemaJson)
          .asInstanceOf[StructType].fieldNames.toSet
        catch { case _: Exception => Set.empty[String] }
      groupAttrs.forall(a => dims(a.name)) && filterRefs.subsetOf(dims) &&
        m.groupColumns.forall(recorded)
    }.sortBy(_._1.groupColumns.size)

    candidates.view.flatMap { case (meta, dataDir) =>
      val rollupSchema =
        DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
      val fieldByName = rollupSchema.fields.map(f => f.name -> f).toMap
      // fresh output attributes for the rollup relation, fixed here so the
      // rewritten expressions and the scan output agree object-for-object
      val rollupAttrs = DataTypeUtils.toAttributes(rollupSchema)
      val attrOf: Map[String, AttributeReference] =
        rollupAttrs.map(a => a.name -> a).toMap

      def partial(prefix: String, m: String): Option[AttributeReference] =
        fieldByName.get(prefix + m).map(f => attrOf(f.name))
      def merged(f: AggregateFunction): Expression =
        AggregateExpression(f, Complete, isDistinct = false, None,
          NamedExpression.newExprId)

      // rewrite one aggregate call to a merge over partials, or None
      def rewriteCall(ae: AggregateExpression): Option[Expression] = {
        if (ae.isDistinct || ae.filter.nonEmpty) return None
        ae.aggregateFunction match {
          case c: Count => c.children match {
            case Seq(l: Literal) if l.value != null =>
              partial("__", "rows").map(p =>
                Coalesce(Seq(merged(Sum(p)), Literal(0L))))
            case Seq(a: AttributeReference) =>
              partial("__cnt_", a.name).map(p =>
                Coalesce(Seq(merged(Sum(p)), Literal(0L))))
            case _ => None
          }
          case s: Sum => s.child match {
            case a: AttributeReference => partial("__sum_", a.name).map { p =>
              val m = merged(Sum(p))
              if (m.dataType == ae.dataType) m else Cast(m, ae.dataType)
            }
            case _ => None
          }
          case m: Min => m.child match {
            case a: AttributeReference =>
              partial("__min_", a.name).map(p => merged(Min(p)))
            case _ => None
          }
          case m: Max => m.child match {
            case a: AttributeReference =>
              partial("__max_", a.name).map(p => merged(Max(p)))
            case _ => None
          }
          case av: Average => av.child match {
            case a: AttributeReference
                if a.dataType.isInstanceOf[NumericType] &&
                  !a.dataType.isInstanceOf[DecimalType] =>
              for { s <- partial("__sum_", a.name)
                    c <- partial("__cnt_", a.name) }
                yield Divide(Cast(merged(Sum(s)), DoubleType),
                  Cast(merged(Sum(c)), DoubleType))
            case _ => None
          }
          case _ => None
        }
      }

      def rewriteExpr(e: Expression): Option[Expression] = {
        var ok = true
        val out = e.transformUp {
          case ae: AggregateExpression =>
            rewriteCall(ae) match {
              case Some(r) => r
              case None => ok = false; ae
            }
          case a: AttributeReference if attrOf.contains(a.name) => attrOf(a.name)
        }
        // any surviving base-relation attribute means something wasn't
        // rewritable (unsupported agg, non-dim reference) — no route
        if (ok && out.references.forall(r =>
            attrOf.get(r.name).exists(_.exprId == r.exprId))) Some(out)
        else None
      }

      val newGroups = groupAttrs.map(a => attrOf(a.name))
      val newCond = cond.map(c => rewriteExpr(c) match {
        case Some(r) => r
        case None => return None // filter not rewritable → whole query bails
      })
      val newResults: Option[Seq[NamedExpression]] =
        traverse(agg.aggregateExpressions) {
          case a: AttributeReference =>
            rewriteExpr(a).map(r => Alias(r, a.name)(exprId = a.exprId))
          case al: Alias =>
            rewriteExpr(al.child).map(r => Alias(r, al.name)(exprId = al.exprId))
          case _ => None
        }

      newResults.map { results =>
        // build the rollup parquet scan, pruned to what the plan reads and
        // with the residual filter pushed for row-group skipping
        val needed: Seq[AttributeReference] = {
          val refs = AttributeSet(
            results.flatMap(_.references) ++
              newCond.toSeq.flatMap(_.references) ++ newGroups)
          rollupAttrs.filter(refs.contains)
        }
        val pt = ParquetTable(s"${zt.name}$$${meta.name}",
          SparkSession.active, CaseInsensitiveStringMap.empty(),
          List(dataDir), Some(rollupSchema), classOf[ParquetFileFormat])
        val sb = pt.newScanBuilder(CaseInsensitiveStringMap.empty())
          .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder]
        newCond.foreach(c => sb.pushFilters(Seq(c)))
        sb.pruneColumns(StructType(needed.map(a => fieldByName(a.name))))
        val scan = sb.build()
        val rel = DataSourceV2Relation(pt, rollupAttrs, None, None,
          CaseInsensitiveStringMap.empty())
        val scanRel = DataSourceV2ScanRelation(rel, scan, needed)
        val filtered = newCond.map(Filter(_, scanRel)).getOrElse(scanRel)
        lastRouted.set((zt.name, meta.name))
        Aggregate(newGroups, results, filtered)
      }
    }.headOption
  }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = Seq.newBuilder[B]
    for (x <- xs) f(x) match {
      case Some(b) => out += b
      case None => return None
    }
    Some(out.result())
  }
}
