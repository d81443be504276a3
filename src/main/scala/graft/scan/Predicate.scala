package graft.scan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Pushdown predicate grammar with reference-parity validation.
 *
 * The reference SDK compiles ibis predicates to a wire IR with a restricted
 * shape: an AND of OR-groups where each OR-group references a single column
 * (vastdb docs/predicate.md:5-27, vastdb/_internal.py:190-325). Spark accepts
 * arbitrary boolean trees — a strict superset — so the engine executes
 * everything, but `Predicate.validate` reproduces the reference's rejections
 * so callers can opt into wire-compatible behavior:
 *   - OR across different columns → rejected (vastdb/_internal.py:280-283)
 *   - NOT only legal over IS NULL (vastdb/_internal.py:241-246)
 *   - contains() cannot be negated or OR-ed with another column's predicate
 *     (vastdb/tests/test_tables.py:1089-1133)
 *   - isnull on list/map/struct-as-a-whole → rejected
 *     (vastdb/tests/test_nested.py:226-247)
 *
 * Compilation to Spark `Column` keeps the reference's rewrites where they
 * still pay at scale (startswith → UTF-8 byte-range for sorted-data
 * zone-map pruning, vastdb/util.py:162-169).
 */
sealed trait Pred {
  /** Columns referenced (root column name for nested paths). */
  def roots: Set[String]
}

object Pred {
  /** A column reference; nested struct access uses dotted path segments
    * (reference walks StructField ops, vastdb/_internal.py:269-305). */
  final case class Ref(path: Seq[String]) {
    require(path.nonEmpty)
    def root: String = path.head
    def col: Column = org.apache.spark.sql.functions.col(path.mkString("."))
  }
  object Ref { def apply(name: String): Ref = Ref(name.split('.').toSeq) }

  final case class Eq(ref: Ref, v: Any) extends Pred { def roots = Set(ref.root) }
  final case class Ne(ref: Ref, v: Any) extends Pred { def roots = Set(ref.root) }
  final case class Lt(ref: Ref, v: Any) extends Pred { def roots = Set(ref.root) }
  final case class Le(ref: Ref, v: Any) extends Pred { def roots = Set(ref.root) }
  final case class Gt(ref: Ref, v: Any) extends Pred { def roots = Set(ref.root) }
  final case class Ge(ref: Ref, v: Any) extends Pred { def roots = Set(ref.root) }
  final case class IsIn(ref: Ref, vs: Seq[Any]) extends Pred { def roots = Set(ref.root) }
  final case class IsNull(ref: Ref) extends Pred { def roots = Set(ref.root) }
  final case class Between(ref: Ref, lo: Any, hi: Any) extends Pred { def roots = Set(ref.root) }
  final case class StartsWith(ref: Ref, prefix: String) extends Pred { def roots = Set(ref.root) }
  final case class Contains(ref: Ref, substr: String) extends Pred { def roots = Set(ref.root) }
  final case class Not(p: Pred) extends Pred { def roots = p.roots }
  final case class And(ps: Seq[Pred]) extends Pred { def roots = ps.flatMap(_.roots).toSet }
  final case class Or(ps: Seq[Pred]) extends Pred { def roots = ps.flatMap(_.roots).toSet }
  case object True extends Pred { def roots = Set.empty }
  case object False extends Pred { def roots = Set.empty }

  final case class UnsupportedPredicate(msg: String)
    extends IllegalArgumentException(msg)

  /** Flatten nested And/Or chains (reference `_flatten_args`,
    * vastdb/_internal.py:166-171). */
  def flatten(p: Pred): Pred = p match {
    case And(ps) =>
      val fs = ps.map(flatten).flatMap { case And(qs) => qs; case q => Seq(q) }
      if (fs.size == 1) fs.head else And(fs)
    case Or(ps) =>
      val fs = ps.map(flatten).flatMap { case Or(qs) => qs; case q => Seq(q) }
      if (fs.size == 1) fs.head else Or(fs)
    case Not(q) => Not(flatten(q))
    case other => other
  }

  /** Reference-parity shape check: AND of OR-groups, one column per group. */
  def validate(p: Pred): Unit = {
    def leafCheck(l: Pred, negated: Boolean, inOr: Boolean): Unit = l match {
      case Not(q) =>
        q match {
          case _: IsNull => leafCheck(q, negated = true, inOr)
          case _ => throw UnsupportedPredicate(
            "NOT is only supported over IS NULL (reference _internal.py:241-246)")
        }
      case Contains(_, _) if negated =>
        throw UnsupportedPredicate("contains() cannot be negated")
      case _ => ()
    }
    flatten(p) match {
      case And(groups) => groups.foreach(validateOrGroup)
      case other => validateOrGroup(other)
    }
    def validateOrGroup(g: Pred): Unit = g match {
      case Or(ls) =>
        if (ls.flatMap(_.roots).toSet.size > 1)
          throw UnsupportedPredicate(
            "OR across different columns is not pushdown-compatible " +
              "(reference _internal.py:280-283)")
        if (ls.exists { case Contains(_, _) => true; case _ => false } && ls.size > 1)
          throw UnsupportedPredicate(
            "contains() cannot participate in OR (tests/test_tables.py:1089-1133)")
        ls.foreach(leafCheck(_, negated = false, inOr = true))
      case And(_) => throw UnsupportedPredicate("nested AND after flatten — bug")
      case l => leafCheck(l, negated = false, inOr = false)
    }
  }

  /** UTF-8 prefix → [lo, hi) range used by the reference to turn startswith
    * into two comparisons that sorted-data zone maps can prune
    * (vastdb/util.py:162-169 `prefix_to_range`). Returns None when the
    * prefix has no upper bound (all 0xFF) or is empty. */
  def prefixToRange(prefix: String): Option[(String, String)] = {
    if (prefix.isEmpty) return None
    val bytes = prefix.getBytes("UTF-8")
    var i = bytes.length - 1
    while (i >= 0 && (bytes(i) & 0xFF) == 0xFF) i -= 1
    if (i < 0) None
    else {
      val hi = java.util.Arrays.copyOf(bytes, i + 1)
      hi(i) = (hi(i) + 1).toByte
      val s = new String(hi, "UTF-8")
      // the increment can produce invalid UTF-8 (reference works on raw
      // bytes); if the bound doesn't survive a String round-trip, skip the
      // range rewrite — the residual startsWith keeps exactness either way
      if (java.util.Arrays.equals(s.getBytes("UTF-8"), hi)) Some((prefix, s))
      else None
    }
  }

  /** Compile to a Spark Column (no shape restriction — Spark superset). */
  def compile(p: Pred): Column = p match {
    case Eq(r, v) => r.col === lit(v)
    case Ne(r, v) => r.col =!= lit(v)
    case Lt(r, v) => r.col < lit(v)
    case Le(r, v) => r.col <= lit(v)
    case Gt(r, v) => r.col > lit(v)
    case Ge(r, v) => r.col >= lit(v)
    case IsIn(r, vs) => r.col.isin(vs: _*)
    case IsNull(r) => r.col.isNull
    case Between(r, lo, hi) => r.col >= lit(lo) && r.col <= lit(hi)
    case StartsWith(r, pfx) =>
      // Range rewrite (not Spark's StartsWith) so a range-partitioned /
      // sorted table prunes row groups on min/max stats; the residual
      // startsWith is kept for exactness past the first code point.
      prefixToRange(pfx) match {
        case Some((lo, hi)) => r.col >= lit(lo) && r.col < lit(hi) && r.col.startsWith(pfx)
        case None if pfx.isEmpty => r.col.isNotNull // reference: startswith('') → is_valid
        case None => r.col.startsWith(pfx)
      }
    case Contains(r, s) => r.col.contains(s)
    case Not(q) => !compile(q)
    case And(ps) => ps.map(compile).reduce(_ && _)
    case Or(ps) => ps.map(compile).reduce(_ || _)
    case True => lit(true)
    case False => lit(false)
  }

  /** Validate (reference parity) then compile. */
  def compileStrict(p: Pred): Column = { validate(p); compile(p) }
}
