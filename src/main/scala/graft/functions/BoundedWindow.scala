package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Global windows over relations that are BOUNDED BY CONSTRUCTION.
  *
  * An empty partition spec makes `WindowExec` log `No Partition Defined for
  * Window operation!` on every planning — correct advice for a corpus-sized
  * relation (the whole input moves to one task), but noise for this repo's
  * four audited global windows, which all run over relations whose size is
  * fixed by construction, never by the corpus:
  *
  *   - zipf tier relation (one row per DISTINCT token frequency),
  *   - pack/budget bucket prefix sums (one row per bucket, |buckets| held
  *     ~1e5 by scaling bucketSize with the corpus),
  *   - `searchFormatted`'s post-`limit(k)` rank (≤ k rows).
  *
  * A bench run accumulated 156 such warnings — enough to bury the one
  * warning that would matter if a future edit introduced a genuinely
  * unpartitioned corpus window. Routing the audited sites through this
  * helper partitions by a constant-ZERO key instead: results are identical
  * (every row still carries the same key, so one task holds the whole
  * relation — exactly `SinglePartition` — and per-partition ordering is
  * unchanged), the plan keeps a non-empty partition spec so the warning no
  * longer fires, and the helper's name records WHY the single task is safe
  * at the call site. Net effect: a "No Partition Defined" line in a bench
  * log is now a real finding, not known noise.
  *
  * The key must SURVIVE THE OPTIMIZER: Spark 4's `EliminateWindowPartitions`
  * rule strips foldable window partition expressions, and the simplifier
  * also folds `length(x) * 0` down to a constant — both forms collapsed
  * back to the empty spec (verified on the zipf plan; the warning
  * survived). `pmod(length(tag), 1)` is not simplified (verified: the
  * optimized plan keeps the `_w0` key and results equal the global-window
  * form), and the `coalesce` guards a null tag row (`pmod` of null is null
  * — a second key group would split the prefix sum). Per-row cost is one
  * length+pmod on a bounded relation — noise.
  */
object BoundedWindow {
  /** Window over a bounded relation: single task by design, warning-free.
    * `tag` is any column of the relation (used only to make the
    * constant-zero key non-foldable; it never affects the result). */
  def boundedGlobal(tag: Column, order: Column*): WindowSpec = {
    // a FOLDABLE tag (lit(...), or any expression over literals only)
    // folds the whole key and EliminateWindowPartitions re-empties the
    // spec — the warning comes back silently; four call sites had drifted
    // onto lits before this guard existed (round-11 audit). Round-11
    // ADVICE #4: matching the node class caught only a direct lit(), so
    // check the real property instead — the tag tree must REFERENCE a
    // column (an expression with no attribute reference is exactly what
    // the constant folder collapses)
    require(refsColumn(tag.node),
      "boundedGlobal tag must reference a real column of the relation — " +
        s"'$tag' folds to a constant and the partition spec " +
        "would be silently eliminated")
    Window.partitionBy(
      coalesce(pmod(length(tag.cast("string")).cast("long"), lit(1L)), lit(0L)))
      .orderBy(order: _*)
  }

  /** True iff the Column's node tree contains an attribute reference —
    * the property that keeps it out of the constant folder's reach. The
    * ColumnNode hierarchy is sql-private at the Scala level (JVM-public),
    * so the walk goes through reflection on the class name + `children()`
    * — the same shape `ColumnNodeLike.collect` would give us. */
  private def refsColumn(node: AnyRef): Boolean = {
    val cn = node.getClass.getSimpleName.stripSuffix("$")
    // SqlExpression (expr("…")) is OPAQUE here — its column references
    // live in unparsed SQL text, not children(), so a genuinely
    // column-backed expr("some_col") tag was false-rejected (round-12
    // ADVICE). Accept it: the guard errs toward admitting (a literal-only
    // expr("1") would fold and merely restore the known warning — the
    // pre-guard failure mode), never toward rejecting a valid tag.
    if (cn == "UnresolvedAttribute" || cn == "UnresolvedStar" ||
      cn == "UnresolvedRegex" || cn == "SqlExpression") true
    else
      (try Option(node.getClass.getMethod("children"))
      catch { case _: NoSuchMethodException => None })
        .exists { m =>
          m.setAccessible(true)
          m.invoke(node).asInstanceOf[Seq[AnyRef]].exists(refsColumn)
        }
  }
}
