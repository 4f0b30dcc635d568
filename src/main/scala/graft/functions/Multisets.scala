package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL-standard MULTISET set operators over array columns.
  *
  * The reference exposes MULTISET EXCEPT / UNION / INTERSECT, each with ALL
  * and DISTINCT variants (reference: core/src/main/java/org/apache/calcite/
  * sql/fun/SqlMultisetSetOperator.java; SqlStdOperatorTable MULTISET_UNION
  * et al.), plus the predicates MEMBER OF / SUBMULTISET OF / IS A SET
  * (SqlStdOperatorTable:2033-2206). The committed goldens
  * (core/src/test/resources/sql/operator.iq:69-166) pin the bag semantics:
  * the bare operators default to ALL; EXCEPT ALL removes the first k
  * occurrences of an element given k right-side occurrences; INTERSECT ALL
  * keeps min-multiplicity occurrences in left order; UNION DISTINCT emits
  * the sorted distinct union.
  *
  * Everything here is a composition of codegen'd higher-order array
  * expressions — no UDFs, so the operators stay inside whole-stage codegen
  * and distribute like any other projection at scale.
  */
object Multisets {

  /** Occurrences of x in arr (null-safe equality). */
  private def occ(arr: Column, x: Column): Column =
    size(filter(arr, y => y <=> x))

  /** 1-based occurrence index of the element at 0-based position i of l. */
  private def occIdx(l: Column, x: Column, i: Column): Column =
    occ(slice(l, lit(1), i + 1), x)

  /** MULTISET EXCEPT [ALL]: bag difference. Element counts subtract; the
    * first k occurrences are removed (operator.iq:69-89 — ['a','c','a']
    * EXCEPT ['a'] = ['c','a']). */
  def multisetExceptAll(l: Column, r: Column): Column =
    filter(l, (x, i) => occIdx(l, x, i) > occ(r, x))

  /** MULTISET EXCEPT DISTINCT: set difference, left first-occurrence order
    * (operator.iq:91-100). */
  def multisetExceptDistinct(l: Column, r: Column): Column =
    array_except(l, r)

  /** MULTISET UNION [ALL]: bag concatenation (operator.iq:102-122). */
  def multisetUnionAll(l: Column, r: Column): Column =
    concat(l, r)

  /** MULTISET UNION DISTINCT: sorted distinct union (operator.iq:124-133 —
    * ['a','c','b'] UNION DISTINCT ['a'] = ['a','b','c']). */
  def multisetUnionDistinct(l: Column, r: Column): Column =
    sort_array(array_distinct(concat(l, r)))

  /** MULTISET INTERSECT [ALL]: bag intersection, min multiplicity, left
    * order (operator.iq:135-155). */
  def multisetIntersectAll(l: Column, r: Column): Column =
    filter(l, (x, i) => occIdx(l, x, i) <= occ(r, x))

  /** MULTISET INTERSECT DISTINCT: set intersection, left first-occurrence
    * order (operator.iq:157-166). */
  def multisetIntersectDistinct(l: Column, r: Column): Column =
    array_intersect(l, r)

  /** x MEMBER OF m (SqlStdOperatorTable MEMBER_OF). */
  def memberOf(x: Column, m: Column): Column =
    exists(m, y => y <=> x)

  /** l SUBMULTISET OF r: every element's multiplicity in l is <= its
    * multiplicity in r (SqlStdOperatorTable SUBMULTISET_OF). */
  def submultisetOf(l: Column, r: Column): Column =
    forall(array_distinct(l), x => occ(l, x) <= occ(r, x))

  /** m IS A SET: no element occurs more than once. */
  def isASet(m: Column): Column =
    size(array_distinct(m)) === size(m)
}
