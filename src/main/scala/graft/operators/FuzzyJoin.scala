package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Candidate generation for bounded edit-distance (fuzzy) joins.
  *
  * The FastSS / SymSpell principle (Bocek et al. 2007, "Fast
  * Similarity Search in Large Dictionaries"): if edit distance
  * between a and b is ≤ τ, then aligning the pair and dropping the
  * ≤ τ edited characters on each side leaves a common subsequence —
  * i.e. the deletion neighborhoods U_τ(a) and U_τ(b) intersect. An
  * equi-join on deletion-variant strings is therefore a LOSSLESS
  * candidate generator at threshold τ, with a high-cardinality join
  * key (the variant string itself), so block sizes do not grow with
  * corpus size the way a low-cardinality attribute block (brand,
  * category, …) does. False candidates are removed by the bounded
  * levenshtein verify.
  *
  * Neighborhood size is O(len^τ): 1 + l + l(l−1)/2 variants at τ=2 —
  * ~80 for a 12-char key. Intended for compact join keys (names,
  * codes, titles); for long text use the n-gram / LSH families in
  * [[Dedup]].
  */
object FuzzyJoin {

  /** All strings obtainable from `s` by deleting at most `maxDel`
    * characters, including `s` itself, deduplicated. Codegen-friendly
    * (array HOFs only, no UDF). */
  def deletionNeighborhood(s: Column, maxDel: Int): Column = {
    require(maxDel >= 0 && maxDel <= 2,
      s"deletion neighborhood is O(len^maxDel); maxDel=$maxDel unsupported (use n-gram/LSH blocking instead)")
    // sequence(1, 0) would count DOWN, so empty strings need an
    // explicit empty-array branch before the per-position transform
    def del1(x: Column): Column =
      when(length(x) === 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(x)),
          i => concat(x.substr(lit(1), i - 1), x.substr(i + 1, length(x)))))
    maxDel match {
      case 0 => array(s)
      case 1 => array_distinct(concat(array(s), del1(s)))
      case _ =>
        val d1 = del1(s)
        array_distinct(concat(array(s), d1,
          flatten(transform(d1, v => del1(v)))))
    }
  }
}
