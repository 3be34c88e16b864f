package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) join — match strings within Levenshtein
  * distance `k` across two tables without the cross join Catalyst
  * would otherwise plan (BroadcastNestedLoopJoin, O(|L|·|R|) distance
  * evaluations — dead at corpus scale).
  *
  * Candidate generation is the symmetric-delete scheme (SymSpell): if
  * `ed(s, t) <= k` then some string is reachable from BOTH s and t by
  * at most k character deletions (delete the aligned edit positions
  * from each side), so the deletion neighborhoods intersect. The
  * converse does not hold (intersection only bounds `ed <= 2k`), so
  * candidates are confirmed with the exact codegen'd `levenshtein`.
  *
  * Scale shape: each side expands to its deletion variants (`len+1`
  * per row at k=1 — bounded, data-independent), ONE equi-join shuffle
  * on the variant string, then a `distinct` + exact-distance filter
  * over the CANDIDATE set only — which the variant equality has
  * already cut from |L|·|R| to near the true match count. This is the
  * dirty-batch × master-table record-linkage shape: the master side
  * expands narrowly and joins hash-partitioned at any scale.
  */
object Fuzzy {

  /** All distinct strings reachable from `c` by deleting at most `k`
    * characters (includes `c` itself), as an array column. k is a
    * structural constant: each level multiplies worst-case variants by
    * the string length, so keep k <= 2 (SymSpell practice). */
  def deletionVariants(c: Column, k: Int): Column = {
    require(k >= 1 && k <= 2, s"deletionVariants: k=$k outside 1..2")
    // single-character deletions of every element of an array column;
    // empty strings delete to nothing (sequence(0,-1) would DESCEND,
    // so guard the degenerate length explicitly)
    def del1(arr: Column): Column = array_distinct(flatten(transform(arr, v =>
      when(length(v) > 0,
        transform(sequence(lit(0), length(v) - 1), i =>
          concat(v.substr(lit(1), i), v.substr(i + lit(2), length(v)))))
        .otherwise(array().cast("array<string>")))))
    (1 to k).foldLeft(array(c)) { (acc, _) =>
      array_distinct(concat(acc, del1(acc)))
    }
  }

  /** left ⋈ right on `levenshtein(lCol, rCol) <= k`. Column names
    * must not collide across sides (rename before calling — same
    * contract as [[RangeJoin]]). Null strings match nothing. The
    * `distinct` runs over joined candidates, deduping pairs that share
    * several variants; input rows are assumed distinct (keyed). */
  def editJoin(left: DataFrame, right: DataFrame,
      lCol: String, rCol: String, k: Int): DataFrame = {
    require(!left.columns.exists(right.columns.contains),
      "editJoin: left/right column names collide")
    val v = "_fz_variant"
    val lv = left.withColumn(v, explode(deletionVariants(col(lCol), k)))
    val rv = right.withColumn(v, explode(deletionVariants(col(rCol), k)))
    lv.join(rv, v).drop(v)
      .distinct()
      .filter(levenshtein(col(lCol), col(rCol)) <= k)
  }

  /** American Soundex phonetic key (Russell 1918) — the classic
    * PHONETIC blocking function next to [[deletionVariants]]'
    * typographic one: "Robert"/"Rupert" key identically (R163), so a
    * groupBy on the key blocks sound-alike names without any pairwise
    * comparison. A narrow codegen'd expression chain (upper → strip →
    * translate → collapse runs → drop separators → pad), zero shuffle.
    *
    * Documented simplification: H and W act as separators like vowels
    * (true Soundex lets same-coded letters merge ACROSS h/w, e.g.
    * ASHCRAFT → A261; this variant keys it A226). The rule needs
    * lookaround or a second pass, costs recall only in the rare
    * C-h-C same-code sandwich, and every step here runs VERBATIM as
    * the same translate/regexp chain in the oracle. Non-letters are
    * stripped first; an empty/symbol-only input keys to ''. */
  def soundex(c: Column): Column = {
    val up = regexp_replace(upper(c), "[^A-Z]", "")
    val coded = translate(up,
      "BFPVCGJKQSXZDTLMNRAEIOUYHW",
      "11112222222233455600000000")
    // Collapse each digit's runs (RE2-safe: no backreferences).
    val collapsed = (0 to 6).foldLeft(coded)((acc, d) =>
      regexp_replace(acc, s"$d{2,}", s"$d"))
    // Drop the first letter-run's code, then the separators.
    val rest = regexp_replace(substring(collapsed, 2, 128), "0", "")
    when(length(up) === 0, lit(""))
      .otherwise(rpad(concat(substring(up, 1, 1), substring(rest, 1, 3)),
        4, "0"))
  }

  /** Sorted-neighborhood blocking (Hernández–Stolfo 1995) — the
    * classic record-linkage candidate generator that complements the
    * deletion-variant join: sort records by a derived key and pair
    * each record only with its `window − 1` successors in sort order.
    *
    * Scale shape: a GLOBAL sort order would funnel the table through
    * one task, so the standard distributed adaptation applies — the
    * sort key's `blockLen`-char prefix partitions the data (keyed
    * window, parallel across blocks) and ordering lives within the
    * block. Matches straddling a prefix boundary are exactly what the
    * method's published MULTI-PASS answer covers: run again under an
    * independent second key (callers union passes — e.g. the raw name
    * and its reverse) so a boundary in one pass is interior in the
    * other. The neighbor fan-out is `window − 1` lead() columns off
    * one exchange — no self-join, no candidate blow-up: exactly
    * (window−1)·n ordered pairs per pass before verification.
    *
    * Output: (a_key, b_key, a_val, b_val) candidate pairs, a != b,
    * each pair once per pass (a = the sort-order predecessor). */
  def sortedNeighborhood(df: DataFrame, keyCol: String, valCol: String,
      window: Int = 5, blockLen: Int = 4): DataFrame = {
    require(window >= 2 && window <= 64, s"sortedNeighborhood: window=$window")
    require(blockLen >= 1, s"sortedNeighborhood: blockLen=$blockLen")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("blk").orderBy("v", "k")
    val base = df.select(col(keyCol).as("k"), col(valCol).as("v"))
      .withColumn("blk", substring(col("v"), 1, blockLen))
    val withLeads = (1 until window).foldLeft(base) { (d, i) =>
      d.withColumn(s"n$i",
        lead(struct(col("k").as("bk"), col("v").as("bv")), i).over(w))
    }
    withLeads
      .select(col("k").as("a_key"), col("v").as("a_val"),
        explode(array((1 until window).map(i => col(s"n$i")): _*)).as("nb"))
      .filter(col("nb").isNotNull)
      .select(col("a_key"), col("nb.bk").as("b_key"),
        col("a_val"), col("nb.bv").as("b_val"))
      .filter(col("a_key") =!= col("b_key"))
  }
}
