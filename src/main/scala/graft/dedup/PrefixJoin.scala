package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact set-similarity self-join via prefix filtering — the
  * AllPairs / PPJoin family (Bayardo et al., WWW 2007; Vernica et
  * al., SIGMOD 2010 give the standard distributed formulation).
  *
  * MinHash LSH (d3/d4) answers "probably similar": false negatives
  * at a rate set by the band/row trade. This operator is the EXACT
  * rung of the dedup ladder: every pair with Jaccard >= tau is
  * returned, guaranteed, without the O(n²) cross product. The
  * theorem that makes it work: under ANY global total order on
  * tokens, two sets with J(a,b) >= tau must share at least one token
  * inside each one's PREFIX — the first |x| - ceil(tau·|x|) + 1
  * tokens of the ordered set. Ordering rarest-first makes prefixes
  * collide as rarely as possible, so the candidate join keys on rare
  * tokens only.
  *
  * Plan shape (all relational, no UDFs):
  *  1. token sets: normalize → whitespace split → array_distinct;
  *  2. document frequency: explode + hash aggregate on the token
  *     (map-side combined — the shuffle carries one row per distinct
  *     (token) after combine);
  *  3. canonical order WITHOUT a global rank: each token's sort key
  *     is lpad(df, 10, '0') || '|' || token, so ordering by
  *     (df asc, token asc) needs no row_number over the vocabulary
  *     (a global rank would serialize the vocab through one
  *     partition); per-document sort is array_sort — local, never a
  *     global sort;
  *  4. candidates: explode only the PREFIX slice, bucket-local pair
  *     expansion via [[PairGen]] (one shuffle keyed on the rare
  *     prefix tokens; no self-join double-lineage), then the length
  *     filter sz_min·den >= num·sz_max — necessary because
  *     J <= min/max — in EXACT integer arithmetic;
  *  5. verify: join the full sets back, exact Jaccard, filter
  *     inter·den >= num·union (again exact integers: tau never
  *     touches floating point, so no boundary pair can flip).
  *
  * 100 TB: the corpus-sized exchanges are the (id, token) explode
  * into the df aggregate and the prefix explode into the candidate
  * buckets — both linear in total token count; candidate volume is
  * bounded by collisions among the rarest (1-tau) fraction of each
  * document's tokens, and [[PairGen]]'s `maxBucket` caps any
  * degenerate hot bucket. The threshold is a rational num/den so
  * every filter is integer-exact — the correctness guarantee ("no
  * false negatives") survives any data distribution.
  *
  * Reference analogue: none — PyCassElastic has no similarity
  * machinery at all; this extends the training-data dedup surface
  * the build mandate adds (exact counterpart of d3/d4's LSH path).
  */
object PrefixJoin {

  /** All pairs (id_a < id_b) with word-set Jaccard >= tauNum/tauDen,
    * plus the exact similarity rounded to 4 decimals. Exact: no
    * false negatives, verified against a brute-force oracle.
    */
  def similarPairs(docs: DataFrame, idCol: String, text: Column,
      tauNum: Int, tauDen: Int, maxBucket: Int = Int.MaxValue): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, "need 0 < tau <= 1")
    val id = col(idCol)
    val sets = docs.select(id,
      array_distinct(split(TextFunctions.normalize(text), " ")).as("toks"))
    val exploded = sets.select(id, explode(col("toks")).as("tok"))
    val dfreq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    // (df asc, token asc) composite sort key; df < 10^10 by lpad width
    val keyed = exploded.join(dfreq, "tok")
      .select(id, concat(lpad(col("df").cast("string"), 10, "0"),
        lit("|"), col("tok")).as("k"))
    val ordered = keyed.groupBy(idCol)
      .agg(sort_array(collect_list(col("k"))).as("ks"))
      .select(id, col("ks"), size(col("ks")).as("sz"))
    // prefix length = sz - ceil(tau*sz) + 1, exact integer ceiling
    val prefLen = (col("sz") - floor((col("sz") * tauNum + (tauDen - 1))
      / tauDen) + 1).cast("int")
    val pref = ordered.select(id, col("sz"),
      explode(slice(col("ks"), lit(1), prefLen)).as("k"))
    val cand = PairGen.pairsWithin(
        pref, Seq("k"), struct(id.as("id"), col("sz").as("sz")), maxBucket)
      .select(col("a.id").as("id_a"), col("a.sz").as("sz_a"),
        col("b.id").as("id_b"), col("b.sz").as("sz_b"))
      .where(least(col("sz_a"), col("sz_b")) * tauDen >=
        greatest(col("sz_a"), col("sz_b")) * tauNum)
      .select("id_a", "id_b").distinct()
    val inter = size(array_intersect(col("ta"), col("tb")))
    val union = size(col("ta")) + size(col("tb")) - inter
    cand
      .join(sets.select(id.as("id_a"), col("toks").as("ta")), "id_a")
      .join(sets.select(id.as("id_b"), col("toks").as("tb")), "id_b")
      .where(inter * tauDen >= union * tauNum)
      .select(col("id_a"), col("id_b"),
        round(inter.cast("double") / union, 4).as("jaccard"))
  }
}
