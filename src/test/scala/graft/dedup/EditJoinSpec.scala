package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The segment-blocked edit-distance join is EXACT: randomized
  * corpora with planted typo neighbors (substitutions, deletions,
  * insertions, transposed-ish doubles) must produce byte-identical
  * pair sets to the brute-force cross join at every k — the blocking
  * can only add candidates, and verify must remove exactly the
  * non-pairs.
  */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(strs: org.apache.spark.sql.DataFrame, k: Int) = {
    val a = strs.select(col("sid").as("id_a"), col("s").as("s_a"))
    val b = strs.select(col("sid").as("id_b"), col("s").as("s_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("dist") <= k)
      .select("id_a", "id_b", "dist")
  }

  test("randomized corpora with planted typos: exact at k = 0, 1, 2, 3") {
    val alphabet = "abcdefg"
    for (seed <- Seq(3L, 19L, 57L)) {
      val rnd = new scala.util.Random(seed)
      def word(n: Int) =
        (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val base = (0L until 40L).map(i => (i, word(4 + rnd.nextInt(8))))
      // planted neighbors: substitution, deletion, insertion, dup
      val typos = base.filter(_._1 % 3 == 0).flatMap { case (i, s) =>
        val p = rnd.nextInt(s.length)
        val sub = s.updated(p, alphabet(rnd.nextInt(alphabet.length)))
        val del = s.take(p) + s.drop(p + 1)
        val ins = s.take(p) + alphabet(rnd.nextInt(alphabet.length)) + s.drop(p)
        Seq((i + 1000, sub), (i + 2000, del), (i + 3000, ins), (i + 4000, s))
      }
      val strs = (base ++ typos).toDF("sid", "s").localCheckpoint()
      for (k <- 0 to 3) withClue(s"seed=$seed k=$k: ") {
        assertSameRows(
          EditJoin.similarPairs(strs, "sid", col("s"), k),
          brute(strs, k))
      }
    }
  }

  test("shared-literal-prefix pathology: exact despite one hot segment") {
    // every id shares the 9-char 'Customer#' prefix — the fixture
    // shape that defeats naive segment selectivity; the join must
    // stay exact (the hot key is a skew/cost problem, never a
    // correctness one)
    val strs = (0L until 80L)
      .map(i => (i, f"Customer#${i % 40}%09d")).toDF("sid", "s")
      .localCheckpoint()
    for (k <- 1 to 2)
      assertSameRows(
        EditJoin.similarPairs(strs, "sid", col("s"), k),
        brute(strs, k))
  }

  test("empty and tiny strings: pigeonhole with zero-length segments") {
    val strs = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "b"), (5L, ""),
      (6L, "abc"), (7L, "xyz")).toDF("sid", "s")
    for (k <- 0 to 2)
      assertSameRows(
        EditJoin.similarPairs(strs, "sid", col("s"), k),
        brute(strs, k))
  }

  test("maxBucket cap keeps determinism (smallest reps kept)") {
    val strs = (0L until 30L).map(i => (i, s"aaaa${i % 10}")).toDF("sid", "s")
    val capped = EditJoin.similarPairs(strs, "sid", col("s"), 1, maxBucket = 2)
    val again = EditJoin.similarPairs(strs, "sid", col("s"), 1, maxBucket = 2)
    assertSameRows(capped, again)
  }

  test("truncationAudit names every capped blocking unit (no silent caps)") {
    // 10 distinct strings per duplicate group of 3 → group size 3 and
    // every shared-segment bucket well over the cap of 2
    val strs = (0L until 30L).map(i => (i, s"aaaa${i % 10}")).toDF("sid", "s")
    val audit = EditJoin.truncationAudit(strs, "sid", col("s"), 1, maxBucket = 2)
      .collect()
    val byKind = audit.groupBy(_.getString(0))
    // duplicate groups: each of the 10 strings appears 3 times > 2
    assert(byKind("group").length === 10)
    byKind("group").foreach { r =>
      assert(r.getLong(2) === 3L)
      assert(r.getLong(3) === 1L) // size - cap
    }
    // segment buckets: the shared "aaaa" segments exceed the cap too
    assert(byKind.contains("segment"))
    byKind("segment").foreach(r => assert(r.getLong(3) === r.getLong(2) - 2))
    // an uncapped run has nothing to audit — the API refuses
    assertThrows[IllegalArgumentException] {
      EditJoin.truncationAudit(strs, "sid", col("s"), 1, Int.MaxValue)
    }
  }
}
