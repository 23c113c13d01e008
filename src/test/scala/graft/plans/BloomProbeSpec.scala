package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSpec

/** The two broadcast-era probe expressions: [[Mix64]] (seeded
  * avalanche — the accept loop's signature family) and
  * [[SlicedBloomProbe]] (filters behind a broadcast). Pins: codegen
  * output ≡ the Scala reference, null propagation, the empty-slice
  * lemma (absent slice → false), and membership exactness (no false
  * negatives).
  */
class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  test("Mix64 codegen matches the Scala reference mix; null propagates") {
    val seed = 0x9e3779b97f4a7c15L * 7
    val vals = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue,
      123456789L, -987654321L)
    val got = vals.toDF("h")
      .select(col("h"), Mix64.column(col("h"), seed).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    vals.foreach { v => got(v) shouldBe Mix64.mix(v ^ seed) }
    // distinct seeds give distinct streams
    val m2 = vals.toDF("h")
      .select(Mix64.column(col("h"), seed + 1).as("m"))
      .collect().map(_.getLong(0)).toSeq
    m2 should not be vals.map(v => Mix64.mix(v ^ seed))
    // null in, null out
    Seq(Some(1L), None).toDF("h")
      .select(Mix64.column(col("h"), seed).as("m"))
      .collect().map(r => r.isNullAt(0)).toSeq shouldBe Seq(false, true)
  }

  test("mixedSignatureTable refuses a verK that overlaps the banding seed stream") {
    val sh = Seq((1L, "ab"), (1L, "bc")).toDF("id", "shingle")
    intercept[IllegalArgumentException] {
      graft.dedup.MinHashLSH
        .mixedSignatureTableFromShingles(sh, "id", verK = 101)
    }.getMessage should include("seed")
    // the boundary value is allowed: id + h0..h7 + v0..v99
    graft.dedup.MinHashLSH
      .mixedSignatureTableFromShingles(sh, "id", verK = 100)
      .columns.length shouldBe 1 + 8 + 100
  }

  test("SlicedBloomProbe: membership per slice, absent slice proves novelty, null propagates") {
    val slices = 4
    // filters for slices 0 and 2 only; 1 and 3 absent. floorMod(h,4):
    // 8 and -12 -> 0, 6 and 14 -> 2 — TWO distinct slice filters are
    // genuinely built and probed (an earlier cut used members that
    // all landed in slice 0, leaving slice 2 absent and unprobed)
    val arr = new Array[BloomFilter](slices)
    val members = Seq(8L, -12L, 6L, 14L)
    members.foreach { h =>
      val s = java.lang.Math.floorMod(h, slices.toLong).toInt
      if (arr(s) == null) arr(s) = BloomFilter.create(100, 960L)
      arr(s).putLong(h)
    }
    assert(arr(0) != null && arr(2) != null && arr(1) == null &&
      arr(3) == null, "fixture must build exactly slices 0 and 2")
    val bc = spark.sparkContext.broadcast(arr)
    val probe = Seq[java.lang.Long](8L, -12L, 6L, 14L, // members: true
      12L, 20L, 10L, // slices 0/2 PRESENT, not inserted: false (w.h.p.)
      9L, -3L, 11L, // slices 1/3: ABSENT -> definitely false
      null).toDF("h")
      .select(col("h"),
        SlicedBloomProbe.column(col("h"), slices, bc).as("p"))
      .collect().map(r =>
        (Option(r.get(0)).map(_.asInstanceOf[Long]),
          if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    // no false negatives — across BOTH built slice filters
    members.foreach { h => probe(Some(h)) shouldBe Some(true) }
    // present-but-not-inserted in each built slice: false at these
    // sizings (100 items / 960 bits, 3 probes — fp chance ~1e-3/probe)
    Seq(12L, 20L, 10L).foreach { h => probe(Some(h)) shouldBe Some(false) }
    // absent slices are definite novelty — never "maybe"
    Seq(9L, -3L, 11L).foreach { h => probe(Some(h)) shouldBe Some(false) }
    // null hash -> null (callers coalesce to "maybe")
    probe(None) shouldBe None
  }
}
