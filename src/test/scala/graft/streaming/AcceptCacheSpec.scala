package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType, StructField, StructType}
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSpec

/** The accept loop's driver-side base-filter cache: the BOUND IS
  * BYTES (an entry's size is the loop's provisioned bitmap bytes —
  * entry-count LRU alone could pin multiple GBs, r15 What's-wrong
  * #1). Pins: byte-budget eviction in LRU order, the newest entry
  * surviving even alone over budget (evicting the loop that is
  * ticking right now would re-collect the provisioned bytes every
  * tick), a SUPERSEDED same-artifact broadcast destroyed at
  * replacement, and a byte-EVICTED other-artifact broadcast left
  * usable (unpersist keeps the driver copy for in-flight plans).
  */
class AcceptCacheSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("slice", LongType),
    StructField("bf", BinaryType),
    StructField("hs", ArrayType(LongType))))

  private def filterBytes(seed: Long): Array[Byte] = {
    val f = BloomFilter.create(1000, 9600L)
    f.putLong(seed)
    val bos = new java.io.ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }

  private def frame(seed: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(Row(0L, filterBytes(seed), null)).asJava, schema)
  }

  private def mustNotBuild: DataFrame =
    sys.error("cache hit must not evaluate the by-name frame")

  test("byte-budget LRU eviction; newest survives alone over budget; supersede destroys; evictee stays usable") {
    val C = StreamingAcceptIngest.BloomCache
    C.reset()
    val eb = filterBytes(0L).length.toLong
    // two entries fit, three do not
    System.setProperty("graft.accept.cacheBytes", (eb * 5 / 2).toString)
    try {
      val (bc1, n1, hit1, b1, t1) =
        C.get(spark, "artA", "snap1", 1, frame(1L))
      (n1, hit1, b1, t1) shouldBe ((1L, false, eb, eb))
      // hit: the by-name frame is NOT evaluated
      val (bc1b, _, hit1b, _, _) =
        C.get(spark, "artA", "snap1", 1, mustNotBuild)
      hit1b shouldBe true
      (bc1b eq bc1) shouldBe true
      C.get(spark, "artB", "snap1", 1, frame(2L))
      C.entryCount shouldBe 2
      C.cachedBytes shouldBe eb * 2
      // third entry crosses the budget: the LRU (artA) is evicted
      C.get(spark, "artC", "snap1", 1, frame(3L))
      C.cachedArtifacts.toSet shouldBe Set("artB", "artC")
      C.cachedBytes shouldBe eb * 2
      // the evicted broadcast was unpersisted, NOT destroyed — a
      // mid-tick plan on that other artifact can still read it
      bc1.value.length shouldBe 1
      // newest entry survives even ALONE over budget (re-deriving
      // the ticking loop's base every tick is the cost the cache
      // exists to avoid)
      System.setProperty("graft.accept.cacheBytes", "1")
      val (bc4, _, _, _, _) = C.get(spark, "artD", "snap1", 1, frame(4L))
      C.cachedArtifacts shouldBe Seq("artD")
      C.cachedBytes shouldBe eb
      // supersede: a fold published a new snapshot for the SAME
      // artifact — the old broadcast is destroyed at replacement
      // (per-artifact ticks are serialized, so nothing can hold it)
      val (bc5, _, hit5, _, _) =
        C.get(spark, "artD", "snap2", 1, frame(5L))
      hit5 shouldBe false
      bc5.value.length shouldBe 1
      intercept[org.apache.spark.SparkException] { bc4.value }
      // the new snapshot is a hit
      C.get(spark, "artD", "snap2", 1, mustNotBuild)._3 shouldBe true
    } finally {
      System.clearProperty("graft.accept.cacheBytes")
      C.reset()
    }
  }
}
