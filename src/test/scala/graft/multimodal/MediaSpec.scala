package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Media.{MediaRow, StubCodec}

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, mod: String, payload: String, dur: Long = 0L) =
    MediaRow(id, mod, payload.getBytes("UTF-8"), "x", 640, 480, 0, dur)

  test("stub decode is deterministic and payload-sensitive") {
    val c = new StubCodec; c.open()
    val a1 = c.decode("hello".getBytes, 8)
    val a2 = c.decode("hello".getBytes, 8)
    val b = c.decode("hellp".getBytes, 8)
    a1.toSeq shouldBe a2.toSeq
    a1.toSeq should not be b.toSeq
    all(a1.toSeq) should (be >= 0.0f and be < 1.0f)
  }

  test("extractFeatures runs partition-wise with typed output") {
    val ds = Seq(row(1, "image", "aaa"), row(2, "audio", "bbb"), row(3, "video", "ccc"))
      .toDS().repartition(2)
    val out = Media.extractFeatures(ds, dim = 4).collect().sortBy(_.media_id)
    out.map(_.media_id).toSeq shouldBe Seq(1L, 2L, 3L)
    all(out.map(_.feature.length).toSeq) shouldBe 4
    out.head.n_bytes shouldBe 3L
    // determinism across runs (fresh codec per partition)
    val again = Media.extractFeatures(ds, dim = 4).collect().sortBy(_.media_id)
    again.map(_.feature.toSeq).toSeq shouldBe out.map(_.feature.toSeq).toSeq
  }

  test("sampleFrames emits offsets every step up to duration, videos only") {
    val df = Seq(row(1, "video", "x", dur = 2500), row(2, "image", "y"))
      .toDS().toDF()
    val frames = Media.sampleFrames(df, everyMs = 1000)
      .as[(Long, Long)].collect().toSet
    frames shouldBe Set((1L, 0L), (1L, 1000L), (1L, 2000L))
  }

  test("resizePlan preserves aspect ratio within the bounding box") {
    val df = Seq(row(1, "image", "x"), row(2, "audio", "y")).toDS().toDF()
    val plans = Media.resizePlan(df, maxSide = 320).collect()
    plans.length shouldBe 1 // audio excluded
    val p = plans.head
    p.getAs[Int]("target_w") shouldBe 320 // 640x480 -> 320x240
    p.getAs[Int]("target_h") shouldBe 240
  }

  test("stub features flow into the similarity operators downstream") {
    val ds = Seq(row(1, "image", "aaa"), row(2, "image", "aaa"), row(3, "image", "zzz"))
      .toDS()
    val feats = Media.extractFeatures(ds, dim = 16).toDF()
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val pairs = graft.similarity.SignLSH.annPairs(
      feats, "vec_id", "embedding", threshold = 0.999,
      graft.similarity.SignLSH.planes(16, 4, 2))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L)) // identical payload => identical feature
  }
}

class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, payload: String) =
    Media.MediaRow(id, "image", payload.getBytes("UTF-8"), "png", 64, 64, 0, 0L)

  private def hashes(rows: Seq[Media.MediaRow]) =
    Media.perceptualHash(
      Media.extractFeatures(rows.toDS(), dim = 16).toDF())

  test("identical payloads hash identically; hash is 16-bit") {
    val h = hashes(Seq(row(1, "same bytes"), row(2, "same bytes"),
        row(3, "other bytes")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    h(1L) shouldBe h(2L)
    h.values.foreach(v => assert(v >= 0L && v < 65536L))
  }

  test("exact duplicates always pair at Hamming 0") {
    val h = hashes(Seq(row(1, "dup payload"), row(2, "dup payload"),
      row(3, "something else entirely")))
    val pairs = Media.phashNearDups(h).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    pairs should contain((1L, 2L, 0))
  }

  test("blocked pairs equal the brute-force Hamming<=1 pairs (pigeonhole exact)") {
    val rows = (1L to 40L).map(i => row(i, s"payload $i")) ++
      Seq(row(100L, "payload 7"), row(101L, "payload 13"))
    val h = hashes(rows)
    val got = Media.phashNearDups(h).select("id_a", "id_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sig = h.collect().map(r => r.getLong(0) -> r.getLong(1))
    val want = (for {
      (ia, sa) <- sig; (ib, sb) <- sig if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 1
    } yield (ia, ib, d)).toSet
    got shouldBe want
  }

  test("mean threshold splits the bits (not degenerate all-0/all-1)") {
    val h = hashes(Seq(row(1, "a representative payload with some length")))
      .collect().head.getLong(1)
    val bits = java.lang.Long.bitCount(h)
    assert(bits > 0 && bits < 16, s"degenerate hash: $bits bits set")
  }
}

class PerceptualHashWideSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, payload: String) =
    Media.MediaRow(id, "image", payload.getBytes("UTF-8"), "png", 64, 64, 0, 0L)

  test("62-bit wide form: blocked pairs equal brute-force Hamming<=1, hash stays non-negative") {
    val rows = (1L to 30L).map(i => row(i, s"payload $i")) ++
      Seq(row(100L, "payload 7"), row(101L, "payload 21"))
    val h = Media.perceptualHash(
      Media.extractFeatures(rows.toDS(), dim = 62).toDF(), dim = 62)
    val sig = h.collect().map(r => r.getLong(0) -> r.getLong(1))
    all(sig.map(_._2)) should be >= 0L
    val got = Media.phashNearDups(h, maxDist = 1, blockBits = 31)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (ia, sa) <- sig; (ib, sb) <- sig if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 1
    } yield (ia, ib, d)).toSet
    got shouldBe want
    got.map(t => (t._1, t._2)) should contain allOf ((7L, 100L), (21L, 101L))
  }
}

class MediaScreenSpec extends SparkSpec {
  import spark.implicits._

  test("3-way split; a committed fresh item re-screens as exact_dup after the store advances") {
    val sf = java.nio.file.Files.createTempDirectory("mscreen").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "stored image payload one"), (2L, "stored image payload two"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(corpus)

    def batchDf(rows: (Long, String)*) =
      rows.toSeq.toDF("media_id", "_t")
        .select(col("media_id"), col("_t").cast("binary").as("bytes"))

    val got = MediaScreen.screen(spark, sf, "documents",
        batchDf(10L -> "stored image payload one", 11L -> "brand new payload"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    got(10L) shouldBe ("exact_dup", 1L) // byte-identical re-upload, 1 witness
    got(11L)._1 shouldBe "fresh"

    // commit the fresh item into the corpus: the store advances O(new)
    Seq((11L, "brand new payload")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    val again = MediaScreen.screen(spark, sf, "documents",
        batchDf(20L -> "brand new payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    again(20L) shouldBe "exact_dup"
  }

  test("stored hashes equal inline hashing (per-item determinism)") {
    val sf = java.nio.file.Files.createTempDirectory("mscreen2").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(corpus)
    val stored = MediaScreen.stored(spark, sf, "documents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val inline = MediaScreen.hashed(
        spark.read.parquet(corpus).select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("bytes")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    stored shouldBe inline
  }
}
