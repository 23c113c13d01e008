package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct, and run the
  * decode/feature step partition-wise so codec state is initialized
  * once per partition, not once per row.
  *
  * The actual byte decoding is STUBBED (`StubCodec` — this build has
  * no image/audio libraries): it derives deterministic fake features
  * from the bytes. Everything AROUND the stub is the real production
  * shape — schema, encoders, partition amortization, batch iteration,
  * and the downstream handoff of `Array[Float]` features into
  * graft.similarity.
  */
object Media {

  /** One media row: payload + the metadata a real ingest would carry.
    * Metadata travels as typed columns (not JSON) so filters on e.g.
    * `duration_ms` prune before any byte is touched.
    */
  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      bytes: Array[Byte],
      format: String,
      width: Int, // images/video; 0 otherwise
      height: Int,
      sample_rate: Int, // audio; 0 otherwise
      duration_ms: Long) // audio/video; 0 for stills

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      feature: Array[Float])

  /** Codec interface a real backend (JPEG/PNG decoder, ffmpeg, ...)
    * would implement. `open()` is the expensive per-partition init the
    * mapPartitions pattern amortizes.
    */
  trait Codec extends Serializable {
    def open(): Unit
    def decode(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake decode: feature j is the first 24 bits of
    * md5(payload ++ ":" ++ j) scaled into [0, 1). STUB — replace with
    * a real codec; the surrounding plumbing does not change.
    *
    * md5 (not a JVM-private hash) so a SQL oracle can re-derive the
    * identical features; 24-bit numerators over 2^24 are exact in
    * float32 AND double, so feature sums are bit-stable across engines
    * and summation orders.
    */
  final class StubCodec extends Codec {
    private var opened = false
    private var md: java.security.MessageDigest = _
    override def open(): Unit = {
      md = java.security.MessageDigest.getInstance("MD5")
      opened = true
    }
    override def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      require(opened, "decode before open() — partition init not run")
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        md.reset()
        md.update(bytes)
        md.update(s":$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val d = md.digest()
        val v = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
        out(j) = v.toFloat / 16777216.0f // exact: 24-bit numerator / 2^24
        j += 1
      }
      out
    }
  }

  /** Partition-wise decode → feature vectors. One codec open() per
    * partition; rows stream through without materializing the
    * partition (iterator in, iterator out — constant memory).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
      codec: () => Codec = () => new StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val c = codec(); c.open()
      rows.map(r => MediaFeatures(
        r.media_id, r.modality, r.bytes.length.toLong, c.decode(r.bytes, dim)))
    }
  }

  /** Frame-sampling plan for video rows: one row per sampled frame
    * offset, `everyMs` apart — pure Catalyst (`sequence` + `explode`),
    * no decode. The decoder then seeks only to sampled offsets.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), greatest(col("duration_ms") - 1, lit(0L)),
          lit(everyMs))).as("frame_ms"))

  /** Perceptual hash over the codec's feature vector: bit j set iff
    * feature_j exceeds the feature MEAN — the pHash construction
    * (mean-thresholded transform coefficients; a real image codec
    * feeds DCT coefficients here, the stub feeds its deterministic
    * fake features — the hashing/blocking plumbing is identical).
    * Feature sums are exact in double for the stub's 24-bit/2^24
    * values, so the threshold compare is bit-stable cross-engine.
    */
  def perceptualHash(features: DataFrame, dim: Int = 16): DataFrame = {
    val mu = (aggregate(col("feature"), lit(0.0d), (a, x) => a + x.cast("double"))
      / lit(dim.toDouble)).as("_mu")
    val bits = zip_with(col("feature"), sequence(lit(0), lit(dim - 1)), (v, j) =>
      when(v.cast("double") > col("_mu"),
        call_function("shiftleft", lit(1L), j)).otherwise(lit(0L)))
    features.select(col("media_id"), col("feature"), mu)
      .select(col("media_id"),
        aggregate(bits, lit(0L), (a, b) => a + b).as("phash"))
  }

  /** Near-duplicate media pairs by blocked Hamming distance over the
    * perceptual hash — the multimodal counterpart of SimHash text
    * dedup: two 8-bit pigeonhole blocks cover Hamming ≤ 1 exactly
    * (a pair differing in ≤ 1 bit agrees on at least one block), pair
    * expansion is bucket-local (PairGen — one shuffle on the block
    * key), the exact bit_count refine runs on candidates only.
    */
  def phashNearDups(hashed: DataFrame, maxDist: Int = 1,
      blockBits: Int = 8): DataFrame = {
    require(maxDist <= 1, "2-block pigeonhole guarantees recall only to Hamming 1")
    // Block WIDTH is the scale knob, exactly SimHash's §9.6 width law:
    // blocks must keep 2^blockBits ≥ corpus size or bucket sharing
    // turns the pair space quadratic AND loses true pairs to bucket
    // caps — 8-bit blocks (16-bit hash) are the ≤10^5 form, 31-bit
    // blocks (62-bit hash, dim = 62 features) the ≥10^6 one.
    val lo = lit(1L << blockBits)
    val payload = struct(col("media_id"), col("phash"))
    val halves = hashed
      .select(col("media_id"), col("phash"),
        pmod(col("phash"), lo).as("blk"), lit(0).as("half"))
      .unionAll(hashed.select(col("media_id"), col("phash"),
        floor(col("phash") / lo).cast("long").as("blk"), lit(1).as("half")))
    graft.dedup.PairGen.pairsWithin(halves, Seq("half", "blk"), payload)
      .select(col("a.media_id").as("id_a"), col("a.phash").as("pa"),
        col("b.media_id").as("id_b"), col("b.phash").as("pb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Cross-frame form of [[phashNearDups]]: every (index, probe) pair
    * within Hamming ≤ `maxDist` — the incremental-advance primitive
    * (new hashes probed against the STORED hash table without
    * re-pairing the stored side against itself). Same 2-block
    * pigeonhole, same recall guarantee (`maxDist` 1 < 2 blocks).
    */
  def phashProbePairs(index: DataFrame, probe: DataFrame,
      maxDist: Int = 1, blockBits: Int = 8): DataFrame = {
    require(maxDist <= 1, "2-block pigeonhole guarantees recall only to Hamming 1")
    val lo = lit(1L << blockBits)
    def halves(df: DataFrame, id: String, ph: String): DataFrame =
      df.select(col("media_id").as(id), col("phash").as(ph),
          pmod(col("phash"), lo).as("blk"), lit(0).as("half"))
        .unionAll(df.select(col("media_id").as(id), col("phash").as(ph),
          floor(col("phash") / lo).cast("long").as("blk"), lit(1).as("half")))
    halves(index, "id_a", "_pa")
      .join(halves(probe, "id_b", "_pb"), Seq("half", "blk"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_pa").bitwiseXOR(col("_pb"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** "Resize" planning: target dims preserving aspect ratio against a
    * bounding box — metadata-only arithmetic, the byte work happens in
    * the codec later.
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / greatest(col("width"), lit(1)),
      lit(maxSide.toDouble) / greatest(col("height"), lit(1)),
      lit(1.0))
    media.filter(col("modality").isin("image", "video"))
      .select(col("media_id"), col("width"), col("height"),
        floor(col("width") * scale).cast("int").as("target_w"),
        floor(col("height") * scale).cast("int").as("target_h"))
  }
}
