// S9.37 input: is the seeded-mix MinHash family a sound Jaccard
// ESTIMATOR? The r14 lesson (banding signature's linear family: ~40%
// of J~0 pairs estimated >= 0.75) says estimator families are
// verified by MEASUREMENT, never assumed. This probe runs the
// PRODUCTION builder (MinHashLSH.mixedSignatureTableFromShingles,
// verK=32) and the r14-proven concat family side by side on:
//  (a) 1000 random doc pairs (true J ~ 0): estimates must concentrate
//      at 0 (report the fraction >= 1/32, >= 0.25, and the max);
//  (b) 300 near-dup pairs with EXACT Jaccard computed from the real
//      shingle sets: report mean |est - J| and the 0.7-threshold
//      confusion vs exact J >= 0.7.
// Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --driver-memory 16g -i tools/probe_mix_estimator.scala
import java.io.{PrintWriter, FileWriter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_mix_estimator.plog", true), true)
plog.println("=== mix-family estimator probe " + java.time.Instant.now)
spark.conf.set("spark.sql.shuffle.partitions", 32)

// 2000 random hex-word docs (the accept probe's non-near-dup
// generator shape); pairs (2i, 2i+1) are J~0
val nDocs = 2000
val gid = col("id")
val docs = spark.range(nDocs).select(
  col("id").as("doc_id"),
  concat_ws(" ", (0 until 20).map(i =>
    lower(hex(xxhash64(concat(gid.cast("string"), lit(s"_$i")))))): _*)
    .as("text"))
// 300 near-dup pairs: doc i paired with a 1-word-perturbed copy
val nNear = 300
val nearBase = docs.limit(nNear)
val nearPert = nearBase.select(
  (col("doc_id") + 1000000L).as("doc_id"),
  concat(col("text"), lit(" perturbed tail word")).as("text"))
val all = docs.unionByName(nearPert).localCheckpoint()

val norm = graft.functions.TextFunctions.normalize(col("text"))
val sh = graft.dedup.MinHashLSH.shingleRows(all, "doc_id", norm)

def estRows(sig: DataFrame, tag: String): Unit = {
  val s = sig.select(col("doc_id"),
    array((0 until 32).map(v => col(s"v$v")): _*).as("sig"))
    .localCheckpoint()
  def est(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / lit(32.0)
  // (a) random pairs (2i, 2i+1), i in [nNear, nDocs/2): J ~ 0
  val rand = s.select((col("doc_id") / 2).cast("long").as("p"),
      col("doc_id"), col("sig"))
    .where(col("doc_id") < nDocs && col("doc_id") >= 2L * nNear)
  val randEst = rand.groupBy("p")
    .agg(collect_list(col("sig")).as("sigs"))
    .where(size(col("sigs")) === 2)
    .select(est(element_at(col("sigs"), 1),
      element_at(col("sigs"), 2)).as("e"))
    .agg(count(lit(1)).as("n"),
      sum(when(col("e") >= 1.0 / 32, 1).otherwise(0)).as("ge1"),
      sum(when(col("e") >= 0.25, 1).otherwise(0)).as("ge25"),
      max(col("e")).as("mx")).head
  plog.println(s"$tag J~0 pairs: n=${randEst.getLong(0)} " +
    s"est>=1/32: ${randEst.getLong(1)} est>=0.25: ${randEst.getLong(2)} " +
    f"max=${randEst.getDouble(3)}%.3f")
  // (b) near pairs vs exact Jaccard of the true shingle sets
  val sets = all.select(col("doc_id"),
    graft.dedup.Shingles.charShingleSet(norm, 5).as("ss"))
  val nearJ = sets.where(col("doc_id") < nNear)
    .select(col("doc_id").as("p"), col("ss").as("ss_a"))
    .join(sets.where(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("p"), col("ss").as("ss_b")), "p")
    .select(col("p"),
      (size(array_intersect(col("ss_a"), col("ss_b"))).cast("double") /
        size(array_union(col("ss_a"), col("ss_b")))).as("j"))
  val nearEst = s.where(col("doc_id") < nNear)
    .select(col("doc_id").as("p"), col("sig").as("sig_a"))
    .join(s.where(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("p"), col("sig").as("sig_b")), "p")
    .select(col("p"), est(col("sig_a"), col("sig_b")).as("e"))
    .join(nearJ, "p")
  val r = nearEst.agg(count(lit(1)).as("n"),
    avg(abs(col("e") - col("j"))).as("mae"),
    avg(col("j")).as("meanJ"),
    sum(when((col("j") >= 0.7) =!= (col("e") >= 0.7), 1).otherwise(0))
      .as("confusions")).head
  plog.println(s"$tag near pairs: n=${r.getLong(0)} " +
    f"mean|est-J|=${r.getDouble(1)}%.4f meanJ=${r.getDouble(2)}%.3f " +
    s"threshold-0.7 confusions=${r.getLong(3)}")
}

// production seeded-mix family (the accept loop's builder)
estRows(graft.dedup.MinHashLSH.mixedSignatureTableFromShingles(
  sh, "doc_id", verK = 32), "MIX")
// r14-proven concat family, same shingles (reference estimator)
val concatAggs = (0 until 32).map(v =>
  min(xxhash64(concat(col("shingle"), lit(s"#$v")))).as(s"v$v"))
estRows(sh.groupBy(col("doc_id")).agg(concatAggs.head, concatAggs.tail: _*),
  "CONCAT")
plog.println("=== done")
plog.close()
System.exit(0)
