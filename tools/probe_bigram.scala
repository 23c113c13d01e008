// S9.16c probe: KN bigram LM scoring at 1 M docs (Zipf fixture) -
// the type-table-sized-model claim measured. ASCII only.
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_bigram.plog", true), true)
plog.println("=== bigram KN probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 64)

val V = 100000.0; val L = 40; val n = 1000000L
val baseText = concat_ws(" ",
  (0 until L).map(i => concat(lit("w"),
    floor(pow(lit(V), rand(4200L + i))).cast("long"))): _*)
val docs = spark.range(n).select(col("id").as("doc_id"), baseText.as("text"))
  .repartition(64).localCheckpoint()
plog.println(s"docs=${docs.count()}")

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

val scored = timed("t28_score_1M") {
  graft.functions.BigramLm.scoreDocs(docs, "doc_id", col("text"))
}
plog.println(s"scored_docs=${timed("count")(scored.count())}")
// model-size shape: types vs instances
val arr = split(graft.functions.TextFunctions.normalize(col("text")), " ")
val inst = docs.select(explode(transform(sequence(lit(1), size(arr) - 1),
  i => struct(element_at(arr, i).as("w1"), element_at(arr, i + 1).as("w2")))).as("b"))
val types = timed("type_table")(inst.select("b.w1", "b.w2").distinct().count())
plog.println(s"bigram_instances=${n * (L - 1)} bigram_types=$types")
plog.println("probe done")
System.exit(0)
