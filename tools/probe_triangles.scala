// S9.25 input: triangle counting at 2M edges with a power-law degree
// distribution plus a planted mega-hub - the adversarial case the
// degree orientation exists for. Compares Triangles.count against the
// naive a<b<c triple self-join.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path /root/repo/target/scala-2.13/classes \
//   --driver-memory 24g -i tools/probe_triangles.scala
import java.io.{PrintWriter, FileWriter}
val plog = new PrintWriter(new FileWriter("/root/repo/target/probe_triangles.plog", true), true)
plog.println("=== triangles probe " + java.time.Instant.now)
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)

// power-law-ish graph: endpoint ids drawn as floor(N * u^3) skews
// mass toward low ids (heavy head). The planted mega-hub gets a
// MEDIAN id: the id-canonical a<b<c triple join (which is itself an
// orientation - by id) then routes in-deg x out-deg ~ (deg/2)^2
// paths through the hub's single join key, the literal curse-of-the-
// last-reducer case; degree orientation ranks the hub LAST, so its
// out-degree is ~0 and the wedges vanish.
val N = 400000L
val HUB = 200000L
val raw = spark.range(2200000)
  .select(
    floor(lit(N) * pow(rand(7), 3)).cast("long").as("x"),
    floor(lit(N) * pow(rand(11), 3)).cast("long").as("y"))
  .where(col("x") =!= col("y"))
  .select(least(col("x"), col("y")).as("a"),
    greatest(col("x"), col("y")).as("b"))
val hub = spark.range(1, 30001)
  .select(lit(HUB).as("x"), ((col("id") * 13L) % lit(N)).as("y"))
  .where(col("x") =!= col("y"))
  .select(least(col("x"), col("y")).as("a"),
    greatest(col("x"), col("y")).as("b"))
val edges = raw.unionByName(hub).distinct().localCheckpoint()
plog.println(s"edges=${edges.count()}")
val maxDeg = edges.select(col("a").as("n")).unionAll(edges.select(col("b").as("n")))
  .groupBy("n").count().agg(max("count")).head.getLong(0)
plog.println(s"max_degree=$maxDeg")

def timed[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  plog.println(f"$label wall=${(System.nanoTime - t0) / 1e9}%.1f s"); r
}

val oriented = timed("oriented_count") {
  graft.operators.Triangles.count(edges).head.getLong(0)
}
plog.println(s"triangles=$oriented")

// naive a<b<c triple self-join - every wedge enumerated at every
// corner, the hub's deg^2 wedges in one join key
val naive = timed("naive_triple_join") {
  val e = edges
  e.as("e1")
    .join(e.as("e2"), col("e2.a") === col("e1.b"))
    .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
    .count()
}
plog.println(s"naive=$naive match=${naive == oriented}")
plog.println("done")
System.exit(0)
