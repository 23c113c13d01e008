// Per-query stage/job profile for optimization rounds (r17).
// Usage:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path target/scala-2.13/classes --driver-memory 8g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-java-options "-Dprof.queries=q43_pagerank,d19_cluster_contracted" \
//     -i tools/probe_stageprof.scala
// Prints, for each query: wall (pass-2, warm), per-stage duration /
// tasks / shuffle bytes, and the driver-gap fraction (wall not covered
// by any running job = planning/analysis/scheduling cost).
import org.apache.spark.scheduler._
import scala.collection.mutable

val sfDir = sys.props.getOrElse("prof.sfdir", "/root/testdata/sf0.1")
val names = sys.props.getOrElse("prof.queries", "q43_pagerank").split(",").map(_.trim).filter(_.nonEmpty)

val stages = mutable.ArrayBuffer[(Int, String, Long, Int, Long, Long)]()
val jobs = mutable.ArrayBuffer[(Int, Long, Long)]()
val jobStart = mutable.Map[Int, Long]()
val listener = new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
    stages.synchronized {
      stages += ((si.stageId, si.name.take(70), dur, si.numTasks,
        si.taskMetrics.shuffleReadMetrics.totalBytesRead,
        si.taskMetrics.shuffleWriteMetrics.bytesWritten))
    }
  }
  override def onJobStart(j: SparkListenerJobStart): Unit =
    jobs.synchronized { jobStart(j.jobId) = j.time }
  override def onJobEnd(j: SparkListenerJobEnd): Unit =
    jobs.synchronized { jobs += ((j.jobId, jobStart.getOrElse(j.jobId, j.time), j.time)) }
}
spark.sparkContext.addSparkListener(listener)

// merge [start,end] intervals and return covered millis
def covered(iv: Seq[(Long, Long)]): Long = {
  val s = iv.sortBy(_._1)
  var tot = 0L; var curS = -1L; var curE = -1L
  for ((a, b) <- s) {
    if (a > curE) { if (curE >= 0) tot += curE - curS; curS = a; curE = b }
    else if (b > curE) curE = b
  }
  if (curE >= 0) tot += curE - curS
  tot
}

for (n <- names) {
  val q = graft.SparkEntry.queries(n)
  q(spark, sfDir).count() // warm pass (plan cache, JIT, page cache)
  stages.synchronized { stages.clear() }
  jobs.synchronized { jobs.clear() }
  val t0 = System.nanoTime
  q(spark, sfDir).count()
  val wallMs = (System.nanoTime - t0) / 1e6
  val st = stages.synchronized { stages.toVector }
  val jb = jobs.synchronized { jobs.toVector }
  val jobMs = covered(jb.map(j => (j._2, j._3)))
  println(f"QUERY $n wall=${wallMs}%.0fms jobs=${jb.size} jobCovered=${jobMs}ms driverGap=${wallMs - jobMs}%.0fms stages=${st.size} stageSum=${st.map(_._3).sum}ms")
  st.sortBy(-_._3).take(14).foreach { case (id, nm, dur, nt, srb, swb) =>
    println(f"  stage $id%5d ${dur}%6d ms tasks=$nt%4d srMB=${srb / 1e6}%8.2f swMB=${swb / 1e6}%8.2f  $nm")
  }
}
System.exit(0)
