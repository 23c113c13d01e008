package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Optimization-round tool: dump `.explain("formatted")` for declared
  * queries to one file per query (plans/<tag>/<name>_<suffix>.txt).
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> [nameFilter,...]
  *
  * Plans are captured with the SAME session shape as Bench (shuffle
  * partitions = SPARK_GRAFT_CPUS, local[cpus]) so Exchange counts and
  * join strategies match what the bench actually runs. AQE's runtime
  * re-optimization is not visible here (this is the pre-execution
  * plan), which is also what `explain("formatted")` shows in Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: PlanDump <sfDir> <outDir> <suffix> [nameFilter,...]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val filter = if (args.length > 3)
      args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.isEmpty || filter.exists(p => n == p || n.startsWith(p + "_")))
    names.foreach { name =>
      val out = Paths.get(outDir, s"${name}_$suffix.txt")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.write(out, txt.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        println(s"ok $name")
      } catch { case e: Throwable =>
        println(s"ERR $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
