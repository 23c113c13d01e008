package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local session for all suites (one JVM-wide session keeps the
  * whole `sbt test` run seconds, not minutes). Parallelism is small on
  * purpose: unit fixtures are tiny and 4 shuffle partitions surface
  * the same plan shapes 32 would.
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SharedSpark.spark

  /** Deterministic property-check helper over raw ScalaCheck Gens (the
    * scalatest-scalacheck bridge isn't in the offline cache). Fixed
    * seeds keep failures reproducible.
    */
  def checkProp[A](gen: org.scalacheck.Gen[A], cases: Int = 25)(body: A => Unit): Unit =
    (1 to cases).foreach { i =>
      gen(org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .foreach(a => withClue(s"seed=$i input=$a: ")(body(a)))
    }

  /** Full-content equality irrespective of row order (the reference's
    * `checkSync` oracle, tests/testSyncClass.py:273-333, as exceptAll
    * both ways — SURVEY.md §5).
    */
  def assertSameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    a.schema.fieldNames.sorted shouldBe b.schema.fieldNames.sorted
    val bb = b.select(a.columns.map(org.apache.spark.sql.functions.col): _*)
    val extraA = a.exceptAll(bb).count()
    val extraB = bb.exceptAll(a).count()
    assert(extraA == 0 && extraB == 0,
      s"frames differ: $extraA rows only in left, $extraB only in right")
  }
}
