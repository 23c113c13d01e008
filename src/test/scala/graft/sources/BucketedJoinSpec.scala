package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing = the shuffle you pay once at write time instead of on
  * every join. Two tables bucketed+sorted on the same key join with
  * NO exchange on either side — at 100 TB this turns the nightly
  * fact-fact join from the dominant shuffle into a local zip of
  * co-located buckets. This spec pins that plan property.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("equi-join of co-bucketed tables plans without a shuffle") {
    val base = Files.createTempDirectory("bkt")
    val a = (1L to 2000L).map(i => (i, s"a$i")).toDF("id", "va")
    val b = (1L to 2000L).map(i => (i, i * 2.0)).toDF("id", "vb")
    a.write.bucketBy(8, "id").sortBy("id")
      .option("path", s"$base/a").saveAsTable("bkt_a")
    b.write.bucketBy(8, "id").sortBy("id")
      .option("path", s"$base/b").saveAsTable("bkt_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning" // co-located
      joined.count() shouldBe 2000L
      // and the same join WITHOUT bucketing does shuffle both sides
      val unbucketed = a.join(b, "id")
      unbucketed.queryExecution.executedPlan.toString should
        include("Exchange hashpartitioning")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
