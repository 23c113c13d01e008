package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables join with ZERO exchange; values equal plain join") {
    val left = (1L to 2000L).map(i => (i % 400, s"l$i")).toDF("k", "lv")
    val right = (1L to 500L).map(i => (i % 400, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bspec_left", "k", buckets = 8)
    Bucketing.writeBucketed(right, "bspec_right", "k", buckets = 8)

    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.colocatedJoin(spark, "bspec_left", "bspec_right", "k")
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      // the whole point: both sides' hash distribution comes from the
      // bucketed scans, so the sort-merge join plans with NO shuffle
      p should include("SortMergeJoin")
      p should not include "Exchange"
      p should include regex "Bucketed: true"
      // values identical to the unbucketed join
      assertSameRows(j, left.join(right, "k"))
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("aggregation on the bucket key also rides the scan distribution") {
    val df = (1L to 1000L).map(i => (i % 100, i.toDouble)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bspec_agg", "k", buckets = 8)
    val agg = spark.table("bspec_agg").groupBy("k").agg(sum("v").as("s"))
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString
    p should not include "Exchange" // group-by distribution from the scan
    assertSameRows(agg, df.groupBy("k").agg(sum("v").as("s")))
  }
}
