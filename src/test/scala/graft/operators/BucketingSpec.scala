package graft.operators

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins: the write-once/join-many shuffle elimination.
  * Pins BOTH properties that make bucketing worth its write cost — the
  * join plans with no exchange, and the result is identical to the
  * unbucketed join.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed fact-fact join plans with NO shuffle exchange and matches the unbucketed result") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")

    Bucketing.writeBucketed(lineitem, "b_lineitem", 8, Seq("l_orderkey"), orphanMinAgeMs = 0L)
    Bucketing.writeBucketed(orders, "b_orders", 8, Seq("o_orderkey"), orphanMinAgeMs = 0L)

    withNoBroadcast {
      val bucketed = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = bucketed.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles — co-location lost:\n$plan")

      // identical result to the shuffled join of the raw parquet
      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      assert(bucketed.count() === plain.count())
      val bSum = bucketed.agg(round(sum("l_extendedprice"), 2)).first().get(0)
      val pSum = plain.agg(round(sum("l_extendedprice"), 2)).first().get(0)
      assert(bSum === pSum)
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle exchange") {
    // b_lineitem written by the previous test; rewrite if running alone
    if (!spark.catalog.tableExists("b_lineitem"))
      Bucketing.writeBucketed(
        spark.read.parquet(s"$sf/lineitem.parquet")
          .select("l_orderkey", "l_quantity", "l_extendedprice"),
        "b_lineitem", 8, Seq("l_orderkey"), orphanMinAgeMs = 0L)
    val agg = spark.table("b_lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    val plan = agg.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Exchange"),
      s"groupBy on the bucket key still shuffles:\n$plan")
    assert(agg.count() > 0)
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    Bucketing.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey", "o_custkey"),
      "b_orders_4", 4, Seq("o_orderkey"), orphanMinAgeMs = 0L)
    withNoBroadcast {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders_4"), col("l_orderkey") === col("o_orderkey"))
      // Spark may shuffle one or both sides; correctness must hold regardless
      val plain = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
      assert(j.count() === plain.count())
    }
  }
}
