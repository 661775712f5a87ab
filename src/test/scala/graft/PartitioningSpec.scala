package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.scale.Partitioning

/** Plan-shape evidence for the scale levers: bucketed joins must not
  * exchange, salted aggregation must match plain aggregation exactly.
  */
class PartitioningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("bucketed join plans with zero Exchange operators") {
    val left  = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    Partitioning.writeBucketed(left, "graft_bkt_left", "k", 8)
    Partitioning.writeBucketed(right, "graft_bkt_right", "k", 8)
    // force the shuffle-based join path (tiny fixtures would otherwise
    // broadcast, where bucketing is moot) to expose the bucketing effect
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // bucketed scans satisfy the join's distribution requirement directly
      val joined = spark.table("graft_bkt_left").join(spark.table("graft_bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
      // the same join over plain (unbucketed) frames DOES exchange — the
      // contrast proves the assertion above is meaningful
      val plainPlan = left.join(right, "k").queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }

  test("salted count equals plain count under heavy skew") {
    // 1 hot key with 10k rows + 100 cold keys
    val rows = (1 to 10000).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"cold$i", i))
    val df = rows.toDF("k", "v")
    val plain  = df.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Partitioning.saltedCount(df, "k").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 10000)
    // the salt genuinely splits the hot key into multiple partial groups
    val partials = df
      .withColumn("__salt", Partitioning.saltKey(df, 16))
      .where($"k" === "hot").select("__salt").distinct().count()
    assert(partials > 4, s"salt split hot key into only $partials groups")
  }

  test("salted join equals plain join under heavy skew, keyed on (key, salt)") {
    val factRows = (1 to 5000).map(i => ("hot", i)) ++ (1 to 50).map(i => (s"cold$i", i))
    val fact = factRows.toDF("k", "v")
    val dim  = (Seq("hot") ++ (1 to 50).map(i => s"cold$i")).zipWithIndex.toDF("k", "dim_id")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain  = fact.join(dim, "k")
      val salted = Partitioning.saltedJoin(fact, dim, "k")
      assert(salted.columns.toSeq == plain.columns.toSeq)
      val key = (r: org.apache.spark.sql.Row) => (r.getString(0), r.getInt(1), r.getInt(2))
      assert(salted.collect().map(key).sorted.toSeq == plain.collect().map(key).sorted.toSeq)
      // the shuffle join really keys on (k, __salt): the hot key's rows
      // hash-distribute instead of landing in one task
      val p = salted.queryExecution.executedPlan.toString
      assert(p.contains("__salt"), s"salt key missing from join plan:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
