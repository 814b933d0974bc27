package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scale

/** Plan-level proof of the scale utilities: bucketed joins drop their
  * exchanges, salting preserves aggregate results, partitioned sinks
  * prune at read. */
class ScaleSpec extends AnyFunSuite with SharedSpark {

  test("bucketed join plans with no shuffle exchange") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val (bo, bli) = Scale.bucketedPair(spark, o, li, "o_orderkey", 4,
      "orders_b", "lineitem_b")
    // force sort-merge (tiny test tables would broadcast otherwise, which
    // hides the exchange the bucketing is supposed to eliminate)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bo.join(bli, Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + plan)
      // and the same join on unbucketed parquet DOES shuffle
      val unbucketed = o.join(li, Seq("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      // correctness unchanged
      assert(joined.count() == unbucketed.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation equals plain aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val salted = Scale.saltedSumCount(li, "l_returnflag", "l_quantity", 8)
      .orderBy("l_returnflag").collect()
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("total"), count(lit(1)).as("cnt"))
      .orderBy("l_returnflag").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getString(0) == p.getString(0))
      assert(math.abs(s.getDouble(1) - p.getDouble(1)) < 1e-6)
      assert(s.getLong(2) == p.getLong(2))
    }
  }

  test("salted broadcast join equals plain join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val saltedCnt = Scale.saltedBroadcastJoin(li, o, "l_orderkey", 4).count()
    val plainCnt = li.join(o, Seq("l_orderkey")).count()
    assert(saltedCnt == plainCnt)
  }

  test("denseIds equals global-window row_number, with no 1-partition stage") {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate")
    val viaWindow = o.withColumn("id",
        row_number().over(Window.orderBy("o_orderkey")).cast("long"))
      .select("o_orderkey", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDense = Scale.denseIds(o, "id", Seq("o_orderkey"), 4)
    assert(viaDense.rdd.getNumPartitions > 1)
    val got = viaDense.select("o_orderkey", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == viaWindow)
  }

  test("writeShards: n disjoint sorted shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Scale.writeShards(Tables.documents(spark, sfDir), 4, "doc_id", dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length == 4)
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("doc_id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"${f.getName} not sorted")
      (ids.min, ids.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, "shard ranges overlap")
    }
    val total = spark.read.parquet(dir).count()
    assert(total == Tables.documents(spark, sfDir).count())
  }

  test("stratified sample respects per-stratum fractions") {
    val docs = Tables.documents(spark, sfDir)
    val fractions = Map("en" -> 0.25, "es" -> 0.8, "fr" -> 0.8, "de" -> 0.8, "zh" -> 0.8)
    val sampled = docs.stat.sampleBy("lang", fractions, 42L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (lang, f) =>
      val rate = sampled.getOrElse(lang, 0L).toDouble / full(lang)
      assert(math.abs(rate - f) < 0.25, s"$lang rate $rate vs requested $f")
    }
  }

  test("partitioned sink prunes partitions at read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, sfDir)
      .withColumn("etype", col("event_type"))
    Scale.writePartitioned(ev, "etype", dir)
    val read = spark.read.parquet(dir).filter(col("etype") === "error")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(etype"),
      "no partition filter in scan:\n" + plan)
    assert(read.count() ==
      Tables.events(spark, sfDir).filter(col("event_type") === "error").count())
  }
}
