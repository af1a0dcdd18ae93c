package graft

import org.apache.spark.sql.functions._
import graft.sources.Catalog
import graft.operators.Skew

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (hand-checked values)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("x", "y")
      .select(Catalog.zValue($"x", $"y").as("z")).as[Long].collect().toSeq
    // (1,0)->1; (0,1)->2; (3,3)->15; (5,2): x bits 101 -> 1,0,16; y bits 010 -> 8 => 25
    assert(out == Seq(0L, 1L, 2L, 15L, 25L))
  }

  test("writeZOrdered produces disjoint, internally-sorted Z ranges per file") {
    val cat = new Catalog(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val dest = "/tmp/graft_zorder_test"
    cat.writeZOrdered(li, dest, 8, "l_partkey", "l_suppkey")
    val back = spark.read.parquet(dest)
    assert(back.count() == li.count())
    // per-file z min/max: ranges must not overlap across files
    val ranges = back
      .withColumn("z", Catalog.zValue($"l_partkey", $"l_suppkey"))
      .withColumn("f", input_file_name())
      .groupBy($"f").agg(min($"z").as("lo"), max($"z").as("hi"))
      .orderBy($"lo")
      .as[(String, Long, Long)].collect()
    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, s"file z ranges overlap: $hi1 > $lo2")
      case _ =>
    }
  }
}

class SaltedAggSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-stage aggregate equals the plain aggregate exactly") {
    val li = Tables.lineitem(spark, sfDir)
    val salted = Skew.saltedAgg(li, "l_returnflag", "l_extendedprice")
      .orderBy($"l_returnflag").as[(String, Long, Double)].collect().toSeq
    val plain = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), graft.functions.Exact.moneySum($"l_extendedprice").as("s"))
      .orderBy($"l_returnflag").as[(String, Long, Double)].collect().toSeq
    assert(salted == plain)
  }
}
