package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Cumulative

/** Randomized equivalence of the two-level bucket-monotone scans
  * against the naive single-window formulations — the property every
  * oracle relies on, checked on seeded random value-count tables with
  * heavy ties, negative values, degenerate single-value groups, and
  * group sizes straddling the bucket count.
  */
class CumulativePropertySpec extends SparkSpec {
  private val rng = new scala.util.Random(4242)

  private def randVc(): Seq[(String, Long, Long, Long)] = {
    val groups = 1 + rng.nextInt(4)
    (0 until groups).flatMap { g =>
      val n = 1 + rng.nextInt(300)
      // distinct values per (group, value): build from a set
      rng.shuffle((-50 to 400).toList).take(n).map { v =>
        (s"g$g", v.toLong, 1L + rng.nextInt(5), rng.nextInt(1000).toLong)
      }
    }
  }

  test("runningSum / runningSums / runningMin equal the naive windows on random tables") {
    import spark.implicits._
    (1 to 5).foreach { _ =>
      val vc = randVc().toDF("g", "v", "c", "m").localCheckpoint()
      val wIncl = Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wExcl = Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val naive = vc
        .withColumn("s", sum(col("c")).over(wIncl))
        .withColumn("s2", sum(col("m")).over(wIncl))
        .withColumn("pm", min(col("m")).over(wExcl))
        .select("g", "v", "s", "s2", "pm").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet

      val one = Cumulative.runningSum(vc, Seq("g"), "v", "c", "s")
      val two = Cumulative.runningSums(vc, Seq("g"), "v",
        Seq("c" -> "s", "m" -> "s2"))
      val mn = Cumulative.runningMin(vc, Seq("g"), "v", "m", "pm")
      val got = one.select(col("g"), col("v"), col("s"))
        .join(two.select(col("g"), col("v"), col("s2")), Seq("g", "v"))
        .join(mn.select(col("g"), col("v"), col("pm")), Seq("g", "v"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
      assert(got == naive)
    }
  }
}
