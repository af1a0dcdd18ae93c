package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Drift contract for the WHOLE testdata surface.
  *
  * Round 4 closed red because the driver silently regenerated
  * `events.ts` in a different parquet physical flavor;
  * [[TimestampFlavorSpec]] pins that one column's normalization. This
  * spec makes the check mechanical for ALL 10 tables: every loaded
  * table's POST-NORMALIZATION schema (names, Spark types, nullability,
  * column order) must match the pinned expectation, with a per-column
  * message naming exactly what flipped. A testdata regeneration that
  * changes any physical type now fails here, loudly, before any
  * operator produces silently-wrong output.
  *
  * The contract is on what operators SEE (after `Tables`' loaders run
  * normalizeTs on events.ts / o_orderdate / l_shipdate), so a flavor
  * switch the normalizer handles stays green by design — only a change
  * the code can't absorb (new column, dropped column, int→string, a
  * timestamp becoming DATE, …) fails.
  */
class TestdataContractSpec extends SparkSpec {

  private def loaded(name: String): DataFrame = name match {
    case "region"     => Tables.region(spark, sfDir)
    case "nation"     => Tables.nation(spark, sfDir)
    case "customer"   => Tables.customer(spark, sfDir)
    case "supplier"   => Tables.supplier(spark, sfDir)
    case "part"       => Tables.part(spark, sfDir)
    case "orders"     => Tables.orders(spark, sfDir)
    case "lineitem"   => Tables.lineitem(spark, sfDir)
    case "events"     => Tables.events(spark, sfDir)
    case "documents"  => Tables.documents(spark, sfDir)
    case "embeddings" => Tables.embeddings(spark, sfDir)
  }

  private val expected: Map[String, Seq[(String, DataType, Boolean)]] = Map(
    "region" -> Seq(
      ("r_regionkey", IntegerType, true), ("r_name", StringType, true)),
    "nation" -> Seq(
      ("n_nationkey", IntegerType, true), ("n_name", StringType, true),
      ("n_regionkey", IntegerType, true)),
    "customer" -> Seq(
      ("c_custkey", LongType, true), ("c_name", StringType, true),
      ("c_nationkey", IntegerType, true), ("c_acctbal", DoubleType, true),
      ("c_mktsegment", StringType, true)),
    "supplier" -> Seq(
      ("s_suppkey", LongType, true), ("s_name", StringType, true),
      ("s_nationkey", IntegerType, true), ("s_acctbal", DoubleType, true)),
    "part" -> Seq(
      ("p_partkey", LongType, true), ("p_name", StringType, true),
      ("p_brand", StringType, true), ("p_type", StringType, true),
      ("p_size", IntegerType, true), ("p_retailprice", DoubleType, true)),
    "orders" -> Seq(
      ("o_orderkey", LongType, true), ("o_custkey", LongType, true),
      ("o_orderstatus", StringType, true), ("o_totalprice", DoubleType, true),
      ("o_orderdate", TimestampType, true), ("o_orderpriority", StringType, true)),
    "lineitem" -> Seq(
      ("l_orderkey", LongType, true), ("l_partkey", LongType, true),
      ("l_suppkey", LongType, true), ("l_linenumber", IntegerType, true),
      ("l_quantity", DoubleType, true), ("l_extendedprice", DoubleType, true),
      ("l_discount", DoubleType, true), ("l_tax", DoubleType, true),
      ("l_returnflag", StringType, true), ("l_linestatus", StringType, true),
      ("l_shipdate", TimestampType, true)),
    "events" -> Seq(
      ("event_id", LongType, true), ("ts", TimestampType, true),
      ("user_id", LongType, true), ("event_type", StringType, true),
      ("value", DoubleType, true), ("props", StringType, true)),
    "documents" -> Seq(
      ("doc_id", LongType, true), ("text", StringType, true),
      ("lang", StringType, true), ("source", StringType, true),
      ("n_chars", LongType, true)),
    "embeddings" -> Seq(
      ("vec_id", LongType, true), ("embedding", ArrayType(FloatType, true), true),
      ("label", IntegerType, true)))

  Tables.names.foreach { t =>
    test(s"$t: loaded schema matches the pinned contract") {
      val got = loaded(t).schema.fields.toSeq
        .map(f => (f.name, f.dataType, f.nullable))
      val want = expected(t)
      val gotByName = got.map(c => c._1 -> c).toMap
      val wantByName = want.map(c => c._1 -> c).toMap
      val problems = Seq.newBuilder[String]
      want.foreach { case (n, dt, nl) =>
        gotByName.get(n) match {
          case None => problems += s"$t.$n: MISSING (expected ${dt.sql})"
          case Some((_, gdt, gnl)) =>
            if (gdt != dt)
              problems += s"$t.$n: type flipped ${dt.sql} -> ${gdt.sql}" +
                " (testdata regenerated in a new flavor? see Tables.normalizeTs)"
            if (gnl != nl)
              problems += s"$t.$n: nullability flipped $nl -> $gnl"
        }
      }
      got.foreach { case (n, gdt, _) =>
        if (!wantByName.contains(n))
          problems += s"$t.$n: UNEXPECTED new column of type ${gdt.sql}"
      }
      if (got.map(_._1) != want.map(_._1) && problems.result().isEmpty)
        problems += s"$t: column ORDER changed: ${got.map(_._1).mkString(",")}" +
          s" (expected ${want.map(_._1).mkString(",")})"
      val report = problems.result()
      assert(report.isEmpty, "\n" + report.mkString("\n"))
    }
  }
}
