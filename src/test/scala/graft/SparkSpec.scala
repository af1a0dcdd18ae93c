package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (reused across suites via getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Graft.session(master = "local[4]", shufflePartitions = 4)
  val sfDir = "/root/testdata/sf0.001"
}
