package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across all suites (sbt runs tests in one
  * forked JVM; SparkSession.builder.getOrCreate reuses it).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // guard, not a fix: a runaway iterative lineage once built 2 GiB
      // plan-description strings per execution (see Graph loop notes);
      // cap the stringifier so any future regression costs ~1 MB of
      // truncated text instead of minutes of CPU per query
      .config("spark.sql.maxPlanStringLength", "1000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sf001 = "/root/testdata/sf0.001"
}
