package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session). */
object SparkTestBase {
  lazy val spark: SparkSession = graft.core.GraftSession.local(cores = 8, appName = "graft-test")
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf0: String = "/root/testdata/sf0.001"
}
