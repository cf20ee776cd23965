package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session, scalatest default
  * sequential suites within a JVM). */
object TestSession {
  lazy val spark: SparkSession =
    Sessions.builder("local[4]", 4)
      .appName("graft-test")
      .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
}
