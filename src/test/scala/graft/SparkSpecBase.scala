package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + sf0.001 fixture for all specs. */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSpecBase.session

  def run(name: String) = SparkEntry.queries(name)(spark, sfDir)
}

object SparkSpecBase {
  // One session for the whole test JVM — ScalaTest suites run sequentially
  // and Spark session startup dominates small-suite runtime.
  lazy val session: SparkSession = GraftSession.local(8)
}
