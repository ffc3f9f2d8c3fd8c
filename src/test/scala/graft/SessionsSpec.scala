package graft

import org.scalatest.funsuite.AnyFunSuite

/** The deployment profiles must stay truthful: the cluster profile pins
  * the adaptive-execution knobs the 100 TB story depends on, and both
  * profiles pin UTC (the exactness envelope every temporal oracle is
  * verified under).
  */
class SessionsSpec extends AnyFunSuite {

  test("cluster profile: AQE + skew split + coalesce + UTC") {
    val c = Sessions.ClusterConf
    assert(c("spark.sql.adaptive.enabled") == "true")
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(c("spark.sql.session.timeZone") == "UTC")
    // broadcast threshold deliberately NOT raised (see the Scaladoc)
    assert(!c.contains("spark.sql.autoBroadcastJoinThreshold"))
  }

  test("local profile: core-count shuffle partitions + UTC") {
    val c = Sessions.localConf(8)
    assert(c("spark.sql.shuffle.partitions") == "8")
    assert(c("spark.sql.session.timeZone") == "UTC")
  }
}
