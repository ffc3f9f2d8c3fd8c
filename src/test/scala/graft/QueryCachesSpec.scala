package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Eviction must be (a) targeted — corpus A's trained state survives
  * corpus B's eviction, so a multi-corpus service never retrains the
  * world — and (b) complete — evicted Dataset values are UNPERSISTED,
  * not just unlinked, so the blocks and driver-side broadcast relations
  * they pin are actually freed without a global catalog flush
  * (ADVICE r13: clearAll used to drop map slots while Spark's
  * CacheManager kept strong refs).
  */
class QueryCachesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("evict(session, dir) drops only that corpus and unpersists its frames") {
    import spark.implicits._
    val sk = Tables.sessionKey(spark)
    val m = QueryCaches.register(
      scala.collection.concurrent.TrieMap.empty[(Int, String), org.apache.spark.sql.DataFrame])
    val dfA = Seq(1, 2).toDF("a").persist(StorageLevel.MEMORY_ONLY)
    val dfB = Seq(3, 4).toDF("b").persist(StorageLevel.MEMORY_ONLY)
    dfA.count(); dfB.count()
    m.put((sk, "/corpusA"), dfA)
    m.put((sk, "/corpusB"), dfB)

    QueryCaches.evict(sk, "/corpusB")

    assert(m.contains((sk, "/corpusA")), "corpus A must survive B's eviction")
    assert(!m.contains((sk, "/corpusB")))
    assert(dfA.storageLevel != StorageLevel.NONE, "A stays cached")
    assert(dfB.storageLevel == StorageLevel.NONE, "B must be unpersisted")
    QueryCaches.evict(sk, "/corpusA") // cleanup
    assert(dfA.storageLevel == StorageLevel.NONE)
  }

  test("evict(session, dir) is session-scoped; evict(dir) is not") {
    import spark.implicits._
    val sk = Tables.sessionKey(spark)
    val m = QueryCaches.register(
      scala.collection.concurrent.TrieMap.empty[(Int, String), Long])
    m.put((sk, "/c"), 1L)
    m.put((sk + 1, "/c"), 2L) // same dir, different session
    QueryCaches.evict(sk, "/c")
    assert(!m.contains((sk, "/c")) && m.contains((sk + 1, "/c")))
    QueryCaches.evict("/c")
    assert(m.isEmpty)
  }

  test("clearAll unpersists Datasets nested in tuple values") {
    import spark.implicits._
    val m = QueryCaches.register(scala.collection.concurrent.TrieMap
      .empty[(Int, String), (org.apache.spark.sql.DataFrame, Long)])
    val df = Seq(5).toDF("x").persist(StorageLevel.MEMORY_ONLY)
    df.count()
    m.put((0, "/t"), (df, 42L))
    QueryCaches.clearAll()
    assert(m.isEmpty)
    assert(df.storageLevel == StorageLevel.NONE)
  }
}
