package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Retrieval-quality floor for q_rag_retrieve: the oracle pins the exact
  * scores; this pins that the retrieval is MEANINGFUL — the top chunks
  * actually share vocabulary with the query — and deterministic across
  * runs (the property a RAG corpus index must hold).
  */
class RagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("top retrieved chunks share query vocabulary and repeat deterministically") {
    val rows = SparkEntry.queries("q_rag_retrieve")(spark, sf).collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getFloat(2))
    assert(scores.sameElements(scores.sortBy(-_.toDouble)), "scores must be descending")
    assert(scores.head > 0.0f, "top chunk must be positively similar to the query")

    // Re-derive the top chunk's text and check token overlap with the
    // query — a degenerate encoder (all-collisions, zero vectors) would
    // rank unrelated text here.
    val (docId, chunkId) = (rows.head.getLong(0), rows.head.getInt(1))
    val stride = 32 - 8 // ChunkMax - ChunkOverlap, the q_chunk_text geometry
    val text = graft.Tables.load(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") === docId)
      .select("text").head().getString(0)
    val words = text.toLowerCase.split(" ")
    val chunk = words.slice(chunkId * stride, chunkId * stride + 32).toSet
    val query = Set("spark", "table", "scan", "query")
    assert(chunk.intersect(query).nonEmpty,
      s"top chunk shares no query tokens: ${chunk.take(20)}")

    val again = SparkEntry.queries("q_rag_retrieve")(spark, sf).collect()
    assert(again.map(_.toString).toSeq == rows.map(_.toString).toSeq,
      "retrieval must be deterministic")
  }
}
