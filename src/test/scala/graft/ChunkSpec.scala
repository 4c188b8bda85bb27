package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q_chunk's structural contract — the properties an indexing/embedding
  * consumer relies on, checked over the whole sf0.001 corpus:
  *   - stride/size geometry: chunk j starts at j·stride+1, carries
  *     min(size, n - j·stride) tokens;
  *   - total coverage: every token position of every doc falls inside at
  *     least one chunk (stride < size ⇒ overlap, no gaps);
  *   - text faithfulness: each chunk_text is exactly its token slice.
  */
class ChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chunks tile every doc with the declared stride/size geometry") {
    assert(TextOps.ChunkStride < TextOps.ChunkSize, "gapless tiling needs overlap")
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), operators.TextRules.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = TextOps.queries("q_chunk")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_._1)
    docs.foreach { case (id, toks) =>
      if (toks.nonEmpty) {
        val cs = byDoc(id).sortBy(_._2)
        // ids are 1..m dense; starts follow the stride; last chunk reaches
        // the final token and no chunk starts past it
        assert(cs.map(_._2).toSeq == (1 to cs.length))
        cs.foreach { case (_, cid, start, nTok, text) =>
          assert(start == (cid - 1) * TextOps.ChunkStride + 1)
          assert(nTok == math.min(TextOps.ChunkSize, toks.length - start + 1))
          assert(text == toks.slice(start - 1, start - 1 + nTok).mkString(" "))
        }
        val (_, _, lastStart, lastN, _) = cs.last
        assert(lastStart + lastN - 1 == toks.length, "chunks must reach the last token")
      } else assert(!byDoc.contains(id), "empty docs emit no chunks")
    }
  }
}
