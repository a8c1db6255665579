package graft.queries

import graft.SparkSpec

/** №111 doc_chunk — closed-form recomputation + the coverage/overlap
  * contract: every token position lands in at least one chunk, and
  * consecutive chunks overlap by exactly ChunkTokens − ChunkStride when
  * full. */
class DocChunkSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("doc_chunk ≡ closed-form chunking; chunks cover and reconstruct every doc") {
    val C = CurationQueries.ChunkTokens
    val S = CurationQueries.ChunkStride
    val docs = graft.Tables(spark, sf).documents
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
      val n = toks.size
      if (n == 0) Seq.empty
      else {
        val nChunks = 1 + (math.max(n - C, 0) + S - 1) / S
        (0 until nChunks).map { i =>
          val start = i * S
          val len = math.min(C, n - start)
          (id, i.toLong, start.toLong, len.toLong,
            md5hex(toks.slice(start, start + len).mkString(" ")))
        }
      }
    }.sortBy(r => (r._1, r._2))
    val got = CurationQueries.docChunk(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == expected, "chunk table must equal the closed-form recomputation")

    // coverage + overlap invariants per doc
    got.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      val nTok = sorted.last._3 + sorted.last._4 // last chunk ends at n_tok
      // chunks start at multiples of S; every position < nTok is covered
      val covered = sorted.flatMap(r => r._3 until (r._3 + r._4)).toSet
      assert(covered == (0L until nTok).toSet, s"doc $id: coverage hole")
      // consecutive full chunks overlap by exactly C - S
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          val overlap = (a._3 + a._4) - b._3
          assert(overlap == (C - S).toLong || a._4 < C,
            s"doc $id: chunk ${a._2}->${b._2} overlap $overlap")
        case _ => ()
      }
    }
  }
}
