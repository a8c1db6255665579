package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №170 stream_vector_ingest: the streamed arrival codes must equal the
  * batch encode row-for-row (per-vector encoding under a frozen model is
  * a pure function — micro-batch boundaries cannot change a code), and
  * the search over union(persisted base, streamed codes) must equal
  * №162's output exactly. */
class StreamVectorIngestSpec extends SparkSpec {
  import spark.implicits._
  import graft.queries.VectorQueries

  test("streamed codes ≡ batch encode; search ≡ №162; ≥3 micro-batches; state is batch-sized") {
    val out = StreamVectorIngest.streamVectorIngest(spark, sf)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(StreamVectorIngest.lastBatches >= 3,
      s"only ${StreamVectorIngest.lastBatches} data micro-batches — encode never crossed a batch")
    val streamed = StreamVectorIngest.lastCodes.map(_.toSeq).sortBy(_.head.toString)
    graft.CacheRegistry.releaseAll(spark)
    // batch-encode twin of the SAME arrivals under the same frozen model
    val (model, _, d, corpus, _, batch) = VectorQueries.ivfPqIngestContext(spark, sf)
    val batchCodes = VectorQueries.encodeCells(batch, model, VectorQueries.PquM, d)
      .collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    assert(streamed == batchCodes,
      "streamed codes diverge from the batch encode — frozen-model purity broken")
    // arrivals only: state held the day's batch, never the store
    val nArrivals = batch.count()
    assert(streamed.size == nArrivals && nArrivals < corpus.count() / 10)
    graft.CacheRegistry.releaseAll(spark)
    val upd = VectorQueries.knnIvfPqUpdate(spark, sf)
      .as[(Long, Long, Double, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(out == upd, "ingest-path search diverged from №162's serving output")
  }
}
