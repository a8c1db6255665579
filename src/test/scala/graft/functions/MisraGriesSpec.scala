package graft.functions

import graft.SparkSpec
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** №123 heavy_hitters: the Misra-Gries guarantee pinned on the live corpus
  * and on adversarial handcrafted streams, plus the sketch-then-verify
  * equality with the exact full-groupBy answer. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def tokStream = graft.Tables(spark, sf).documents
    .select(explode(TextQueries.words($"text")).as("tok"))
    .filter($"tok" =!= "")

  test("MG bound holds on the live corpus: count − N/(k+1) ≤ estimate ≤ count, superset of heavy hitters") {
    val k = TextQueries.HhT
    val sketch = tokStream.agg(MisraGries.sketch($"tok", k).as("sk"))
      .select(explode($"sk").as("e")).select($"e.tok", $"e.est")
      .as[(String, Long)].collect().toMap
    val exact = tokStream.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    assert(sketch.nonEmpty && sketch.size <= k, s"sketch size ${sketch.size} exceeds k=$k")
    // bound: for EVERY token (in or out of the sketch)
    exact.foreach { case (t, c) =>
      val est = sketch.getOrElse(t, 0L)
      assert(est <= c, s"$t overestimated: est=$est > count=$c")
      assert(c - est <= n / (k + 1) + 1,
        s"$t undercut past the bound: count=$c est=$est N/(k+1)=${n / (k + 1)}")
    }
    // superset: every true heavy hitter is a candidate
    val heavy = exact.filter { case (_, c) => c * k > n }.keySet
    assert(heavy.nonEmpty, "corpus has no heavy hitters — test is vacuous")
    assert(heavy.subsetOf(sketch.keySet),
      s"sketch missed heavy hitters: ${heavy -- sketch.keySet}")
  }

  test("adversarial stream: k=2 forces decrements, the majority item still survives") {
    // 6×a, 4×b, 3×c, 3×d interleaved — constant churn for a 2-counter
    // sketch; count(a)=6 > N/(k+1)=16/3, so survival is GUARANTEED (at
    // exactly N/(k+1) an item may legally evict to estimate 0)
    val stream = Seq("a", "b", "c", "a", "d", "b", "a", "c", "d", "b", "a", "c", "d", "b", "a", "a")
    val sketch = stream.toDF("tok")
      .coalesce(1) // single partition: the classic sequential MG semantics
      .agg(MisraGries.sketch($"tok", 2).as("sk"))
      .select(explode($"sk").as("e")).select($"e.tok", $"e.est")
      .as[(String, Long)].collect().toMap
    assert(sketch.size <= 2)
    val n = stream.length
    val counts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    counts.foreach { case (t, c) =>
      val est = sketch.getOrElse(t, 0L)
      assert(est <= c && c - est <= n / 3,
        s"$t: est=$est count=$c violates the k=2 bound ${n / 3}")
    }
    // count(a)=6 > 16/3: the heavy item can never be evicted to zero
    assert(sketch.contains("a"), s"heavy item lost: $sketch")
  }

  test("merge rule keeps the bound across partitions (parallel ≡ bounded, candidates ≤ k)") {
    val k = 8
    // 4 partitions, each with its own local churn + a global heavy item
    val rows = (0 until 4).flatMap { p =>
      Seq.fill(50)("heavy") ++ (0 until 60).map(i => s"p${p}_${i % 20}")
    }
    val df = rows.toDF("tok").repartition(4)
    val sketch = df.agg(MisraGries.sketch($"tok", k).as("sk"))
      .select(explode($"sk").as("e")).select($"e.tok", $"e.est")
      .as[(String, Long)].collect().toMap
    val n = rows.length.toLong
    assert(sketch.size <= k)
    val est = sketch.getOrElse("heavy", 0L)
    assert(200L - est <= n / (k + 1) + 1, s"heavy item undercut: est=$est, N/(k+1)=${n / (k + 1)}")
    assert(sketch.contains("heavy"))
  }

  test("serialize survives tokens past the 64 KiB writeUTF cliff (shuffle-safe for pathological runs)") {
    val big = "x" * 70000 // writeUTF would throw UTFDataFormatException here
    val multi = "é" * 40000 // 80000 UTF-8 bytes, multibyte
    val rows = Seq.fill(5)(big) ++ Seq.fill(3)(multi) ++ Seq.fill(4)("small")
    val sketch = rows.toDF("tok").repartition(3) // forces serialize/deserialize across partials
      .agg(MisraGries.sketch($"tok", 4).as("sk"))
      .select(explode($"sk").as("e")).select($"e.tok", $"e.est")
      .as[(String, Long)].collect().toMap
    assert(sketch.getOrElse(big, 0L) <= 5L && sketch.contains(big), s"big token lost or inflated")
    assert(sketch.getOrElse(multi, 0L) <= 3L, "multibyte token miscounted through serde")
    // also direct round trip of the buffer
    val mg = MisraGries(org.apache.spark.sql.catalyst.expressions.Literal("a"), 4)
    val buf = scala.collection.mutable.HashMap(big -> 7L, multi -> 2L, "s" -> 1L)
    assert(mg.deserialize(mg.serialize(buf)) == buf)
  }

  test("non-string child is rejected at analysis time, not with an executor ClassCastException") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(10).agg(MisraGries.sketch(col("id"), 4).as("sk")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"), s"unhelpful analysis error: ${err.getMessage}")
  }

  test("heavy_hitters ≡ the exact full-groupBy answer (sketch is an access path, not a semantic)") {
    val got = TextQueries.heavyHitters(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    val exact = tokStream.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    val n = exact.map(_._2).sum
    val expected = exact.filter { case (_, c) => c * TextQueries.HhT > n }
      .map { case (t, c) => (t, c, n) }.sortBy { case (t, c, _) => (-c, t) }.toSeq
    assert(got == expected, "sketch-then-verify must equal the exact answer")
    assert(got.nonEmpty)
  }
}
