package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the native expressions (plain scalacheck
  * generators with deterministic seeds — the scalatest bridge artifact is
  * not in the offline cache). */
class PropertySpecs extends SparkSpec {

  /** deterministic forAll: 200 seeded samples per generator tuple */
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    (1 to 200).foreach { i =>
      val p = Gen.Parameters.default
      f(ga.pureApply(p, Seed(i)), gb.pureApply(p, Seed(i * 7919L)), gc.pureApply(p, Seed(i * 104729L)))
    }
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    (1 to 200).foreach(i => f(ga.pureApply(Gen.Parameters.default, Seed(i))))

  private val keyGen = Gen.containerOfN[Array, Byte](16, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  private val dataGen = Gen.nonEmptyContainerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))

  test("AES/CTR roundtrips for arbitrary payloads and keys") {
    forAll(dataGen, keyGen, keyGen) { (data, key, iv) =>
      val ct = AesCtrCrypt.crypt(data, key, iv)
      assert(AesCtrCrypt.crypt(ct, key, iv).sameElements(data))
      // keystream is position-dependent: ciphertext differs from plaintext
      // unless the keystream byte happens to be zero — check length only
      assert(ct.length == data.length)
    }
  }

  private val fieldName = Gen.oneOf("a", "b", "zeta", "createdDateTime", "note9")
  private val scalarValue = Gen.oneOf(
    Gen.alphaNumStr.map(s => s.take(12)),
    Gen.const("2021-03-04T05:06:07.089+0000"),
    Gen.const("2021-03-04T05:06:07.089Z"))

  private val payloadGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 5)
    keys <- Gen.listOfN(n, fieldName).map(_.distinct)
    vals <- Gen.listOfN(keys.size, scalarValue)
  } yield keys.zip(vals).map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")

  test("validator invariants: valid JSON out, lm always last (pre-id), idempotent-ish wrap") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    forAll(payloadGen) { payload =>
      val r = JsonRecordOps.validate(UTF8String.fromString(payload), UTF8String.fromString("""{"id":"7"}"""))
      // reference semantics: an unparseable lastModified-chain value
      // (non-date string in createdDateTime/_removedDateTime/_lastModified)
      // rejects the record → null
      val mapper0 = new com.fasterxml.jackson.databind.ObjectMapper()
      val in = mapper0.readTree(payload)
      def raw(k: String) = Option(in.get(k)).map(_.asText()).getOrElse("")
      val lmSrc = Seq("_lastModifiedDateTime", "_removedDateTime", "createdDateTime")
        .map(raw).find(_.nonEmpty).getOrElse("1980-01-01T00:00:00.000Z")
      val parseable = lmSrc.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}(\+\d{4}|Z)""")
      if (!parseable) assert(r == null)
      else {
        val rec = r.getUTF8String(0).toString
      val node = mapper.readTree(rec)
      assert(node.isObject)
      // _lastModifiedDateTime always present, always a {"$date": ...Z} object
      val lm = node.get("_lastModifiedDateTime")
      assert(lm != null && lm.isObject && lm.get("$date") != null)
      assert(lm.get("$date").asText().endsWith("Z"))
      // no bare date-shaped strings survive at top level
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isTextual) {
          val v = e.getValue.asText()
          assert(!v.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}(\+\d{4}|Z)"""),
            s"unwrapped date survived: $rec")
        }
      }
        // manifest id from row key when no _id
        assert(r.getUTF8String(1).toString == """{"$oid":"7"}""")
      }
    }
  }

  test("simhash: hamming distance between noisy variants is small, random pairs large") {
    val base = (1 to 60).map(i => s"tok$i")
    val noisy = base.drop(2) ++ Seq("extra1", "extra2")
    val other = (1 to 60).map(i => s"unrelated$i")
    def fp(ts: Seq[String]): Long = {
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      SimHash60.fingerprint(new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any]))
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(base), fp(noisy)) < ham(fp(base), fp(other)))
  }

  test("native cosine is bit-identical to the sequential-fold HOF formulation") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val floatGen = Gen.chooseNum(-100, 100).map(_ / 7.0f)
    val vecGen = Gen.containerOfN[Array, Float](64, floatGen)
      .suchThat(v => v.exists(_ != 0f))
    forAll(vecGen, vecGen, Gen.const(())) { (a, b, _) =>
      // independent recomputation: three separate sequential folds, exactly
      // as zip_with+aggregate (and the DuckDB oracle) evaluate it
      def fold(x: Array[Float], y: Array[Float]): Double =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i).toDouble * y(i).toDouble)
      val expected = fold(a, b) / (math.sqrt(fold(a, a)) * math.sqrt(fold(b, b)))
      val got = CosineSim.cosine(
        new GenericArrayData(a.map(java.lang.Float.valueOf).toArray[Any]),
        new GenericArrayData(b.map(java.lang.Float.valueOf).toArray[Any]))
      assert(got != null && got.doubleValue() == expected) // bit-equal, no epsilon
    }
    // null semantics: length mismatch -> null
    val a3 = new GenericArrayData(Array[Any](1.0f, 2.0f, 3.0f))
    val a2 = new GenericArrayData(Array[Any](1.0f, 2.0f))
    assert(CosineSim.cosine(a3, a2) == null)
  }

  test("interval merge: arbitrary arrival orders converge to gap-connected components") {
    import graft.streaming.StatefulSessionize.merge
    val tsGen = Gen.listOfN(24, Gen.chooseNum(0L, 400L))
    forAll(tsGen) { ts =>
      val gap = 20L
      // reference formulation: sort, then linear gap-split
      val sorted = ts.sorted
      val expected = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, t) => acc match {
          case (s, e, n) :: rest if t - e <= gap => (s, math.max(e, t), n + 1) :: rest
          case _ => (t, t, 1L) :: acc
        }
      }.reverse
      // incremental merge over THREE different arrival orders
      for (order <- Seq(ts, ts.reverse, ts.sortBy(t => t.hashCode))) {
        val got = order.foldLeft(List.empty[(Long, Long, Long)])((iv, t) => merge(iv, t, gap))
        assert(got == expected, s"order $order diverged")
      }
      // structural invariants: sorted, disjoint, gap-separated, counts sum
      expected.sliding(2).foreach {
        case List((_, e1, _), (s2, _, _)) => assert(s2 - e1 > gap)
        case _ => ()
      }
      assert(expected.map(_._3).sum == ts.length)
    }
  }

  test("grouped top-k heap equals sort-based ground truth (ties included)") {
    val entryGen = Gen.listOfN(60, for {
      s <- Gen.chooseNum(0, 9).map(_ / 3.0) // coarse scores force ties
      i <- Gen.chooseNum(0L, 30L)
    } yield (s, i))
    forAll(entryGen) { entries =>
      val k = 5
      val heap = new java.util.PriorityQueue[(Double, Long)](k + 1, graft.plans.GroupedTopK.heapOrdering)
      entries.foreach(e => graft.plans.GroupedTopK.offer(heap, k, e))
      val got = {
        val a = new Array[(Double, Long)](heap.size)
        var j = 0; val it = heap.iterator()
        while (it.hasNext) { a(j) = it.next(); j += 1 }
        a.sortBy { case (s, i) => (-s, i) }.toList
      }
      // ground truth: full sort by (score desc, id asc), DISTINCT not applied
      val expected = entries.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(got == expected)
    }
  }

  test("csv escape matches commons-text escapeCsv (the reference's escaper)") {
    val cellGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '"', '\n', '\r', '|', ' ')))
      .map(_.mkString)
    forAll(cellGen) { cell =>
      val expected = org.apache.commons.text.StringEscapeUtils.escapeCsv(cell)
      val got = CsvEscape.escape(UTF8String.fromString(cell)).toString
      assert(got == expected, s"cell=${cell.map(_.toInt).mkString(",")}")
    }
  }
}
