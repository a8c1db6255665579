package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Cross-round per-query benchmark floor history (`bench_history.json`,
  * committed with the repo — the driver's round commit carries the update).
  *
  * Closes the uniform-contention hole in [[Bench]]'s defenses: intra-run
  * spread/outlier trims catch a window that touches SOME iterations, but a
  * window swallowing ALL of a query's iterations shows small spread and a
  * 5-10× phantom median ships in the official artifact (r8: pii_redact
  * 10.6s for a zero-shuffle projection whose clean floor is ~1s). The
  * historical MIN is the contamination-robust statistic — contention only
  * ever inflates — so the band is the min over the retained window of past
  * run minima, keyed by SF dir (different scales have different floors).
  *
  * Retention is the last [[Keep]] runs per query: an honest regression
  * (bigger regenerated corpus, costlier semantics) ships flagged for a few
  * rounds — visible, with the band printed beside it — then ages into the
  * new band instead of re-running forever.
  */
object BenchHistory {
  private val Path = java.nio.file.Paths.get("bench_history.json")
  private val Keep = 8

  private def load(): Map[String, Map[String, List[Double]]] =
    if (!java.nio.file.Files.exists(Path)) Map.empty
    else try {
      val txt = new String(java.nio.file.Files.readAllBytes(Path), "UTF-8")
      JsonMethods.parse(txt) match {
        case JObject(sfs) => sfs.toMap.map { case (sf, qs) =>
          sf -> (qs match {
            case JObject(fields) => fields.toMap.collect { case (q, JArray(vs)) =>
              q -> vs.collect { case JDouble(d) => d; case JInt(i) => i.toDouble; case JDecimal(d) => d.toDouble }
            }
            case _ => Map.empty[String, List[Double]]
          })
        }
        case _ => Map.empty
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bench_history.json unreadable (${e.getMessage}) — running bandless")
      Map.empty
    }

  /** Per-query band (min over retained past minima) for this SF dir. */
  def bands(sfDir: String): Map[String, Double] =
    load().getOrElse(sfDir, Map.empty).collect { case (q, vs) if vs.nonEmpty => q -> vs.min }

  /** Append this run's per-query minima, trim to [[Keep]], write back. */
  def record(sfDir: String, mins: Map[String, Double]): Unit = try {
    val all = load()
    val cur = all.getOrElse(sfDir, Map.empty)
    val merged = cur ++ mins.map { case (q, m) =>
      q -> (cur.getOrElse(q, Nil) :+ BigDecimal(m).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).takeRight(Keep)
    }
    val updated = all + (sfDir -> merged)
    val json = JObject(updated.toList.sortBy(_._1).map { case (sf, qs) =>
      sf -> JObject(qs.toList.sortBy(_._1).map { case (q, vs) => q -> JArray(vs.map(JDouble(_))) })
    })
    java.nio.file.Files.write(Path, (JsonMethods.pretty(JsonMethods.render(json)) + "\n").getBytes("UTF-8"))
  } catch { case e: Throwable =>
    System.err.println(s"[bench] bench_history.json update failed: ${e.getMessage}")
  }
}
