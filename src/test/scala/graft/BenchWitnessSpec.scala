package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The phase-1 contention witness: prior-record parsing and the ratio
  * math that lets a bench invocation self-report mid-phase contamination
  * the pre-phase quiet gate cannot see. */
class BenchWitnessSpec extends AnyFunSuite {

  test("priorQueryWalls parses id and positive walls, drops sentinels, survives garbage") {
    val f = Files.createTempFile("bench_last", ".json")
    Files.writeString(f,
      """{"metric":"total","value":9.0,"unit":"sec",
        |"queries":{"a":1.5,"b":-2.0,"c":0.25},
        |"provenance":{"invocation_id":"123-9","phase1":"complete"}}""".stripMargin)
    val (id, walls) = Bench.priorQueryWalls(f.toString)
    assert(id.contains("123-9"))
    assert(walls == Map("a" -> 1.5, "c" -> 0.25)) // sentinel b dropped
    // unreadable / malformed -> empty, never throws
    assert(Bench.priorQueryWalls("/nonexistent/x.json") == (None, Map.empty))
    val g = Files.createTempFile("bench_bad", ".json")
    Files.writeString(g, "not json at all")
    assert(Bench.priorQueryWalls(g.toString) == (None, Map.empty))
  }

  test("contentionWitness: median over comparable queries, inflated list sorted, <5 comparable -> None") {
    val prior = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0, "d" -> 1.0, "e" -> 10.0, "x" -> 1.0)
    val now = Seq("a" -> 1.0, "b" -> 2.2, "c" -> 4.0, "d" -> 2.0, "e" -> 25.0,
      "y" -> 3.0 /* no prior */, "x" -> -2.0 /* sentinel now */)
    // ratios: a 1.0, b 1.1, c 1.0, d 2.0, e 2.5 -> median 1.1; inflated d,e
    val Some((med, inflated)) = Bench.contentionWitness(prior, now)
    assert(math.abs(med - 1.1) < 1e-9)
    assert(inflated.map(_._1) == Seq("e", "d")) // sorted by ratio desc
    // fewer than 5 comparable -> no witness
    assert(Bench.contentionWitness(prior.take(4), now) == None)
    // even count: central-two average (6 comparable -> (3rd+4th)/2)
    val prior6 = prior - "e" + ("f" -> 1.0) + ("g" -> 1.0)
    val now6 = now.filter(_._1 != "e") ++ Seq("f" -> 1.2, "g" -> 1.3)
    val Some((med2, _)) = Bench.contentionWitness(prior6, now6, threshold = 1.8)
    assert(math.abs(med2 - 1.15) < 1e-9) // sorted 1.0,1.0,1.1,1.2,1.3,2.0
  }
}
