package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Connected components: exact component labels on known graphs. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def components(edges: (Long, Long)*): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("two separate components get their min-id labels") {
    val c = components((1L, 2L), (2L, 3L), (10L, 11L))
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long chain converges to one component (diameter > 1 round)") {
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
    val c = components(chain: _*)
    assert(c.keySet == (1L to 9L).toSet && c.values.forall(_ == 1L))
  }

  test("edge direction is irrelevant and min can arrive from either side") {
    // min id sits at the TAIL of the directed edges: propagation must flow
    // against the arrows too
    val c = components((5L, 4L), (4L, 3L), (3L, 1L), (8L, 7L))
    assert(c == Map(5L -> 1L, 4L -> 1L, 3L -> 1L, 1L -> 1L, 8L -> 7L, 7L -> 7L))
  }

  test("empty edge list yields an empty frame") {
    val out = Graph.connectedComponents(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(out.count() == 0)
  }

  test("self-loops and duplicate edges are harmless") {
    val c = components((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L))
    assert(c == Map(1L -> 1L, 2L -> 1L))
  }
}
