package graft

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{FunnelState => S}

import org.scalatest.funsuite.AnyFunSuite

class StreamingFunnelSpec extends AnyFunSuite with SparkSpec {

  private val H = 3600000000L
  private val W = StreamingFunnel.ConversionWindowUs

  test("advance mirrors the batch transition table") {
    // full conversion
    assert(StreamingFunnel.advance(S(0, 0),
      Seq((H, "view"), (2 * H, "click"), (3 * H, "purchase"))) == S(3, 3 * H))
    // click outside the window
    assert(StreamingFunnel.advance(S(0, 0),
      Seq((H, "view"), (H + W + 1, "click"))) == S(1, H))
    // order enforced
    assert(StreamingFunnel.advance(S(0, 0),
      Seq((H, "view"), (2 * H, "purchase"), (3 * H, "click"))).stage == 2)
    // pre-view click ignored; first-touch anchoring
    assert(StreamingFunnel.advance(S(0, 0),
      Seq((H, "click"), (2 * H, "view"))) == S(1, 2 * H))
    assert(StreamingFunnel.advance(S(0, 0),
      Seq((H, "view"), (H + W, "view"), (H + W + 2 * H, "click"))).stage == 1)
  }

  test("state carries across batches") {
    val afterB1 = StreamingFunnel.advance(S(0, 0), Seq((H, "view")))
    val afterB2 = StreamingFunnel.advance(afterB1, Seq((2 * H, "click")))
    assert(afterB2 == S(2, 2 * H))
    // expired window also persists correctly across the batch boundary
    val late = StreamingFunnel.advance(afterB1, Seq((H + W + 1, "click")))
    assert(late == S(1, H))
  }

  test("stream equals batch q63 on real data (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val stream = graft.queries.EventQueries.q70StreamingFunnel
      .fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.queries.AnalyticsQueries.q63Funnel
      .fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
