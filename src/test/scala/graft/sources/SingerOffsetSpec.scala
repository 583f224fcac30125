package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** [[SingerOffset]] serialization: the r5 `{"count":N,"last":...}` form,
  * the legacy bare-count checkpoint form, and hostile file names.
  */
class SingerOffsetSpec extends AnyFunSuite {

  test("offset JSON round-trips") {
    val o = SingerOffset(3, Some("2024-06-01T12-00.singer"))
    assert(SingerOffset.parse(o.json()) == o)
    val empty = SingerOffset(0, None)
    assert(SingerOffset.parse(empty.json()) == empty)
  }

  test("legacy bare-count checkpoints still parse") {
    assert(SingerOffset.parse("7") == SingerOffset(7, None))
    assert(SingerOffset.parse(" 7 ") == SingerOffset(7, None))
  }

  test("file names full of JSON metacharacters survive the embed") {
    val hostile = SingerOffset(1, Some("""a "b"\c.singer"""))
    assert(SingerOffset.parse(hostile.json()) == hostile)
  }
}
