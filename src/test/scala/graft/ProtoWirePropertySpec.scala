package graft

import graft.cdc.ProtoWire
import graft.cdc.ProtoWire.{PField, PTableChange}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property: encode∘decode is the identity over seeded-random
  * `DatabaseChanges` messages — multi-byte varints (large ordinals),
  * unicode and quote-heavy strings, empty field lists, many changes per
  * payload. Pure JVM, no Spark session needed.
  */
class ProtoWirePropertySpec extends AnyFunSuite {

  private def randomString(rnd: Random): String = {
    // NOTE: no astral-plane chars — indexing a String picks UTF-16 units,
    // and a lone surrogate legitimately cannot round-trip through UTF-8
    val pool = "abzXY09 _-'\"\\éß中\n\t"
    (0 until rnd.nextInt(24)).map(_ => pool(rnd.nextInt(pool.length))).mkString
  }

  private def randomChange(rnd: Random): PTableChange =
    PTableChange(
      table = "t" + randomString(rnd),
      pk = "p" + randomString(rnd),
      // exercise 1..9-byte varints
      ordinal = rnd.nextInt(4) match {
        case 0 => rnd.nextInt(128).toLong
        case 1 => 128L + rnd.nextInt(1 << 14)
        case 2 => rnd.nextLong().abs
        case _ => 0L
      },
      operation = rnd.nextInt(4),
      fields = (0 until rnd.nextInt(5)).map(_ =>
        PField("f" + randomString(rnd), randomString(rnd), randomString(rnd))))

  test("encode∘decode is identity over random messages") {
    val rnd = new Random(20260812L)
    for (_ <- 1 to 200) {
      val msg = (0 until rnd.nextInt(8)).map(_ => randomChange(rnd))
      val decoded = ProtoWire.decodeDatabaseChanges(ProtoWire.encodeDatabaseChanges(msg))
      assert(decoded == msg)
    }
  }

  test("proto3 default-value convention survives the round trip") {
    // empty strings / zero ordinal / UNSET op are simply absent on the wire
    val msg = Seq(PTableChange("", "", 0L, 0, Seq(PField("", "", ""))))
    val bytes = ProtoWire.encodeDatabaseChanges(msg)
    val decoded = ProtoWire.decodeDatabaseChanges(bytes)
    assert(decoded == msg)
    // absent fields cost zero bytes beyond the submessage framing
    assert(bytes.length <= 6, s"defaults must not be encoded: ${bytes.length} bytes")
  }
}
