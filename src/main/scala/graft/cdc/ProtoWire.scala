package graft.cdc

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal proto3 wire codec for the reference's input message,
  * `sf.substreams.sink.database.v1.DatabaseChanges`
  * (`/root/reference/pb/substreams/sink/database/v1/database.pb.go`):
  *
  *   DatabaseChanges { repeated TableChange table_changes = 1 }
  *   TableChange     { string table = 1; string pk = 2;
  *                     uint64 ordinal = 3; Operation operation = 4;
  *                     repeated Field fields = 5 }
  *   Field           { string name = 1; string new_value = 2;
  *                     string old_value = 3 }
  *   Operation       { UNSET = 0; CREATE = 1; UPDATE = 2; DELETE = 3 }
  *
  * Hand-rolled over the public protobuf wire format (varints +
  * length-delimited submessages) — no codegen or proto runtime needed, and
  * the decoder is a plain function usable inside executor tasks. Unknown
  * fields are skipped (proto3 forward-compatibility).
  */
object ProtoWire {

  final case class PField(name: String, newValue: String, oldValue: String = "")

  final case class PTableChange(
      table: String,
      pk: String,
      ordinal: Long,
      operation: Int,
      fields: Seq[PField]
  )

  object OpCode {
    val Unset = 0
    val Create = 1
    val Update = 2
    val Delete = 3
  }

  // ---- encode (test fixtures / loopback feeds) ---------------------------

  private def putVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def putTag(out: ByteArrayOutputStream, field: Int, wireType: Int): Unit =
    putVarint(out, (field.toLong << 3) | wireType)

  private def putBytes(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    putTag(out, field, 2); putVarint(out, b.length.toLong); out.write(b)
  }

  private def putString(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    if (s.nonEmpty) putBytes(out, field, s.getBytes(StandardCharsets.UTF_8))

  private def encodeField(f: PField): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    putString(out, 1, f.name)
    putString(out, 2, f.newValue)
    putString(out, 3, f.oldValue)
    out.toByteArray
  }

  private def encodeTableChange(tc: PTableChange): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    putString(out, 1, tc.table)
    putString(out, 2, tc.pk)
    if (tc.ordinal != 0) { putTag(out, 3, 0); putVarint(out, tc.ordinal) }
    if (tc.operation != 0) { putTag(out, 4, 0); putVarint(out, tc.operation.toLong) }
    tc.fields.foreach(f => putBytes(out, 5, encodeField(f)))
    out.toByteArray
  }

  def encodeDatabaseChanges(changes: Seq[PTableChange]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    changes.foreach(tc => putBytes(out, 1, encodeTableChange(tc)))
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------------

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift >= 64) throw new IllegalArgumentException("malformed varint")
      }
      v
    }
    def lengthDelimited(): (Int, Int) = {
      val len = varint().toInt
      val start = pos
      pos += len
      if (pos > end) throw new IllegalArgumentException("truncated length-delimited field")
      (start, start + len)
    }
    def utf8(): String = {
      val (s, e) = lengthDelimited()
      new String(buf, s, e - s, StandardCharsets.UTF_8)
    }
    /** Skip a field of any wire type (unknown-field tolerance). */
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => lengthDelimited()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def decodeField(buf: Array[Byte], start: Int, end: Int): PField = {
    val r = new Reader(buf, start, end)
    var name = ""; var nv = ""; var ov = ""
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => name = r.utf8()
        case (2, 2) => nv = r.utf8()
        case (3, 2) => ov = r.utf8()
        case (_, w) => r.skip(w)
      }
    }
    PField(name, nv, ov)
  }

  private def decodeTableChange(buf: Array[Byte], start: Int, end: Int): PTableChange = {
    val r = new Reader(buf, start, end)
    var table = ""; var pk = ""; var ordinal = 0L; var op = 0
    val fields = Seq.newBuilder[PField]
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => table = r.utf8()
        case (2, 2) => pk = r.utf8()
        case (3, 0) => ordinal = r.varint()
        case (4, 0) => op = r.varint().toInt
        case (5, 2) => val (s, e) = r.lengthDelimited(); fields += decodeField(buf, s, e)
        case (_, w) => r.skip(w)
      }
    }
    PTableChange(table, pk, ordinal, op, fields.result())
  }

  def decodeDatabaseChanges(bytes: Array[Byte]): Seq[PTableChange] = {
    val r = new Reader(bytes, 0, bytes.length)
    val changes = Seq.newBuilder[PTableChange]
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => val (s, e) = r.lengthDelimited(); changes += decodeTableChange(bytes, s, e)
        case (_, w) => r.skip(w)
      }
    }
    changes.result()
  }
}
