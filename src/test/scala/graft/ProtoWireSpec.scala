package graft

import graft.cdc.{ChangeLoader, MultiTable, ProtoWire}
import graft.cdc.ProtoWire.{OpCode, PField, PTableChange}
import graft.sources.ProtoChanges
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's wire format end to end: hand-built
  * `sf.substreams.sink.database.v1.DatabaseChanges` bytes → decode →
  * route → collapse → apply (`sinker/sinker.go:102-113` decode path).
  */
class ProtoWireSpec extends SparkSpecBase {

  private val block1 = ProtoWire.encodeDatabaseChanges(Seq(
    PTableChange("accounts", "1", ordinal = 1, OpCode.Create,
      Seq(PField("amount", "1.5"), PField("note", "hello"))),
    PTableChange("accounts", "2", ordinal = 2, OpCode.Create,
      Seq(PField("amount", "7.0"), PField("note", "bye"))),
    PTableChange("categories", "red", ordinal = 3, OpCode.Update,
      Seq(PField("amount", "10.25")))
  ))

  // two same-block ops on pk=1 disambiguated only by ordinal
  private val block2 = ProtoWire.encodeDatabaseChanges(Seq(
    PTableChange("accounts", "1", ordinal = 1, OpCode.Update,
      Seq(PField("amount", "2.5"))),
    PTableChange("accounts", "1", ordinal = 2, OpCode.Update,
      Seq(PField("amount", "3.5"))),
    PTableChange("accounts", "2", ordinal = 3, OpCode.Delete, Seq.empty)
  ))

  private val schemas = Map(
    "accounts" -> StructType(Seq(
      StructField("amount", DoubleType), StructField("note", StringType))),
    "categories" -> StructType(Seq(StructField("amount", DoubleType))))

  test("codec round-trips every message field") {
    val decoded = ProtoWire.decodeDatabaseChanges(block1)
    assert(decoded == Seq(
      PTableChange("accounts", "1", 1, OpCode.Create,
        Seq(PField("amount", "1.5"), PField("note", "hello"))),
      PTableChange("accounts", "2", 2, OpCode.Create,
        Seq(PField("amount", "7.0"), PField("note", "bye"))),
      PTableChange("categories", "red", 3, OpCode.Update,
        Seq(PField("amount", "10.25")))))
  }

  test("unknown top-level fields are skipped (proto3 forward compat)") {
    val withUnknown = block1 ++ Array[Byte](16, 5) // field 2, varint, value 5
    assert(ProtoWire.decodeDatabaseChanges(withUnknown)
      == ProtoWire.decodeDatabaseChanges(block1))
  }

  test("bytes column → decode → collapse → apply reproduces reference state") {
    import spark.implicits._
    val wire = ProtoChanges.decode(
      Seq((100L, block1), (101L, block2)).toDF("block", "payload"))

    // decode emits the MultiTable wire model with ordinals
    assert(wire.columns.toSeq ==
      Seq("block", "ordinal", "table", "pk", "op", "fields"))
    assert(wire.count() == 6)
    assert(wire.filter(col("op") === "INSERT").count() == 2)

    val collapsed = MultiTable.collapseAll(wire, schemas)
    val empty = schemas.map { case (t, sch) =>
      t -> spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(StructField("pk", StringType) +: sch.fields))
    }
    val state = MultiTable.applyAll(empty, collapsed, schemas)

    val accounts = state("accounts").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getString(2))).toMap
    // pk=1: ordinal 2's amount wins within block 101; note survives from block 100
    // pk=2: deleted in block 101 → gone
    assert(accounts == Map("1" -> ((3.5, "hello"))))
    val categories = state("categories").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(categories == Map("red" -> 10.25))
  }

  test("UNSET op decodes as data, flaggable instead of aborting the scan") {
    import spark.implicits._
    val bad = ProtoWire.encodeDatabaseChanges(Seq(
      PTableChange("accounts", "9", ordinal = 1, OpCode.Unset,
        Seq(PField("amount", "1.0")))))
    val wire = ProtoChanges.decode(Seq((1L, bad)).toDF("block", "payload"))
    assert(wire.filter(col("op") === "UNSET").count() == 1)
  }
}
