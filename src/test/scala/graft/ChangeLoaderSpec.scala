package graft

import graft.cdc.ChangeLoader
import graft.sources.Changes
import org.apache.spark.sql.functions._

class ChangeLoaderSpec extends SparkSpecBase {

  private val fields = Seq("amount", "kval", "note")

  test("collapse: a pk deleted then re-written is revived with only new fields") {
    import spark.implicits._
    val ch = Seq(
      (1L, 10L, "INSERT", Some(1.0), Some(5L), Some("a")),
      (2L, 10L, "DELETE", None, None, None),
      (3L, 10L, "UPDATE", Some(9.0), None, None)
    ).toDF("block", "pk", "op", "amount", "kval", "note")
    val out = ChangeLoader.collapse(ch, fields).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(!r.getAs[Boolean]("deleted") && r.getAs[Boolean]("revived"))
    assert(r.getAs[Double]("amount") == 9.0)
    assert(r.isNullAt(r.fieldIndex("kval")) && r.isNullAt(r.fieldIndex("note")))
  }

  test("applyBatch: revival does not resurrect prior-snapshot fields") {
    import spark.implicits._
    val snapshot = Seq((10L, Some(1.0), Some(5L), Some("old")))
      .toDF("pk", "amount", "kval", "note")
    val batch = Seq(
      (2L, 10L, "DELETE", None: Option[Double], None: Option[Long], None: Option[String]),
      (3L, 10L, "UPDATE", Some(9.0), None: Option[Long], None: Option[String])
    ).toDF("block", "pk", "op", "amount", "kval", "note")
    val out = ChangeLoader.applyBatch(snapshot, ChangeLoader.collapse(batch, fields), fields)
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Double]("amount") == 9.0)
    assert(r.isNullAt(r.fieldIndex("kval")), "kval must not survive the delete")
    assert(r.isNullAt(r.fieldIndex("note")), "note must not survive the delete")
  }

  test("applyBatch: plain update merges onto prior fields; delete drops; insert adds") {
    import spark.implicits._
    val snapshot = Seq(
      (10L, Some(1.0), Some(5L), Some("keep")),
      (20L, Some(2.0), Some(6L), Some("gone"))
    ).toDF("pk", "amount", "kval", "note")
    val batch = Seq(
      (1L, 10L, "UPDATE", Some(7.0), None: Option[Long], None: Option[String]),
      (2L, 20L, "DELETE", None: Option[Double], None: Option[Long], None: Option[String]),
      (3L, 30L, "INSERT", Some(3.0), Some(8L), Some("new"))
    ).toDF("block", "pk", "op", "amount", "kval", "note")
    val out = ChangeLoader.applyBatch(snapshot, ChangeLoader.collapse(batch, fields), fields)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(10L, 30L))
    assert(out(10L).getAs[Double]("amount") == 7.0)
    assert(out(10L).getAs[Long]("kval") == 5L, "unchanged field keeps prior value")
    assert(out(30L).getAs[String]("note") == "new")
  }

  test("ordinal disambiguates same-block ops: last-writer-wins is deterministic") {
    import spark.implicits._
    // three changes for one pk in ONE block, distinguishable only by ordinal
    val ch = Seq(
      (10L, 3L, 1L, "UPDATE", Some(3.0), None: Option[Long], Some("third")),
      (10L, 1L, 1L, "INSERT", Some(1.0), Some(7L), Some("first")),
      (10L, 2L, 1L, "UPDATE", Some(2.0), None: Option[Long], None: Option[String])
    ).toDF("block", "ordinal", "pk", "op", "amount", "kval", "note")
    for (parts <- Seq(1, 5)) {
      val out = ChangeLoader.collapse(ch.repartition(parts), fields).collect()
      assert(out.length == 1)
      val r = out(0)
      assert(r.getAs[Double]("amount") == 3.0 && r.getAs[String]("note") == "third")
      assert(r.getAs[Long]("kval") == 7L, "field untouched later keeps ordinal-1 value")
    }
    // DELETE at ordinal 2 wipes ordinal-1 fields; ordinal-3 revives
    val del = Seq(
      (10L, 1L, 1L, "INSERT", Some(1.0), Some(7L), Some("first")),
      (10L, 2L, 1L, "DELETE", None: Option[Double], None: Option[Long], None: Option[String]),
      (10L, 3L, 1L, "UPDATE", Some(9.0), None: Option[Long], None: Option[String])
    ).toDF("block", "ordinal", "pk", "op", "amount", "kval", "note")
    val r2 = ChangeLoader.collapse(del, fields).collect()(0)
    assert(r2.getAs[Boolean]("revived") && r2.getAs[Double]("amount") == 9.0)
    assert(r2.isNullAt(r2.fieldIndex("kval")), "pre-delete field must not survive")
  }

  test("violations: duplicate INSERT, UPDATE-after-DELETE, INSERT-after-existing flagged") {
    import spark.implicits._
    val ch = Seq(
      (1L, 10L, "INSERT", Some(1.0), None: Option[Long], None: Option[String]),
      (2L, 10L, "INSERT", Some(2.0), None: Option[Long], None: Option[String]),
      (3L, 20L, "DELETE", None: Option[Double], None: Option[Long], None: Option[String]),
      (4L, 20L, "UPDATE", Some(3.0), None: Option[Long], None: Option[String]),
      (5L, 30L, "DELETE", None: Option[Double], None: Option[Long], None: Option[String]),
      (6L, 30L, "INSERT", Some(4.0), None: Option[Long], None: Option[String])
    ).toDF("block", "pk", "op", "amount", "kval", "note")
    val v = ChangeLoader.violations(ch).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    // ops.go Insert errors whenever ANY op is pending for the pk: the dup
    // INSERT at pk 10 is flagged by both rules, and the INSERT-after-DELETE
    // "revive" at pk 30 (lenient in collapse) is surfaced here.
    assert(v == Set(
      (10L, "duplicate_insert"), (10L, "insert_after_existing"),
      (20L, "update_after_delete"), (30L, "insert_after_existing")))
  }

  test("violations on the derived feed match the declarative dup-insert query") {
    val viaQuery = run("cdc_upsert_dedup").collect().map(_.getLong(0)).toSet
    val viaApi = ChangeLoader.violations(Changes(spark, sfDir))
      .filter(col("rule") === "duplicate_insert")
      .select("pk").collect().map(_.getLong(0)).toSet
    assert(viaApi == viaQuery)
  }
}
