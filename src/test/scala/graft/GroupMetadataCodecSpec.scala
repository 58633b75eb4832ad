package graft

import graft.coordinator.GroupMetadataCodec._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Lossless round-trip of the offsets-topic wire format
  * (GroupMetadataConstants.java:64-256): versioned keys discriminate the
  * message type, values decode back field-for-field across schema
  * versions, and the distributed sizing queries agree with the real
  * encoder.
  */
class GroupMetadataCodecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "4")
  val dir = "/root/testdata/sf0.001"

  test("offset-commit key round-trips and discriminates by version") {
    val k = offsetCommitKey("g7", "click", 13)
    assert(decodeKey(k) == OffsetKey(1, "g7", "click", 13))
    assert(k.length == 2 + (2 + 2) + (2 + 5) + 4)
    val gk = groupMetadataKey("payments-grp")
    assert(decodeKey(gk) == GroupKey(2, "payments-grp"))
    assert(gk.length == 2 + 2 + 12)
  }

  test("offset-commit values round-trip in both schema versions") {
    val v1 = offsetCommitValue(123456789L, "cursor@host", 1700000000000L,
      1701512000000L)
    assert(decodeOffsetValue(v1) ==
      OffsetValue(1, 123456789L, "cursor@host", 1700000000000L,
        1701512000000L))
    assert(v1.length == 2 + 8 + (2 + 11) + 8 + 8)
    val v0 = offsetCommitValueV0(42L, "", 1690000000000L)
    assert(decodeOffsetValue(v0) ==
      OffsetValue(0, 42L, "", 1690000000000L, -1L))
    assert(v0.length == 2 + 8 + 2 + 8)
    // Empty metadata is the tombstone-adjacent edge: zero-length STRING,
    // not null (the schema's STRING field is non-nullable).
    assert(decodeOffsetValue(offsetCommitValue(0L, "", 0L, 0L)).metadata
      == "")
  }

  test("group-metadata value round-trips with members, v1 and v0") {
    val members = Seq(
      MemberMeta("m0", "c-m0", "/10.0.0.1", 21600000, 28800000,
        "sub#m0".getBytes("UTF-8"), Array.fill(64)('x'.toByte)),
      MemberMeta("m1", "c-m1", "/10.0.0.2", 21600000, 28800000,
        "sub#m1".getBytes("UTF-8"), Array[Byte]()))
    val v1 = groupMetadataValue("consumer", 7, Some("range"), Some("m0"),
      members)
    val d1 = decodeGroupValue(v1)
    assert(d1.version == 1 && d1.protocolType == "consumer" &&
      d1.generation == 7 && d1.protocol.contains("range") &&
      d1.leader.contains("m0"))
    assert(d1.members.map(_.memberId) == Seq("m0", "m1"))
    assert(d1.members.head.rebalanceTimeoutMs == 21600000)
    assert(d1.members.head.subscription.toSeq ==
      "sub#m0".getBytes("UTF-8").toSeq)
    assert(d1.members.head.assignment.length == 64)
    assert(d1.members(1).assignment.isEmpty)
    // v0 drops rebalance_timeout (4 bytes per member), all else equal.
    val v0 = groupMetadataValue("consumer", 7, Some("range"), Some("m0"),
      members, version = 0)
    val d0 = decodeGroupValue(v0)
    assert(d0.version == 0 && d0.members.head.rebalanceTimeoutMs == -1 &&
      d0.members.head.sessionTimeoutMs == 28800000)
    assert(v0.length == v1.length - 4 * members.size)
  }

  test("empty group encodes null protocol/leader and zero members") {
    val v = groupMetadataValue("consumer", 4, None, None, Nil)
    val d = decodeGroupValue(v)
    assert(d.protocol.isEmpty && d.leader.isEmpty && d.members.isEmpty)
    // 2 ver + (2+8) protocol_type + 4 gen + 2 null + 2 null + 4 count
    assert(v.length == 2 + 10 + 4 + 2 + 2 + 4)
    // Non-empty members without a protocol must fail loudly (the
    // reference's checkState in groupMetadataValue).
    intercept[IllegalArgumentException] {
      groupMetadataValue("consumer", 1, None, None, Seq(
        MemberMeta("m0", "c", "/h", 1, 1, Array[Byte](), Array[Byte]())))
    }
  }

  test("distributed sizing queries agree with a direct re-encode") {
    val rows = queries("offsets_topic_codec")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.take(20).foreach { r =>
      val key = offsetCommitKey(r.getAs[String]("group_id"),
        r.getAs[String]("topic"), r.getAs[Long]("part").toInt)
      assert(key.length.toLong == r.getAs[Long]("key_bytes"))
      assert(r.getAs[Long]("total_bytes") ==
        r.getAs[Long]("key_bytes") + r.getAs[Long]("value_bytes"))
    }
    val groups = queries("group_metadata_codec")(spark, dir).collect()
    assert(groups.length == 4)
    // Memberless groups carry null protocol AND null leader together.
    groups.foreach { g =>
      assert((g.getAs[String]("protocol") == null) ==
        (g.getAs[String]("leader") == null))
      if (g.getAs[Long]("n_members") == 0L)
        assert(g.getAs[String]("protocol") == null)
    }
  }
}
