package graft.coordinator

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The offsets-topic wire format: the group coordinator's own versioned
  * key/value encode for __consumer_offsets messages
  * (/root/reference/kafka-impl/.../coordinator/group/
  * GroupMetadataConstants.java:64-256 — key version 0/1 = offset commit
  * [group, topic, partition], key version 2 = group metadata [group];
  * offset value v0 = [offset, metadata, timestamp], v1 = [offset,
  * metadata, commit_timestamp, expire_timestamp]; group value v1 =
  * [protocol_type, generation, protocol, leader, members[v1]] with
  * member v1 = [member_id, client_id, client_host, rebalance_timeout,
  * session_timeout, subscription, assignment]). Field carriers follow
  * Kafka's protocol types: STRING = int16 length + utf8,
  * NULLABLE_STRING = int16 length with -1 for null, BYTES = int32
  * length, INT32/INT64 big-endian — so the key version doubles as the
  * message-type discriminator exactly as the reference documents
  * ("key version is used to indicate the type of the message").
  *
  * GroupMetadataCodecSpec pins the lossless round trip (encode → decode,
  * all versions); the two registry queries below are oracle-exact on
  * byte-length accounting (DuckDB re-derives every length arithmetically,
  * so an encoder that framed a single field wrong hash-mismatches).
  */
object GroupMetadataCodec {

  // ---------------------------------------------------------------- encode

  private def putStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    require(b.length <= Short.MaxValue, "string exceeds int16 frame")
    out.writeShort(b.length); out.write(b)
  }

  private def putNullableStr(out: DataOutputStream, s: Option[String]): Unit =
    s match {
      case None => out.writeShort(-1)
      case Some(v) => putStr(out, v)
    }

  private def putBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length); out.write(b)
  }

  private def framed(f: DataOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    f(out); out.flush(); bos.toByteArray
  }

  /** Key for an offset-commit message (key schema version 1). */
  def offsetCommitKey(group: String, topic: String, partition: Int)
      : Array[Byte] = framed { out =>
    out.writeShort(1)
    putStr(out, group); putStr(out, topic); out.writeInt(partition)
  }

  /** Key for a group-metadata message (key schema version 2). */
  def groupMetadataKey(group: String): Array[Byte] = framed { out =>
    out.writeShort(2); putStr(out, group)
  }

  /** Offset-commit value, current version 1:
    * [offset, metadata, commit_timestamp, expire_timestamp].
    */
  def offsetCommitValue(offset: Long, metadata: String, commitTs: Long,
      expireTs: Long): Array[Byte] = framed { out =>
    out.writeShort(1)
    out.writeLong(offset); putStr(out, metadata)
    out.writeLong(commitTs); out.writeLong(expireTs)
  }

  /** Offset-commit value, legacy version 0: [offset, metadata, timestamp]. */
  def offsetCommitValueV0(offset: Long, metadata: String, ts: Long)
      : Array[Byte] = framed { out =>
    out.writeShort(0)
    out.writeLong(offset); putStr(out, metadata); out.writeLong(ts)
  }

  final case class MemberMeta(memberId: String, clientId: String,
      clientHost: String, rebalanceTimeoutMs: Int, sessionTimeoutMs: Int,
      subscription: Array[Byte], assignment: Array[Byte])

  /** Group-metadata value. `version` 0 omits each member's
    * rebalance_timeout (MEMBER_METADATA_V0); the reference's non-empty
    * check is honored: members require a non-null protocol.
    */
  def groupMetadataValue(protocolType: String, generation: Int,
      protocol: Option[String], leader: Option[String],
      members: Seq[MemberMeta], version: Short = 1): Array[Byte] = {
    require(members.isEmpty || protocol.isDefined,
      "non-empty group metadata requires a protocol")
    framed { out =>
      out.writeShort(version)
      putStr(out, protocolType)
      out.writeInt(generation)
      putNullableStr(out, protocol)
      putNullableStr(out, leader)
      out.writeInt(members.size)
      members.foreach { m =>
        putStr(out, m.memberId); putStr(out, m.clientId)
        putStr(out, m.clientHost)
        if (version > 0) out.writeInt(m.rebalanceTimeoutMs)
        out.writeInt(m.sessionTimeoutMs)
        putBytes(out, m.subscription); putBytes(out, m.assignment)
      }
    }
  }

  // ---------------------------------------------------------------- decode

  sealed trait BaseKey
  final case class OffsetKey(version: Short, group: String, topic: String,
      partition: Int) extends BaseKey
  final case class GroupKey(version: Short, group: String) extends BaseKey

  private def getStr(buf: ByteBuffer): String = {
    val len = buf.getShort()
    require(len >= 0, "null where STRING expected")
    val b = new Array[Byte](len); buf.get(b)
    new String(b, StandardCharsets.UTF_8)
  }

  private def getNullableStr(buf: ByteBuffer): Option[String] = {
    val len = buf.getShort()
    if (len < 0) None
    else { val b = new Array[Byte](len); buf.get(b)
      Some(new String(b, StandardCharsets.UTF_8)) }
  }

  private def getBytes(buf: ByteBuffer): Array[Byte] = {
    val len = buf.getInt()
    val b = new Array[Byte](len); buf.get(b); b
  }

  /** Version-dispatched key decode — the message-type discrimination the
    * compactor relies on (0/1 → offset commit, 2 → group metadata).
    */
  def decodeKey(bytes: Array[Byte]): BaseKey = {
    val buf = ByteBuffer.wrap(bytes)
    buf.getShort() match {
      case v @ (0 | 1) =>
        OffsetKey(v.toShort, getStr(buf), getStr(buf), buf.getInt())
      case 2 => GroupKey(2, getStr(buf))
      case v => throw new IllegalArgumentException(s"unknown key version $v")
    }
  }

  final case class OffsetValue(version: Short, offset: Long,
      metadata: String, commitTs: Long, expireTs: Long)

  def decodeOffsetValue(bytes: Array[Byte]): OffsetValue = {
    val buf = ByteBuffer.wrap(bytes)
    buf.getShort() match {
      case 0 =>
        val off = buf.getLong(); val md = getStr(buf); val ts = buf.getLong()
        OffsetValue(0, off, md, ts, -1L)
      case 1 =>
        OffsetValue(1, buf.getLong(), getStr(buf), buf.getLong(),
          buf.getLong())
      case v =>
        throw new IllegalArgumentException(s"unknown offset value version $v")
    }
  }

  final case class GroupValue(version: Short, protocolType: String,
      generation: Int, protocol: Option[String], leader: Option[String],
      members: Seq[MemberMeta])

  def decodeGroupValue(bytes: Array[Byte]): GroupValue = {
    val buf = ByteBuffer.wrap(bytes)
    val version = buf.getShort()
    require(version == 0 || version == 1,
      s"unknown group value version $version")
    val pt = getStr(buf); val gen = buf.getInt()
    val proto = getNullableStr(buf); val leader = getNullableStr(buf)
    val n = buf.getInt()
    val members = (0 until n).map { _ =>
      val mid = getStr(buf); val cid = getStr(buf); val host = getStr(buf)
      val rt = if (version > 0) buf.getInt() else -1
      MemberMeta(mid, cid, host, rt, buf.getInt(), getBytes(buf),
        getBytes(buf))
    }
    GroupValue(version, pt, gen, proto, leader, members)
  }

  // --------------------------------------------------------------- queries

  final case class CommitRow(group_id: String, topic: String,
      part: Long, offs: Long, metadata_len: Long, stored_len: Long,
      commit_ms: Long)
  final case class CommitSized(group_id: String, topic: String,
      part: Long, offs: Long, metadata_len: Long, key_bytes: Long,
      value_bytes: Long, total_bytes: Long)

  /** The expire horizon appended to every stored commit — the same
    * 17.5-day constant the group_state live-offset window uses, so the
    * codec and the state machine cannot disagree about offset lifetime.
    */
  val ExpireHorizonMs = 1512000000L

  /** Every stored offset-commit message sized through the REAL encoder:
    * per (group, topic, part) the key/value byte lengths of the
    * versioned wire format, over offset_commit_validation's stored
    * outcome (a rejected oversized commit stores the prior offset with
    * empty metadata). The oracle re-derives each length arithmetically
    * from the schema — 10 + |group| + |topic| for the v1 key, 28 +
    * stored metadata length for the v1 value.
    *
    * Scale: the commit universe is |groups| x |topic-partitions| metadata;
    * the encode is an in-row map, no extra exchange.
    */
  def offsetsTopicCodec(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val commits = Groups.commits(spark, dir)
      .select(col("group_id"), col("topic"), col("part"), col("commit_ms"))
    Groups.offsetCommitValidation(spark, dir)
      .join(broadcast(commits), Seq("group_id", "topic", "part"))
      .select(
        col("group_id"), col("topic"), col("part"),
        col("stored_committed").as("offs"),
        col("metadata_len"),
        when(col("outcome") === "NONE", col("metadata_len")).otherwise(0L)
          .as("stored_len"),
        col("commit_ms"))
      .as[CommitRow]
      .map { r =>
        val key = offsetCommitKey(r.group_id, r.topic, r.part.toInt)
        val value = offsetCommitValue(r.offs, "x" * r.stored_len.toInt,
          r.commit_ms, r.commit_ms + ExpireHorizonMs)
        CommitSized(r.group_id, r.topic, r.part, r.offs, r.metadata_len,
          key.length.toLong, value.length.toLong,
          key.length.toLong + value.length.toLong)
      }
      .toDF()
  }

  final case class MemberRow(m: Long, member: String,
      assignment_bytes: Long)
  final case class GroupRow(group_id: String, generation: Long,
      selected_protocol: String, n_alive: Long, members: Seq[MemberRow])
  final case class GroupSized(group_id: String, generation: Long,
      protocol: String, leader: String, n_members: Long, key_bytes: Long,
      value_bytes: Long, total_bytes: Long)

  /** Every group-metadata message sized through the REAL encoder: per
    * group the v2 key and v1 value lengths, composing the state machine
    * (generation, surviving members = the heartbeat-alive set), the
    * protocol election (protocol_select's winner — null for memberless
    * groups, honoring the reference's non-empty-implies-protocol check),
    * the leader (lowest alive member), and per-member assignment
    * payloads sized by the range-assignor output (assignment bytes =
    * memberAssignmentBytes, subscription = the member's subscription
    * token). The oracle re-derives the value length field by field.
    */
  def groupMetadataCodec(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Every input here is metadata-bounded (|groups| <= 4, |members| <=
    // 12): the r17 shape composed three multi-exchange subplans + two
    // joins + a typed-Dataset encode map into ONE 40-node plan — 19 tiny
    // AQE jobs of pure scheduling overhead per pass. Collect the three
    // bounded frames (their cached subplans execute once each) and run
    // the same encoder functions driver-side (guide §5); composition
    // semantics preserved exactly: proto inner join, members left join,
    // members sorted by m, leader = lowest alive member.
    val now = broadcast(Groups.nowMs(spark, dir))
    val alive = Groups.memberHeartbeats(spark, dir)
      .crossJoin(now)
      .filter(col("now_ms") - col("last_hb_ms") <= 28800000L)
      .select(col("g"), col("m"))
      .join(broadcast(Groups.memberAssignmentBytes(spark, dir)), "m")
      .select(col("g"), col("m"), col("assignment_bytes"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val proto = Groups.protocolSelect(spark, dir)
      .select(col("group_id"), col("selected_protocol"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val gstate = Groups.groupState(spark, dir)
      .select(col("group_id"), col("generation"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byGroup = alive.groupBy { case (g, _, _) => "g" + g }
    val out = gstate.toSeq.flatMap { case (groupId, generation) =>
      proto.get(groupId).map { selectedProtocol =>
        val ms = byGroup.getOrElse(groupId, Array.empty).sortBy(_._2)
        val hasMembers = ms.nonEmpty
        val protocol = if (hasMembers) Some(selectedProtocol) else None
        val leader = if (hasMembers) Some("m" + ms.head._2) else None
        val members = ms.toSeq.map { case (_, m, assignmentBytes) =>
          MemberMeta("m" + m, "c-m" + m,
            "/10.0.0." + (m + 1),
            21600000, 28800000,
            ("sub#m" + m).getBytes(StandardCharsets.UTF_8),
            Array.fill(assignmentBytes.toInt)('x'.toByte))
        }
        val key = groupMetadataKey(groupId)
        val value = groupMetadataValue("consumer", generation.toInt,
          protocol, leader, members)
        GroupSized(groupId, generation,
          protocol.orNull, leader.orNull, members.size.toLong,
          key.length.toLong, value.length.toLong,
          key.length.toLong + value.length.toLong)
      }
    }
    out.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "offsets_topic_codec" -> offsetsTopicCodec,
    "group_metadata_codec" -> groupMetadataCodec)

  private val L = graft.log.LogOps.logSqlCte

  val oracles: Map[String, String] = Map(
    // Lengths from the schema, never from the encoder: v1 key = 2
    // (version) + (2+|group|) + (2+|topic|) + 4; v1 value = 2 + 8 +
    // (2+stored metadata) + 8 + 8. Stored metadata follows
    // offset_commit_validation's outcome.
    "offsets_topic_codec" -> (L + Groups.commitsSql +
      s"""SELECT group_id, topic, part,
        |  CASE WHEN metadata_len <= 4096 THEN committed
        |    ELSE (log_end * g) // 5 END AS offs,
        |  metadata_len,
        |  CAST(10 + length(group_id) + length(topic) AS BIGINT) AS key_bytes,
        |  CAST(28 + (CASE WHEN metadata_len <= 4096 THEN metadata_len
        |    ELSE 0 END) AS BIGINT) AS value_bytes,
        |  CAST(38 + length(group_id) + length(topic) +
        |    (CASE WHEN metadata_len <= 4096 THEN metadata_len ELSE 0 END)
        |    AS BIGINT) AS total_bytes
        |FROM (
        |  SELECT *, ${graft.functions.Parity.md5LongSql(
             "concat_ws('#', 'commitmeta', group_id, topic, part)")} % 6000
        |    AS metadata_len
        |  FROM commits)""".stripMargin),
    // v2 key = 2 + (2+|group|). v1 value = 2 + (2+|'consumer'|) + 4 +
    // protocol (2+|p| or 2 when null) + leader (2+|l| or 2) + 4 + per
    // alive member: (2+|member|) + (2+|'c-'||member|) + (2+|host|) + 4 +
    // 4 + (4+|'sub#'||member|) + (4+assignment_bytes).
    "group_metadata_codec" -> (L + Groups.commitsSql.stripSuffix("\n") +
      ",\n" + memberHbChainForCodec),
  )

  /** The group_metadata_codec oracle body (kept out of the map literal
    * for readability): chains the gstate machine, the protocol election,
    * the alive-member set, and the assignment-size frame.
    */
  private lazy val memberHbChainForCodec: String = {
    val hb = Groups.memberHbSql
    val gs = Groups.gstateSql
    val proto = Groups.protoVoteSql
    hb + gs + ", " + proto +
      s""",
        |${Groups.abSql},
        |alv AS (
        |  SELECT g, m FROM mh CROSS JOIN nw
        |  WHERE now_ms - last_hb_ms <= 28800000),
        |mb AS (
        |  SELECT alv.g,
        |    CAST(COUNT(*) AS BIGINT) AS n_members,
        |    CAST(SUM((2 + length('m' || CAST(alv.m AS VARCHAR)))
        |      + (2 + length('c-m' || CAST(alv.m AS VARCHAR)))
        |      + (2 + length('/10.0.0.' || CAST(alv.m + 1 AS VARCHAR)))
        |      + 4 + 4
        |      + (4 + length('sub#m' || CAST(alv.m AS VARCHAR)))
        |      + (4 + ab.assignment_bytes)) AS BIGINT) AS members_bytes,
        |    MIN(alv.m) AS leader_m
        |  FROM alv JOIN ab ON ab.m = alv.m
        |  GROUP BY alv.g),
        |rows_ AS (
        |  SELECT gs.group_id, gs.generation,
        |    CASE WHEN mb.g IS NOT NULL THEN psel.vote END AS protocol,
        |    CASE WHEN mb.g IS NOT NULL
        |      THEN 'm' || CAST(mb.leader_m AS VARCHAR) END AS leader,
        |    COALESCE(mb.n_members, 0) AS n_members,
        |    CAST(4 + length(gs.group_id) AS BIGINT) AS key_bytes,
        |    CAST(2 + (2 + 8) + 4
        |      + (CASE WHEN mb.g IS NOT NULL THEN 2 + length(psel.vote)
        |          ELSE 2 END)
        |      + (CASE WHEN mb.g IS NOT NULL
        |          THEN 2 + length('m' || CAST(mb.leader_m AS VARCHAR))
        |          ELSE 2 END)
        |      + 4 + COALESCE(mb.members_bytes, 0) AS BIGINT) AS value_bytes
        |  FROM gs
        |  JOIN psel ON 'g' || CAST(psel.g AS VARCHAR) = gs.group_id
        |  LEFT JOIN mb ON 'g' || CAST(mb.g AS VARCHAR) = gs.group_id)
        |SELECT group_id, generation, protocol, leader, n_members,
        |  key_bytes, value_bytes, key_bytes + value_bytes AS total_bytes
        |FROM rows_""".stripMargin
  }
}
