package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** GTID / log-position arithmetic corners (reference
  * replication_handler/util/position.py:27-211, components/position_finder.py:29-45).
  */
class PositionSpec extends AnyFunSuite {

  test("gtid without offset resumes at the NEXT transaction (sid:13 -> sid:1-14)") {
    assert(GtidPosition(Some("sid:13")).toReplicationDict ===
      Map("auto_position" -> "sid:1-14"))
    assert(GtidPosition.resumeTxn("sid:13", None) === 14L)
  }

  test("gtid with offset re-enters the SAVED transaction (sid:13, off 10 -> sid:1-13)") {
    assert(GtidPosition(Some("sid:13"), Some(10)).toReplicationDict ===
      Map("auto_position" -> "sid:1-13"))
    assert(GtidPosition.resumeTxn("sid:13", Some(10)) === 13L)
  }

  test("offset 0 behaves like no offset (reference Python truthiness)") {
    assert(GtidPosition(Some("sid:13"), Some(0)).toReplicationDict ===
      Map("auto_position" -> "sid:1-14"))
    assert(GtidPosition(Some("sid:13"), Some(0)).toDict === Map("gtid" -> "sid:13"))
  }

  test("uuid sids with colons split on the LAST colon") {
    val sid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    assert(GtidPosition(Some(s"$sid:42")).toReplicationDict ===
      Map("auto_position" -> s"$sid:1-43"))
  }

  test("empty gtid position produces an empty replication dict") {
    assert(GtidPosition().toReplicationDict === Map.empty)
    assert(GtidPosition().toDict === Map.empty)
  }

  test("log position round-trips through to_dict/construct; offset 0 is kept") {
    val p = LogPosition(Some(120L), Some("binlog.000002"), Some(0), Some(7L), Some(1234L))
    val d = p.toDict
    assert(d === Map("log_pos" -> "120", "log_file" -> "binlog.000002",
      "offset" -> "0", "hb_serial" -> "7", "hb_timestamp" -> "1234"))
    assert(Position.construct(d) === p)
    assert(p.toReplicationDict === Map("log_pos" -> "120", "log_file" -> "binlog.000002"))
  }

  test("gtid position round-trips through to_dict/construct") {
    val p = GtidPosition(Some("sid:9"), Some(3))
    assert(Position.construct(p.toDict) === p)
  }

  test("construct rejects a dict that is neither mode") {
    intercept[InvalidPositionDictException] {
      Position.construct(Map("offset" -> "1"))
    }
  }

  test("position finder: saved state wins, else empty position of the configured mode") {
    assert(Position.toResumeFrom(gtidEnabled = true, None) === GtidPosition())
    assert(Position.toResumeFrom(gtidEnabled = false, None) === LogPosition())
    assert(Position.toResumeFrom(gtidEnabled = true,
      Some(Map("gtid" -> "sid:5"))) === GtidPosition(Some("sid:5")))
    // a saved log position is honored even in gtid mode (construct_position
    // dispatches on the dict's keys, not the flag)
    assert(Position.toResumeFrom(gtidEnabled = true,
      Some(Map("log_pos" -> "4", "log_file" -> "binlog.000001"))) ===
      LogPosition(Some(4L), Some("binlog.000001")))
  }

  test("transaction-id meta carries cluster + coordinates") {
    assert(GtidPosition(Some("sid:5")).transactionId("refcluster") ===
      Map("cluster_name" -> "refcluster", "gtid" -> "sid:5"))
    assert(LogPosition(Some(4L), Some("binlog.000001")).transactionId("refcluster") ===
      Map("cluster_name" -> "refcluster", "log_file" -> "binlog.000001", "log_pos" -> "4"))
  }

  test("heartbeat position lowers to a log position carrying its serial") {
    val hb = HeartbeatPosition(11L, 99L, 400L, "binlog.000003")
    assert(hb.toLogPosition.hbSerial === Some(11L))
    assert(hb.toLogPosition.toReplicationDict ===
      Map("log_pos" -> "400", "log_file" -> "binlog.000003"))
  }
}
