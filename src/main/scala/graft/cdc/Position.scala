package graft.cdc

/** Resumable stream coordinates — GTID or log-position mode.
  *
  * Re-expressed from the reference's position model
  * (`replication_handler/util/position.py:27-211`): a saved position is a
  * small string map persisted in state, reconstructed on startup
  * (`components/position_finder.py:29-45`), and turned into the
  * source-resume arguments (`to_replication_dict`).
  *
  * GTID auto-position arithmetic (reference `position.py:74-107`): a GTID
  * `sid:N` names transaction N; the resume set `sid:1-M` means
  * transactions `[1, M)` are committed and tailing resumes at M.
  *  - saved `sid:N` with NO in-transaction offset → the whole transaction
  *    was published → resume set `sid:1-(N+1)` (start at N+1);
  *  - saved `sid:N` WITH a nonzero offset → re-enter transaction N and
  *    skip `offset` row images → resume set `sid:1-N`.
  * The reference uses Python truthiness (`if self.gtid and self.offset`),
  * so offset 0 behaves exactly like "no offset" — preserved here.
  */
sealed trait Position {
  def offset: Option[Int]

  /** State-store form (reference `to_dict`). */
  def toDict: Map[String, String]

  /** Source-resume form (reference `to_replication_dict`). */
  def toReplicationDict: Map[String, String]

  /** Transaction-id meta attribute payload (reference
    * `get_transaction_id` via `util/transaction_id.py`). */
  def transactionId(clusterName: String): Map[String, String]
}

final case class GtidPosition(gtid: Option[String] = None, offset: Option[Int] = None)
    extends Position {

  private def offsetTruthy: Boolean = offset.exists(_ != 0)

  def toDict: Map[String, String] =
    gtid.map("gtid" -> _).toMap ++
      offset.filter(_ != 0).map(o => "offset" -> o.toString).toMap

  def toReplicationDict: Map[String, String] = gtid match {
    case Some(g) if offsetTruthy => Map("auto_position" -> GtidPosition.gtidSet(g))
    case Some(g) => Map("auto_position" -> GtidPosition.nextGtidSet(g))
    case None => Map.empty
  }

  def transactionId(clusterName: String): Map[String, String] =
    Map("cluster_name" -> clusterName, "gtid" -> gtid.getOrElse(""))
}

object GtidPosition {
  private def split(gtid: String): (String, Long) = {
    val i = gtid.lastIndexOf(':')
    require(i > 0 && i < gtid.length - 1, s"malformed gtid: $gtid")
    (gtid.substring(0, i), gtid.substring(i + 1).toLong)
  }

  /** `sid:N` → `sid:1-N` (re-enter transaction N; reference `_format_gtid_set`). */
  def gtidSet(gtid: String): String = {
    val (sid, txn) = split(gtid)
    s"$sid:1-$txn"
  }

  /** `sid:N` → `sid:1-(N+1)` (N fully published; reference `_format_next_gtid_set`). */
  def nextGtidSet(gtid: String): String = {
    val (sid, txn) = split(gtid)
    s"$sid:1-${txn + 1}"
  }

  /** The transaction tailing resumes at: the (exclusive) upper bound of the
    * auto-position set produced by [[GtidPosition.toReplicationDict]]. */
  def resumeTxn(gtid: String, offset: Option[Int]): Long = {
    val auto = GtidPosition(Some(gtid), offset).toReplicationDict("auto_position")
    auto.substring(auto.lastIndexOf('-') + 1).toLong
  }
}

final case class LogPosition(
    logPos: Option[Long] = None,
    logFile: Option[String] = None,
    offset: Option[Int] = None,
    hbSerial: Option[Long] = None,
    hbTimestamp: Option[Long] = None)
    extends Position {

  // Reference `position.py:139-149`: log_pos/log_file and hb_* are gated on
  // truthiness, offset on `is not None` — offset 0 IS persisted here.
  def toDict: Map[String, String] = {
    val pos = (logPos, logFile) match {
      case (Some(p), Some(f)) if p != 0 && f.nonEmpty =>
        Map("log_pos" -> p.toString, "log_file" -> f)
      case _ => Map.empty[String, String]
    }
    val hb = (hbSerial, hbTimestamp) match {
      case (Some(s), Some(t)) if s != 0 && t != 0 =>
        Map("hb_serial" -> s.toString, "hb_timestamp" -> t.toString)
      case _ => Map.empty[String, String]
    }
    pos ++ offset.map(o => "offset" -> o.toString).toMap ++ hb
  }

  def toReplicationDict: Map[String, String] = (logPos, logFile) match {
    case (Some(p), Some(f)) if p != 0 && f.nonEmpty =>
      Map("log_pos" -> p.toString, "log_file" -> f)
    case _ => Map.empty
  }

  def transactionId(clusterName: String): Map[String, String] =
    Map("cluster_name" -> clusterName,
      "log_file" -> logFile.getOrElse(""),
      "log_pos" -> logPos.getOrElse(0L).toString)
}

/** The location of a heartbeat event (reference `position.py:186-211`). */
final case class HeartbeatPosition(
    hbSerial2: Long, hbTimestamp2: Long, logPos2: Long, logFile2: String, offset2: Int = 0) {
  def toLogPosition: LogPosition =
    LogPosition(Some(logPos2), Some(logFile2), Some(offset2), Some(hbSerial2), Some(hbTimestamp2))
}

class InvalidPositionDictException(msg: String) extends RuntimeException(msg)

object Position {

  /** Reference `construct_position` (`position.py:164-181`). */
  def construct(dict: Map[String, String]): Position =
    if (dict.contains("gtid"))
      GtidPosition(dict.get("gtid"), dict.get("offset").map(_.toInt))
    else if (dict.contains("log_pos") && dict.contains("log_file"))
      LogPosition(
        dict.get("log_pos").map(_.toLong),
        dict.get("log_file"),
        dict.get("offset").map(_.toInt),
        dict.get("hb_serial").map(_.toLong),
        dict.get("hb_timestamp").map(_.toLong))
    else throw new InvalidPositionDictException(s"not a position: $dict")

  /** Reference `PositionFinder.get_position_to_resume_tailing_from`
    * (`position_finder.py:42-45`): saved state wins; otherwise an empty
    * position of the configured mode. */
  def toResumeFrom(gtidEnabled: Boolean, saved: Option[Map[String, String]]): Position =
    saved match {
      case Some(dict) => construct(dict)
      case None => if (gtidEnabled) GtidPosition() else LogPosition()
    }
}
