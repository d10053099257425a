package graft.data

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized equivalence for the q30 ordered-funnel logic: the staged
  * join/min-agg chain must agree with a straight-line reference that
  * walks each user's event list chronologically — including the shapes
  * the fixed corpus underexercises (conversions out of order, repeated
  * stages, users missing middle stages, exact-timestamp ties).
  */
class FunnelSpec extends AnyFunSuite {

  // Tables.session, NOT a bare builder: getOrCreate would otherwise let
  // this suite win the JVM-wide session race WITHOUT GraftExtensions,
  // breaking any concurrently-run suite that needs the native functions
  private lazy val spark = Tables.session("funnel-spec", "4")

  private val Stages = Seq("signup", "view", "click", "purchase")

  /** Straight-line reference: first occurrence of each stage STRICTLY
    * after the previous stage's chosen timestamp. */
  private def reference(events: Seq[(Long, String, Long)]): Seq[Long] = {
    val byUser = events.groupBy(_._1)
    def converts(evs: Seq[(Long, String, Long)], depth: Int): Boolean = {
      var bound = Long.MinValue
      var ok = true
      Stages.take(depth).zipWithIndex.foreach { case (stage, i) =>
        if (ok) {
          val cand = evs.filter(e => e._2 == stage &&
            (if (i == 0) true else e._3 > bound)).map(_._3)
          if (cand.isEmpty) ok = false else bound = cand.min
        }
      }
      ok
    }
    (1 to Stages.size).map(d => byUser.count { case (_, evs) => converts(evs, d) }.toLong)
  }

  /** Drives the PRODUCTION stage chain (RelationalQueries.funnelStages)
    * over the randomized frame — a change to the q30 logic fails here. */
  private def run(events: Seq[(Long, String, Long)]): Seq[Long] = {
    import spark.implicits._
    val ev = events.toDF("user_id", "event_type", "ts_us")
    RelationalQueries.funnelStages(ev).map(_.count())
  }

  test("q30 funnel stage counts agree with the chronological-walk reference") {
    val rnd = new Random(11)
    (1 to 4).foreach { trial =>
      val types = Stages ++ Seq("error") // noise type never converts
      val events = (1 to 200).map { _ =>
        (1L + rnd.nextInt(15), types(rnd.nextInt(types.size)),
          1000L * rnd.nextInt(50)) // coarse ts: forces exact-tie cases
      }
      assert(run(events) === reference(events), s"trial $trial")
    }
  }
}
