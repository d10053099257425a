package graft.data

import graft.Tables
import org.scalatest.funsuite.AnyFunSuite

/** ConnectedComponents.minLabel on the shapes that break naive
  * propagation: long chains (diameter = n without pointer jumping),
  * stars, cliques, singletons, and a randomized comparison against a
  * union-find ground truth.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("cc-spec", "4")

  private def run(n: Long, pairs: Seq[(Long, Long)], maxIters: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    val nodes = (0L until n).toDF("id")
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    ConnectedComponents.minLabel(nodes, edges, maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def unionFind(n: Long, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  test("a 60-node chain converges inside the O(log n) round budget") {
    val pairs = (0L until 59L).map(i => (i, i + 1))
    // without pointer jumping this needs 59 rounds and would throw at 10
    val got = run(60, pairs, maxIters = 10)
    assert(got.values.toSet == Set(0L), s"chain did not collapse: $got")
  }

  test("stars, cliques, singletons, and two components") {
    val star = (1L to 5L).map(i => (0L, i))
    val clique = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val got = run(16, star ++ clique) // 6,7,8,9,14,15 are singletons
    assert((1L to 5L).forall(got(_) == 0L))
    assert((10L to 13L).forall(got(_) == 10L))
    assert(Seq(6L, 7L, 8L, 9L, 14L, 15L).forall(i => got(i) == i))
  }

  test("randomized graphs match union-find ground truth") {
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { _ =>
      val n = 80L
      val pairs = Seq.fill(50)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(p => p._1 != p._2)
      assert(run(n, pairs) == unionFind(n, pairs))
    }
  }
}
