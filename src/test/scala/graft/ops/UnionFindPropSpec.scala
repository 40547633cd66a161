package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property: the union-find fast path of
  * [[TextDedup.canonicalize]] computes exactly the min-label connected
  * components, checked against an independent BFS reference on random
  * graphs (including self-loops, duplicate edges, and disconnected nodes).
  */
class UnionFindPropSpec extends AnyFunSuite {

  private def bfsMinLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    def add(a: Long, b: Long): Unit = adj.update(a, b :: adj.getOrElse(a, Nil))
    edges.foreach { case (a, b) => add(a, b); add(b, a) }
    val seen = scala.collection.mutable.Set.empty[Long]
    val out = scala.collection.mutable.Map.empty[Long, Long]
    for (start <- adj.keys) if (!seen.contains(start)) {
      // collect the whole component, then label with its minimum
      val comp = scala.collection.mutable.ListBuffer.empty[Long]
      val queue = scala.collection.mutable.Queue(start)
      seen += start
      while (queue.nonEmpty) {
        val x = queue.dequeue()
        comp += x
        adj.getOrElse(x, Nil).foreach { y =>
          if (!seen.contains(y)) { seen += y; queue.enqueue(y) }
        }
      }
      val lbl = comp.min
      comp.foreach(x => out.update(x, lbl))
    }
    out.toMap
  }

  test("property: unionFindMinLabels equals BFS min-label components") {
    val edgeGen = for {
      a <- Gen.choose(0L, 40L)
      b <- Gen.choose(0L, 40L)
    } yield (a, b)
    val p = Prop.forAll(Gen.listOf(edgeGen)) { edges: List[(Long, Long)] =>
      TextDedup.unionFindMinLabels(edges.iterator) == bfsMinLabels(edges)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }
}
