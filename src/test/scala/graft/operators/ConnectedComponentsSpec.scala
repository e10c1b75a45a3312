package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.minLabel(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap

  /** Force the distributed propagation rounds (threshold 0 disables the
    * adaptive driver-side union-find). */
  private def ccDist(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.minLabel(edges.toDF("s", "d"), "s", "d",
      localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap

  /** Driver-side union-find ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("two components and a chain get their min ids") {
    // chain 5-3-9 plus pair (2,8); 7 appears only via (7,7)-free edges
    val edges = Seq((5L, 3L), (3L, 9L), (2L, 8L))
    assert(cc(edges) === Map(5L -> 3L, 3L -> 3L, 9L -> 3L, 2L -> 2L,
      8L -> 2L))
  }

  test("long path needs multiple propagation rounds") {
    // 0-1-2-...-12 as a path: diameter 12, min label must walk the chain
    val edges = (0L until 12L).map(i => (i + 1, i))
    val got = cc(edges)
    assert(got.size === 13)
    assert(got.values.toSet === Set(0L))
  }

  test("matches union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong,
      rnd.nextInt(120).toLong)).filter(e => e._1 != e._2)
    assert(cc(edges) === unionFind(edges))
  }

  test("distributed rounds match the local path and union-find") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(250)((rnd.nextInt(90).toLong,
      rnd.nextInt(90).toLong)).filter(e => e._1 != e._2)
    val want = unionFind(edges)
    assert(ccDist(edges) === want)
    assert(cc(edges) === want)
    // the long-path worst case through the distributed rounds too
    val path = (0L until 12L).map(i => (i + 1, i))
    assert(ccDist(path).values.toSet === Set(0L))
  }

  test("self-contained cliques converge (near-dup shape)") {
    // three 4-cliques with disjoint ids
    val edges = for {
      base <- Seq(100L, 200L, 300L)
      i <- 0 until 4; j <- (i + 1) until 4
    } yield (base + i, base + j)
    val got = cc(edges)
    assert(got === edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> (n / 100 * 100)).toMap)
  }
}
