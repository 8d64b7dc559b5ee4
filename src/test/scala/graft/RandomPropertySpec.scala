package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized contract pins: the distributed implementations must agree
  * with naive in-memory references on seeded random inputs — shapes the
  * hand-written cases can't enumerate (dense tie structures, inverted
  * intervals, up-then-down component paths). Seeds are fixed: failures
  * reproduce. */
class RandomPropertySpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  test("asof join agrees with a naive latest-before scan on random data") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val events = (0 until 120).map(i => (i.toLong, rng.nextInt(5).toLong, rng.nextInt(50).toLong))
      // distinct (key, time) per fact so "latest" is unambiguous
      val facts = rng.shuffle(
        (for (k <- 0L until 5L; t <- 0L until 60L) yield (k, t)).toSeq)
        .take(80).map { case (k, t) => (k, t, s"p$k-$t") }
      val ev = events.toDF("event_id", "k", "t")
      val fa = facts.toDF("fk", "ft", "payload")
      val got = graft.ops.AsofJoin.asof(ev, fa, "k", "fk", "t", "ft", Seq("payload"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
      val want = events.map { case (id, k, t) =>
        id -> facts.filter(f => f._1 == k && f._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("binnedRangeJoin agrees with the naive BETWEEN join on random intervals") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(100 + seed)
      val points = (0 until 150).map(_ => (rng.nextInt(4).toLong, rng.nextInt(200).toLong))
        .distinct.map { case (k, t) => (k, t) }
      val intervals = (0 until 40).map { i =>
        val s = rng.nextInt(220) - 10L
        val e = s + rng.nextInt(30) - 5L // ~1/6 inverted
        (rng.nextInt(5).toLong, i.toLong, s, e)
      }
      val pdf = points.toDF("k", "t")
      val idf = intervals.toDF("k", "iid", "s", "e")
      val want = (for {
        (pk, t) <- points
        (ik, iid, s, e) <- intervals
        if ik == pk && t >= s && t <= e
      } yield (iid, t)).toSet
      for (w <- Seq(1L, 16L, 1024L)) {
        val got = graft.ops.RangeJoin.binnedRangeJoin(
            pdf, idf, Seq("k"), "t", "s", "e", binWidth = w)
          .select("iid", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"seed=$seed width=$w")
      }
    }
  }

  test("connectedComponents agrees with union-find on random graphs") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(200 + seed)
      val n = 40
      val edges = (0 until 45).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // naive union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map { i =>
        i.toLong -> (0 until n).filter(j => find(j) == find(i)).min.toLong
      }.toMap
      val got = graft.ops.Cluster.connectedComponents(
          (0L until n.toLong).toDF("id"), "id", edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed=$seed")
    }
  }
}
