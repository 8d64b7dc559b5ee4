package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cluster

/** Connected-components label propagation: transitive chains collapse,
  * the minimum label crosses "up-then-down" paths (reachable only through
  * a LARGER id), isolated nodes stay singletons, and the loop converges
  * within the diameter bound without leaking caches. */
class ClusterSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  test("components collapse chains, route min through larger ids, keep singletons") {
    // {3,5,9}: 5 reaches min 3 only VIA 9 (up-then-down — needs >1 round);
    // {10..13}: a diameter-3 chain; {20}: isolated
    val nodes = (Seq(3L, 5L, 9L, 10L, 11L, 12L, 13L, 20L)).toDF("id")
    val edges = Seq((3L, 9L), (5L, 9L), (10L, 11L), (11L, 12L), (12L, 13L))
      .toDF("a", "b")
    val got = Cluster.connectedComponents(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L))
  }

  test("non-convergence at maxIter fails loudly instead of splitting components") {
    // diameter-6 chain, cap of 3: partially-propagated labels would
    // silently under-merge — the round-4 advice asks for a loud failure
    graft.ops.CacheScope.withScope { scope =>
      val nodes = (0L to 6L).toDF("id")
      val edges = (0L until 6L).map(i => (i, i + 1)).toDF("a", "b")
      val e = intercept[IllegalArgumentException] {
        Cluster.connectedComponents(nodes, "id", edges, "a", "b",
          maxIter = 3, scope = scope)
      }
      assert(e.getMessage.contains("did not reach fixpoint"))
    }
  }

  test("scoped run unpersists every iteration cache") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    graft.ops.CacheScope.withScope { scope =>
      val nodes = (0L to 12L).toDF("id")
      val edges = (0L until 12L).map(i => (i, i + 1)).toDF("a", "b") // one long chain
      val labels = Cluster.connectedComponents(nodes, "id", edges, "a", "b",
        maxIter = 15, scope = scope)
      assert(labels.agg(max(col("component"))).head().getLong(0) == 0L)
    }
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      s"leaked: ${(sc.getPersistentRDDs.keySet -- before).toSeq.sorted}")
  }

  test("star variant matches label propagation on chains, stars and singletons") {
    val nodes = (Seq(3L, 5L, 9L, 10L, 11L, 12L, 13L, 20L)).toDF("id")
    val edges = Seq((3L, 9L), (5L, 9L), (10L, 11L), (11L, 12L), (12L, 13L))
      .toDF("a", "b")
    val got = Cluster.connectedComponentsStar(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L))
  }

  test("star variant resolves a diameter-60 path in logarithmic rounds") {
    // the megacluster pathology: label propagation needs DIAMETER rounds
    // (60 here — its own cap of 20 fails loudly on this graph), the
    // star alternation stays within its default log-bound cap of 30
    graft.ops.CacheScope.withScope { scope =>
      val nodes = (0L to 60L).toDF("id")
      val edges = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
      val lp = intercept[IllegalArgumentException] {
        Cluster.connectedComponents(nodes, "id", edges, "a", "b",
          maxIter = 20, scope = scope)
      }
      assert(lp.getMessage.contains("did not reach fixpoint"))
      val got = Cluster.connectedComponentsStar(nodes, "id", edges, "a", "b",
        scope = scope)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (0L to 60L).map(_ -> 0L).toMap)
    }
  }

  test("star variant: non-convergence at maxIter fails loudly") {
    graft.ops.CacheScope.withScope { scope =>
      val nodes = (0L to 32L).toDF("id")
      val edges = (0L until 32L).map(i => (i, i + 1)).toDF("a", "b")
      val e = intercept[IllegalArgumentException] {
        Cluster.connectedComponentsStar(nodes, "id", edges, "a", "b",
          maxIter = 1, scope = scope)
      }
      assert(e.getMessage.contains("did not reach fixpoint"))
    }
  }

  test("auto strategy resolves the diameter-60 chain WITHOUT a flag (star fallback)") {
    // the round-10 carry: label propagation's cap used to force the
    // operator choice onto the caller; auto probes labelprop for a few
    // rounds, detects non-convergence, and silently degrades to the
    // logarithmic star rounds — same labels, no exception
    graft.ops.CacheScope.withScope { scope =>
      val nodes = (0L to 60L).toDF("id")
      val edges = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
      val got = Cluster.connectedComponentsAuto(nodes, "id", edges, "a", "b",
        scope = scope)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (0L to 60L).map(_ -> 0L).toMap)
    }
  }

  test("auto strategy on a clique graph returns label propagation's answer") {
    graft.ops.CacheScope.withScope { scope =>
      val nodes = (Seq(3L, 5L, 9L, 10L, 11L, 12L, 13L, 20L)).toDF("id")
      val edges = Seq((3L, 9L), (5L, 9L), (10L, 11L), (11L, 12L), (12L, 13L))
        .toDF("a", "b")
      val got = Cluster.connectedComponentsAuto(nodes, "id", edges, "a", "b",
        scope = scope)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
        10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L))
    }
  }

  test("resolveComponents dispatches all three strategies; unknown fails loudly") {
    graft.ops.CacheScope.withScope { scope =>
      val nodes = (0L to 3L).toDF("id")
      val edges = Seq((0L, 1L), (2L, 3L)).toDF("a", "b")
      val want = Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L)
      for (s <- Seq("labelprop", "star", "auto")) {
        val got = Cluster.resolveComponents(s, nodes, "id", edges, "a", "b", scope)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"strategy $s")
      }
      val e = intercept[IllegalArgumentException] {
        Cluster.resolveComponents("bogus", nodes, "id", edges, "a", "b", scope)
      }
      assert(e.getMessage.contains("unknown cc strategy"))
    }
  }

  test("auto fallback leaks no caches (the probe's partial labels unpersist)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    graft.ops.CacheScope.withScope { scope =>
      val nodes = (0L to 40L).toDF("id")
      val edges = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
      val labels = Cluster.connectedComponentsAuto(nodes, "id", edges, "a", "b",
        scope = scope)
      assert(labels.agg(max(col("component"))).head().getLong(0) == 0L)
    }
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      s"leaked: ${(sc.getPersistentRDDs.keySet -- before).toSeq.sorted}")
  }

  test("star variant: scoped run unpersists every round cache") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    graft.ops.CacheScope.withScope { scope =>
      val nodes = (0L to 12L).toDF("id")
      val edges = (0L until 12L).map(i => (i, i + 1)).toDF("a", "b")
      val labels = Cluster.connectedComponentsStar(nodes, "id", edges, "a", "b",
        scope = scope)
      assert(labels.agg(max(col("component"))).head().getLong(0) == 0L)
    }
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      s"leaked: ${(sc.getPersistentRDDs.keySet -- before).toSeq.sorted}")
  }

  test("leakageSafeSplit: clusters land whole, assignment is the component hash") {
    // components: {0,1,2}, {3,4}, singletons 5..9 — every edge's two
    // endpoints MUST receive the same split (zero within-cluster leakage
    // by construction), and the split equals hashSplit(component)
    val nodes = (0L to 9L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("a", "b")
    val comps = Cluster.connectedComponents(nodes, "id", edges, "a", "b")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Cluster.leakageSafeSplit(comps, "id", "component", splits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = got.map(r => r._1 -> r._3).toMap
    // zero leakage across every clustered pair
    for ((a, b) <- Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L)))
      assert(byId(a) == byId(b), s"pair ($a,$b) straddles splits")
    // the draw is the component's own q46 hash draw — cross-checked
    // against hashSplit applied directly to the component id
    val expect = nodes.select(col("id"),
      graft.ops.TextAnalysis.hashSplit(col("id"), splits).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, comp, s) <- got) assert(s == expect(comp), s"id=$id")
  }

  test("dedupDividend prices non-canonical mass per group") {
    // components: {0,1,2} (canonical 0), {3,4} (canonical 3), {5} —
    // dups are 1,2 (s1) and 4 (s2)
    val nodes = (0L to 5L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("a", "b")
    val comps = Cluster.connectedComponents(nodes, "id", edges, "a", "b")
    val docs = Seq(
      (0L, "s1", 10L), (1L, "s1", 20L), (2L, "s1", 30L),
      (3L, "s2", 5L), (4L, "s2", 7L), (5L, "s2", 100L)).toDF("id", "src", "nt")
    val got = Cluster.dedupDividend(comps, "id", "component", docs, "id", "src", "nt")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got("s1") == (3L, 2L, 60L, 50L, 0.833333))
    assert(got("s2") == (3L, 1L, 112L, 7L, 0.0625))
  }

  test("leakageSafeSplit degrades to the plain doc-key split when no pairs exist") {
    // singleton components ⇒ component id == doc id ⇒ the assignment IS
    // q46's hashSplit(doc_id) — the op costs nothing extra on a clean
    // corpus
    val nodes = (0L to 30L).toDF("id")
    val comps = Cluster.connectedComponents(nodes, "id",
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Cluster.leakageSafeSplit(comps, "id", "component", splits)
      .select(col("id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val plain = nodes.select(col("id"),
        graft.ops.TextAnalysis.hashSplit(col("id"), splits).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == plain)
  }

  test("dividendCurve reprices clusters as the cutoff moves") {
    // at 0.5: {0,1,2} + {3,4} → dups 1,2,4 (30 tokens, 2 clusters);
    // at 0.7: only (0,1) survives → dup 1; at 0.99: nothing
    val nodes = (0L to 5L).toDF("id")
    val pairs = Seq((0L, 1L, 0.95), (1L, 2L, 0.6), (3L, 4L, 0.55))
      .toDF("a", "b", "j")
    val sizes = (0L to 5L).map(i => (i, 10L)).toDF("id", "nt")
    val got = Cluster.dividendCurve(nodes, "id", pairs, "a", "b", "j",
        sizes, "id", "nt", Seq(0.5, 0.7, 0.99))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0.5) == (3L, 30L, 2L))
    assert(got(0.7) == (1L, 10L, 1L))
    assert(got(0.99) == (0L, 0L, 0L))
  }

  test("dividendCurve await is bounded: non-positive maxWaitSec fails loudly up front") {
    val nodes = (0L to 2L).toDF("id")
    val pairs = Seq((0L, 1L, 0.9)).toDF("a", "b", "j")
    val sizes = (0L to 2L).map(i => (i, 10L)).toDF("id", "nt")
    val e = intercept[IllegalArgumentException] {
      Cluster.dividendCurve(nodes, "id", pairs, "a", "b", "j",
        sizes, "id", "nt", Seq(0.5), maxWaitSec = 0)
    }
    assert(e.getMessage.contains("maxWaitSec"))
  }

  test("componentSizeHistogram: sizes, cluster counts, and doc mass per size") {
    // components: {0,1,2} (chain), {3,4}, {5}, {6}, {7} → one 3-cluster,
    // one 2-cluster, three singletons
    val nodes = (0L to 7L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("a", "b")
    val comps = Cluster.connectedComponents(nodes, "id", edges, "a", "b")
    val got = Cluster.componentSizeHistogram(comps, "component")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((3L, 1L, 3L), (2L, 1L, 2L), (1L, 3L, 3L)))
    // invariant: total doc mass equals the node count
    assert(got.toSeq.map(_._3).sum == 8L)
  }
}
