package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph algorithms over edge DataFrames — the Spark-first
  * re-expression of the reference's in-memory Python graph stage
  * (`concepts/src/concept_csv_export.py:407-530`): BFS descendant
  * closure (G1), cycle detection (G2), topological reordering (O4).
  *
  * Design (SURVEY §2.6): edges live in a `DataFrame(src, dst)`; all
  * three algorithms are driver-orchestrated iterative DataFrame jobs.
  * Each iteration `localCheckpoint()`s to cut lineage (SURVEY §7.4.4)
  * — without it the plan doubles per iteration and Catalyst analysis
  * time explodes. No GraphX/GraphFrames dependency. At cluster scale
  * the per-iteration shuffle is hash-partitioned on the join key, and
  * iteration count is bounded by graph diameter, not node count.
  */
object GraphOps {

  private def checkpointed(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true)

  /** Deterministically release a SUPERSEDED fixpoint iteration's
    * checkpoint blocks (via [[org.apache.spark.sql.GraftPlanBridge
    * .freeLocalCheckpoint]]). Without this, dead iterations pin
    * BlockManager storage until a full GC fires the ContextCleaner's
    * weak references — measured round 10: one 4 s pagerank left
    * enough pinned debt to tax the next five bench queries 2–8 s
    * each until the next scheduled `System.gc()`. Only ever called on
    * frames that are provably dead: the successor was EAGERLY
    * checkpointed (lineage cut, blocks materialized) before the free,
    * so nothing can recompute through the freed frame. At cluster
    * scale this is the difference between a k-iteration fixpoint
    * holding 1 frame of executor storage and holding k. */
  private def free(df: DataFrame): Unit =
    org.apache.spark.sql.GraftPlanBridge.freeLocalCheckpoint(df)

  /** Longest-path depth layering ("topological rank").
    *
    * Given edges `(src, dst)` meaning "src references dst" (dst must
    * come first — reference semantics `concept_csv_export.py:499-530`),
    * returns `(node, depth)` where depth(leaf/referent-free) = 0 and
    * depth(n) = 1 + max(depth(referenced nodes)). Sorting by depth
    * yields an order where every referenced node precedes its referrer.
    *
    * Precondition: acyclic (guard with [[findCycleNodes]]); maxIter
    * bounds runaway iteration on unexpected cycles.
    */
  def topoDepth(edges: DataFrame, maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.toDF("src", "dst").cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var depth = checkpointed(nodes.withColumn("depth", lit(0)))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate depth for each src = 1 + max depth of its dsts. The
      // change flag rides in the checkpointed frame so convergence is a
      // trivial filter-count on materialized rows — not a second
      // old-vs-new join job per iteration.
      val cand = e.join(depth, e("dst") === depth("node"))
        .groupBy(col("src").as("node2"))
        .agg((max(col("depth")) + 1).as("cand"))
      val next = checkpointed(
        depth.join(cand, depth("node") === cand("node2"), "left")
          .select(col("node"),
            greatest(col("depth"), coalesce(col("cand"), lit(0))).as("depth"),
            (coalesce(col("cand"), lit(0)) > col("depth")).as("__chg")))
      changed = next.filter(col("__chg")).count()
      free(depth)
      depth = next.drop("__chg")
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"topoDepth did not converge in $maxIter iterations — graph is cyclic?")
    e.unpersist()
    depth
  }

  /** BFS reachability closure (G1, `concept_csv_export.py:407-438`):
    * all nodes reachable from `roots` following `src -> dst` edges,
    * roots included. Frontier-join loop with visited-set anti-join;
    * iterations = eccentricity of the root set.
    */
  def bfsClosure(edges: DataFrame, roots: DataFrame): DataFrame = {
    val e = edges.toDF("src", "dst").cache()
    var visited = checkpointed(roots.toDF("node").distinct())
    var frontier = visited
    var frontierCount = frontier.count()
    while (frontierCount > 0) {
      val next = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
      val prevFrontier = frontier
      frontier = checkpointed(next.join(visited, Seq("node"), "left_anti"))
      // initial state aliases frontier = visited; never free the alias
      if (prevFrontier ne visited) free(prevFrontier)
      frontierCount = frontier.count()
      if (frontierCount > 0) {
        val prevVisited = visited
        visited = checkpointed(visited.union(frontier).distinct())
        free(prevVisited)
      }
    }
    if (frontier ne visited) free(frontier)
    e.unpersist()
    visited
  }

  /** Cycle reachability set (G2 core, `concept_csv_export.py:457-496`):
    * iteratively peel nodes whose every outgoing edge points outside
    * the remaining set; what remains is the set of nodes that can
    * reach a cycle (a superset of cycle members; every remaining node
    * has an out-edge within the set). Empty result ⇔ acyclic.
    */
  def findCycleNodes(edges: DataFrame): DataFrame = {
    val e = edges.toDF("src", "dst").cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var remaining = checkpointed(nodes)
    var remainingCount = remaining.count()
    var removed = 1L
    while (removed > 0) {
      // keep nodes that still have an edge into the remaining set
      val hasLiveOut = e.join(remaining.withColumnRenamed("node", "dst2"),
          e("dst") === col("dst2"))
        .select(col("src").as("node")).distinct()
      val next = checkpointed(remaining.join(hasLiveOut, Seq("node"), "left_semi"))
      val nextCount = next.count()
      removed = remainingCount - nextCount
      remainingCount = nextCount
      free(remaining)
      remaining = next
    }
    e.unpersist()
    remaining
  }

  /** Cycle guard with a human-readable witness (V2): raises
    * `CycleException` whose message contains an `a --> b --> a` path,
    * mirroring the reference's error contract
    * (`concept_csv_export.py:490-496`). The witness reconstruction
    * collects only the cyclic subgraph (already peeled down — small by
    * construction), never the full graph.
    */
  def detectCycles(edges: DataFrame, witnessLimit: Int = 100000): Unit = {
    val cyc = findCycleNodes(edges)
    val n = cyc.count()
    if (n == 0) return
    if (n > witnessLimit)
      throw new CycleException(s"graph contains cycles over $n nodes (witness suppressed)")
    // restrict edges to the cyclic subgraph via joins (never an IN-list
    // expression over a collected set), THEN collect the small remainder
    val sub = edges.toDF("src", "dst")
      .join(cyc.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(cyc.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .select("src", "dst") // using-column joins reorder: key column first
      .collect().map(r => r.get(0) -> r.get(1))
    val adj = sub.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    // walk from the smallest node until a repeat — deterministic witness;
    // O(1) membership via a set alongside the ordered path
    val startKey = sub.map(_._1).minBy(_.toString)
    val path = scala.collection.mutable.ArrayBuffer[Any](startKey)
    val seen = scala.collection.mutable.HashSet[Any](startKey)
    var cur = startKey
    var done = false
    while (!done) {
      val nxt = adj(cur).minBy(_.toString)
      if (seen(nxt)) {
        path += nxt
        done = true
      } else { path += nxt; seen += nxt; cur = nxt }
    }
    val cycleStart = path.indexOf(path.last)
    val witness = path.drop(cycleStart).mkString(" --> ")
    throw new CycleException(s"Cycle detected: $witness")
  }

  /** Connected components over an UNDIRECTED edge set (the edges are
    * symmetrized internally): returns `(node, comp)` where comp is the
    * minimum node id reachable from `node`. Min-label propagation —
    * each iteration takes the min of a node's label and its neighbors'
    * labels — converges in O(component diameter) iterations with a
    * checkpoint per step. The dedup use case: near-dup PAIRS →
    * duplicate GROUPS with a canonical representative (keep min,
    * drop the rest). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val e0 = edges.toDF("a", "b")
    val e = e0.union(e0.select(col("b"), col("a"))).distinct().cache()
    val nodes = e.select(col("a").as("node")).distinct()
    var labels = checkpointed(nodes.withColumn("comp", col("node")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // change flag computed in-flight (see topoDepth): one job per
      // iteration, convergence read off the checkpoint
      val neighborMin = e.join(labels, e("b") === labels("node"))
        .groupBy(col("a").as("node2"))
        .agg(min(col("comp")).as("nmin"))
      val next = checkpointed(
        labels.join(neighborMin, labels("node") === col("node2"), "left")
          .select(col("node"),
            least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
            (coalesce(col("nmin"), col("comp")) < col("comp")).as("__chg")))
      changed = next.filter(col("__chg")).count()
      free(labels)
      labels = next.drop("__chg")
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations")
    e.unpersist()
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — the 100 TB-scale alternative to
    * [[connectedComponents]]'s min-label propagation. Min-propagation
    * needs O(diameter) rounds, which on path-shaped similarity chains
    * (dedup graphs routinely contain them) means thousands of shuffles;
    * star contraction converges in O(log² n) rounds REGARDLESS of
    * diameter, each round two groupBy-shuffles on node id:
    *
    *   - large-star(u): every neighbor v > u re-attaches to
    *     m = min(N(u) ∪ u) — long tails fold onto their local minimum;
    *   - small-star(u): edges oriented child>parent, every parent
    *     (plus u) re-attaches to the minimum parent — stars flatten.
    *
    * Fixpoint when the edge set stops changing (signature = count +
    * order-free checksum of canonical edges, one tiny agg per round —
    * the in-flight-convergence-flag discipline of the other fixpoints
    * here). Returns `(node, comp)` with comp = the component's minimum
    * node id, same contract as [[connectedComponents]] — nodes that
    * appear in `edges` only; callers union isolated nodes themselves.
    * Self-loops are dropped; the input need not be symmetrized. */
  def connectedComponentsStar(edges: DataFrame, maxRounds: Int = 40): DataFrame = {
    val e0 = edges.toDF("u", "v").filter(col("u") =!= col("v"))
    // canonical undirected form (min, max): one row per edge
    var e = checkpointed(
      e0.select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .distinct())
    def signature(df: DataFrame): (Long, Long) = {
      // order-free, overflow-free checksum: XOR of per-edge hashes
      // (edges are distinct, so no cancellation pairs exist)
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(e)
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      // large-star: group the SYMMETRIZED adjacency by u; neighbors
      // larger than u re-attach to min(N(u) ∪ u)
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val large = sym.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"),
          collect_list(when(col("v") > col("u"), col("v"))).as("bigs"))
        .select(explode(col("bigs")).as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .distinct()
      val afterLarge = checkpointed(large)
      free(e)
      // small-star: orient child = max endpoint; child and all its
      // parents re-attach to the minimum parent
      val small = afterLarge
        .select(col("v").as("child"), col("u").as("parent"))
        .groupBy("child")
        .agg(min(col("parent")).as("m"),
          collect_list(col("parent")).as("parents"))
        .select(col("m"),
          explode(array_union(col("parents"), array(col("child")))).as("n"))
        .filter(col("n") =!= col("m"))
        .select(col("m").as("u"), col("n").as("v"))
        .distinct()
      val next = checkpointed(small)
      free(afterLarge)
      val nextSig = signature(next)
      stable = nextSig == sig
      sig = nextSig
      e = next
      round += 1
    }
    if (!stable)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxRounds rounds")
    // at the fixpoint the edge set is a star forest: (root, child)
    e.select(col("v").as("node"), col("u").as("comp"))
      .union(e.select(col("u").as("node"), col("u").as("comp")))
      .distinct()
  }

  /** Fixed-iteration PageRank over a DIRECTED edge set — the classic
    * link-quality signal of web-corpus curation (host/URL ranking as a
    * keep/drop feature). `pr' = (1-d)/N + d·Σ_in pr/outdeg`, iterated a
    * fixed `iters` times from the uniform vector; ranks are ROUNDED to
    * 6 decimals after every iteration (the q53-centroid trick:
    * the per-node contribution sum is the one unordered float
    * reduction, and rounding re-pins it each step, which is what lets a
    * fixed-iteration run unroll into an exact SQL oracle). Dangling
    * mass is NOT redistributed by default — feed a graph where every
    * node has an out-edge (symmetrize if needed), or pass
    * `redistributeDangling = true` for the standard correction: the
    * rank held by out-edge-free nodes is returned to every node
    * uniformly each step (`+ d·m_dangling/N`), keeping total mass at 1.
    *
    * Scale shape: out-degree is static, so it is folded into the edge
    * set ONCE up front (each edge row carries its source's degree —
    * r4 re-derived it from the edge cache every iteration, an extra
    * groupBy+join per step). Each iteration is then one
    * (edges ⋈ ranks) hash join + a map-side-combined per-dst sum + a
    * left join back to the node set, checkpointed per step like every
    * fixpoint here. The dangling correction, when on, adds a 1-row
    * aggregate broadcast back per step. N is the one driver-side
    * scalar (a count — what any PageRank reduce collects).
    */
  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85,
      redistributeDangling: Boolean = false,
      assumeDistinct: Boolean = false): DataFrame = {
    // `assumeDistinct` skips the edge dedup shuffle — pass it when the
    // edge set is distinct by construction (e.g. a symmetrized union of
    // a distinct pair set); duplicate edges would double-count
    // contributions, so only assert what the construction guarantees
    val e0 = edges.toDF("src", "dst")
    val e = (if (assumeDistinct) e0 else e0.distinct()).cache()
    val nodes = checkpointed(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    // static per-edge degree: (src, dst, __od) materialized once,
    // HASH-PARTITIONED ON src — the iteration join's key — so each
    // round shuffles only the node-sized rank frame to meet it, never
    // the edge set (localCheckpoint preserves the partitioning).
    // NB: the per-iteration sum stays `pr / __od` (integer divisor) —
    // NOT a precomputed 1/od weight — so every division is the exact
    // operation the SQL oracle performs (a premultiplied reciprocal
    // differs by ulps, which 6-dp re-pinning need not absorb at a
    // rounding boundary).
    val ew = checkpointed(
      e.join(e.groupBy("src").agg(count(lit(1)).as("__od")), "src")
        .repartition(col("src")))
    val srcNodes =
      if (redistributeDangling)
        checkpointed(e.select(col("src").as("node")).distinct())
      else null
    e.unpersist()
    val n = nodes.count()
    val round6 = (c: Column) =>
      graft.functions.MysqlFunctions.oracleRound(c, 6)
    var pr = checkpointed(nodes.withColumn("pr", round6(lit(1.0) / n)))
    for (_ <- 0 until iters) {
      val contrib = ew.join(pr, ew("src") === pr("node"))
        .groupBy(col("dst").as("__node"))
        .agg(sum(col("pr") / col("__od")).as("__m"))
      val joined = nodes.join(contrib, nodes("node") === col("__node"), "left")
      val next =
        if (redistributeDangling) {
          // mass parked on out-edge-free nodes this step: one anti-join
          // + 1-row aggregate, broadcast onto every node row
          val dangling = pr.join(srcNodes, Seq("node"), "left_anti")
            .agg(coalesce(sum("pr"), lit(0.0)).as("__dm"))
          joined.crossJoin(broadcast(dangling))
            .select(col("node"),
              round6(lit((1.0 - damping) / n) + lit(damping) *
                (coalesce(col("__m"), lit(0.0)) + col("__dm") / n)).as("pr"))
        } else
          joined.select(col("node"),
            round6(lit((1.0 - damping) / n) +
              lit(damping) * coalesce(col("__m"), lit(0.0))).as("pr"))
      val prev = pr
      pr = checkpointed(next)
      free(prev)
    }
    // pr's lineage is cut by its own checkpoint, so the edge-sized
    // degree frame (the big block set of this whole query) and the
    // node frames are dead the moment the loop exits — release them
    // here instead of pinning edge-scale storage until the next GC
    free(nodes); free(ew)
    if (srcNodes != null) free(srcNodes)
    pr
  }

  /** PERSONALIZED PageRank (random walk with restart): like
    * [[pageRank]] but all restart mass returns to a SEED set — the
    * relevance-to-these-nodes ranking of seed-expansion curation
    * (grow a trusted-domain set, find documents "near" a labeled
    * cluster). Per round: pr(v) ← round6(teleport(v) + d·Σ incoming),
    * with teleport(v) = `restart`/|seeds| on seeds and 0 elsewhere;
    * init = the teleport distribution itself (pr₀ = 1/|seeds| on
    * seeds). `restart` is taken as an explicit literal — NOT derived
    * as 1−damping — so the oracle can use the same decimal literal
    * (1−0.85 in binary doubles is not the double 0.15; the 6-dp
    * re-pin would usually absorb that, but not at a rounding
    * boundary). Same shuffle shape, checkpoint discipline, and
    * rounding contract as [[pageRank]]; unlike it, mass NOT reachable
    * from the seeds stays exactly 0. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int, damping: Double = 0.85, restart: Double = 0.15,
      assumeDistinct: Boolean = false): DataFrame = {
    val round6 = (c: Column) =>
      graft.functions.MysqlFunctions.oracleRound(c, 6)
    val e0 = edges.toDF("src", "dst")
    val e = (if (assumeDistinct) e0 else e0.distinct()).cache()
    val nodes = checkpointed(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val ew = checkpointed(
      e.join(e.groupBy("src").agg(count(lit(1)).as("__od")), "src")
        .repartition(col("src")))
    e.unpersist()
    val sd = seeds.toDF("node").distinct()
    val nS = sd.count()
    require(nS > 0, "personalizedPageRank needs a non-empty seed set")
    val seeded = checkpointed(
      nodes.join(sd.withColumn("__s", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("__s"), lit(false)).as("__seed")))
    var pr = checkpointed(seeded
      .select(col("node"),
        round6(when(col("__seed"), lit(1.0) / nS).otherwise(lit(0.0)))
          .as("pr")))
    for (_ <- 0 until iters) {
      val contrib = ew.join(pr, ew("src") === pr("node"))
        .groupBy(col("dst").as("__node"))
        .agg(sum(col("pr") / col("__od")).as("__m"))
      val prev = pr
      pr = checkpointed(
        seeded.join(contrib, seeded("node") === col("__node"), "left")
          .select(seeded("node"),
            round6(when(col("__seed"), lit(restart) / nS)
              .otherwise(lit(0.0)) +
              lit(damping) * coalesce(col("__m"), lit(0.0))).as("pr")))
      free(prev)
    }
    free(nodes); free(ew); free(seeded)
    pr
  }

  /** Synchronous label propagation (fixed iterations) — the cheap
    * community-detection signal of graph-based corpus curation
    * (mirror/spam clusters, host communities; Raghavan et al. 2007,
    * public arXiv 0709.2938). Every node starts labeled with itself;
    * each round it adopts the most frequent label among its
    * OUT-neighbors, ties broken by smallest label — all-integer
    * arithmetic, so unlike PageRank the unrolled SQL oracle needs no
    * rounding re-pin at all. Synchronous update with a fixed `iters`
    * (the deterministic variant — asynchronous/random-order LPA is not
    * reproducible); a node with no out-edges keeps its label. Feed a
    * symmetrized edge set for undirected semantics.
    *
    * Scale shape per iteration: one (edges ⋈ labels) hash join, a
    * map-side-combined (node, label) count, one per-node top-1 window,
    * and a node-sized left join back — checkpointed per step like
    * every fixpoint here. */
  def labelPropagation(edges: DataFrame, iters: Int,
      assumeDistinct: Boolean = false): DataFrame = {
    val e0 = edges.toDF("src", "dst")
    val e = (if (assumeDistinct) e0 else e0.distinct()).cache()
    val nodes = checkpointed(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    var labels = checkpointed(nodes.withColumn("label", col("node")))
    for (_ <- 0 until iters) {
      val counts = e.join(labels, e("dst") === labels("node"))
        .groupBy(e("src").as("n"), col("label"))
        .agg(count(lit(1)).as("c"))
      val top = counts
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("n")
            .orderBy(col("c").desc, col("label"))))
        .filter(col("__rn") === 1)
        .select(col("n"), col("label").as("__new"))
      val prev = labels
      labels = checkpointed(
        labels.join(top, labels("node") === col("n"), "left")
          .select(col("node"),
            coalesce(col("__new"), col("label")).as("label")))
      free(prev)
    }
    e.unpersist()
    free(nodes)
    labels
  }

  /** Per-node triangle counts over an UNDIRECTED edge set — the local
    * clustering signal (dense co-occurrence neighborhoods vs link
    * farms) of web-graph curation. Uses the degree-ordered wedge
    * algorithm (the MapReduce-standard formulation, Suri & Vassilvitskii
    * WWW'11): orient every edge from its lower-(degree, id) endpoint to
    * the higher one, build wedges only at each node's oriented
    * out-neighbors — Σ_v C(outdeg⁺(v), 2), where outdeg⁺ is bounded by
    * O(√|E|) on any graph, vs the unordered Σ C(deg, 2) that explodes
    * on hubs — and close each wedge with one hash semi-join against the
    * canonical edge set. Every triangle is found exactly once (at its
    * lowest-ordered vertex), then credited to all three corners.
    * Returns (node, n_triangles), nodes with ≥ 1 triangle. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e0 = edges.toDF("a", "b").filter(col("a") =!= col("b"))
    // canonical undirected set (a < b), and full degrees off it
    val canon = checkpointed(
      e0.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b")).distinct())
    triangleTriples(canon)
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** All triangles of a CANONICAL (a < b, distinct) undirected edge
    * set, each exactly once, as `(u, v1, v2)` triples — the
    * degree-ordered wedge enumeration [[triangleCounts]] documents
    * (u is the triangle's lowest-(deg, id) corner; v1 < v2). */
  private def triangleTriples(canon: DataFrame): DataFrame = {
    val und = canon.union(canon.select(col("b"), col("a")))
    val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): u -> v iff (deg_u, u) < (deg_v, v)
    val orient = checkpointed(und
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), "b")
      .filter(col("__da") < col("__db") ||
        (col("__da") === col("__db") && col("a") < col("b")))
      .select(col("a").as("u"), col("b").as("v")))
    val wedges = orient.select(col("u"), col("v").as("v1"))
      .join(orient.select(col("u"), col("v").as("v2")), Seq("u"))
      .filter(col("v1") < col("v2"))
    // v1 < v2 already, so (v1, v2) IS the canonical form — plain
    // equi-join keys, no least/greatest re-derivation
    wedges.join(canon,
      col("v1") === col("a") && col("v2") === col("b"), "left_semi")
  }

  /** k-TRUSS peel (Cohen 2008): repeatedly drop edges supported by
    * fewer than k−2 triangles — the EDGE-grain densification beside
    * the node-grain [[kCorePeel]] (every k-truss edge is in a
    * (k−1)-core, but not vice versa; trusses isolate the
    * triangle-reinforced community scaffold web-graph curation keeps).
    * A fixed `iters` is the engine's fixpoint convention (q73/q93):
    * the result is "the graph after N peels" — deterministic and
    * all-integer, so the peel unrolls into chained oracle CTEs;
    * convergence is spec-checked. Returns the surviving canonical
    * edges with their POST-peel support (coalesced 0 — a reported
    * support below k−2 means exactly "one more peel would drop it").
    *
    * Scale shape per round: one degree-ordered triangle enumeration
    * (out-wedge fanout bounded by O(√|E|)) + an explode-to-3 edge
    * credit + one keyed count — all hash-partitioned on the edge key;
    * rounds are checkpointed and superseded frames freed. */
  def kTrussPeel(edges: DataFrame, k: Int, iters: Int): DataFrame = {
    val e0 = edges.toDF("a", "b").filter(col("a") =!= col("b"))
    var canon = checkpointed(
      e0.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b")).distinct())
    def support(c: DataFrame): DataFrame =
      triangleTriples(c)
        .select(explode(array(
          struct(col("u").as("x"), col("v1").as("y")),
          struct(col("u").as("x"), col("v2").as("y")),
          struct(col("v1").as("x"), col("v2").as("y")))).as("e"))
        .select(least(col("e.x"), col("e.y")).as("a"),
          greatest(col("e.x"), col("e.y")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("sup"))
    for (_ <- 0 until iters) {
      val prev = canon
      canon = checkpointed(
        canon.join(support(canon).filter(col("sup") >= k - 2),
          Seq("a", "b"), "left_semi"))
      free(prev)
    }
    canon.join(support(canon), Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("sup"), lit(0L)).as("support"))
  }

  /** Topological reorder (O4, `concept_csv_export.py:499-530`): order
    * rows so that every referenced node precedes its referrers, stable
    * by `tieBreak` within a depth layer. Returns the input plus an
    * `__ord` rank column; callers sort by it. Matches the reference's
    * contract (referrer strictly after all referents —
    * `test_concept_csv_export.py:33-51`).
    */
  def topoOrder(df: DataFrame, keyCol: String, edges: DataFrame): DataFrame = {
    val depth = topoDepth(edges).withColumnRenamed("node", "__node")
    df.join(depth, df(keyCol) === col("__node"), "left")
      .drop("__node")
      .withColumn("__ord", coalesce(col("depth"), lit(0)))
      .drop("depth")
  }

  /** k-core peel, `iters` rounds over a SYMMETRIZED edge set: each
    * round drops every node whose current degree is < k, then the
    * edges touching it (Seidman's k-core, Network s 5(3) 1983 — the
    * standard "dense part of the graph" extraction of web-graph and
    * co-occurrence curation). Returns the nodes still alive after
    * `iters` peels with their degree in the surviving subgraph. A
    * fixed `iters` is the engine's fixpoint convention (q73/q93): the
    * result is "the graph after N peels" — deterministic, all-integer,
    * so the whole peel unrolls into chained CTEs; peeling converges
    * once no round removes a node (fixpoint spec-checked).
    *
    * Scale shape per round: one map-side-combined degree count + two
    * semi joins (src-alive, dst-alive), checkpointed per step like
    * every fixpoint here. */
  def kCorePeel(edges: DataFrame, k: Int, iters: Int): DataFrame = {
    var e = checkpointed(edges.toDF("src", "dst"))
    for (_ <- 0 until iters) {
      val alive = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("__n"))
      val prev = e
      e = checkpointed(
        e.join(alive.withColumnRenamed("__n", "src"), Seq("src"), "left_semi")
          .join(alive.withColumnRenamed("__n", "dst"), Seq("dst"), "left_semi")
          .select("src", "dst"))
      free(prev)
    }
    e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999) over a DIRECTED
    * edge set, MAX-normalized: per round
    *   auth(j) = Σ_{i→j} hub(i);  auth ← round6(auth / max_j auth)
    *   hub(i)  = Σ_{i→j} auth(j); hub  ← round6(hub / max_i hub)
    * Max normalization (not the textbook L2) keeps the normalizer
    * reduction-ORDER-FREE — a float sum over all nodes would depend on
    * partition order, while the max of per-node sums is invariant up
    * to the per-node ulps the 6-dp re-pin absorbs (the q73 pagerank
    * rounding convention, so the whole fixpoint unrolls into the SQL
    * oracle's chained CTEs). Returns `(node, kind, score)` with kind ∈
    * {hub, auth}: hubs are the nodes with out-edges, authorities the
    * nodes with in-edges (every such node gets a score — sums over a
    * total bipartite-style edge frame produce no nulls).
    *
    * Scale shape: the edge set is checkpointed hash-partitioned once;
    * each round shuffles only the node-sized score frame to meet it
    * (max is a 1-row broadcast), and superseded rounds free their
    * checkpoint blocks ([[free]]) like every fixpoint here. */
  def hits(edges: DataFrame, iters: Int,
      assumeDistinct: Boolean = false): DataFrame = {
    // authorities only exist after a first hub→auth pass; iters == 0
    // would leave `auth` null and NPE in the final union, unlike the
    // other fixpoints here which degrade to their init frame
    require(iters >= 1, s"hits needs iters >= 1, got $iters")
    val round6 = (c: Column) =>
      graft.functions.MysqlFunctions.oracleRound(c, 6)
    val e0 = edges.toDF("src", "dst")
    val e = checkpointed(
      (if (assumeDistinct) e0 else e0.distinct()).repartition(col("src")))
    var hub = checkpointed(
      e.select(col("src").as("node")).distinct().withColumn("h", lit(1.0)))
    var auth: DataFrame = null
    for (_ <- 0 until iters) {
      val araw = e.join(hub, e("src") === hub("node"))
        .groupBy(col("dst").as("anode")).agg(sum(col("h")).as("m"))
      val amax = araw.agg(max(col("m")).as("mx"))
      val nextAuth = checkpointed(araw.crossJoin(broadcast(amax))
        .select(col("anode").as("node"),
          round6(col("m") / col("mx")).as("a")))
      if (auth != null) free(auth)
      auth = nextAuth
      val hraw = e.join(auth, e("dst") === auth("node"))
        .groupBy(col("src").as("hnode")).agg(sum(col("a")).as("m"))
      val hmax = hraw.agg(max(col("m")).as("mx"))
      val nextHub = checkpointed(hraw.crossJoin(broadcast(hmax))
        .select(col("hnode").as("node"),
          round6(col("m") / col("mx")).as("h")))
      free(hub)
      hub = nextHub
    }
    hub.select(col("node"), lit("hub").as("kind"), col("h").as("score"))
      .unionAll(auth.select(col("node"), lit("auth").as("kind"),
        col("a").as("score")))
  }
}

class CycleException(msg: String) extends RuntimeException(msg)
