package graft.graph

import graft.core.Materialize.StableOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * primitive behind near-duplicate grouping: the verified dup-pair
  * graph's components ARE the dup clusters, and each doc's canonical
  * id is its component minimum.
  *
  * Algorithm: min-label propagation to a fixpoint. Every node starts
  * labeled with itself; each round every node takes the minimum label
  * in its closed neighborhood; stop when no label changes. Rounds =
  * graph diameter.
  *
  * Why this variant and not alternating large-star/small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14), which converges in O(log^2 n) rounds on adversarial
  * graphs? Because dup-cluster graphs are not adversarial: a cluster
  * is a handful of mutually-similar docs whose pair graph is dense and
  * whose diameter is tiny (2-4), so label propagation finishes in 2-4
  * cheap rounds where star operations would pay groupBy-per-round
  * regardless. The label table this iterates over holds only nodes
  * that appear in an edge — for dedup that is the duplicate docs, a
  * vanishing fraction of the corpus, never the corpus itself.
  *
  * Each round is one join + one aggregation on the (node, label)
  * table; lineage is truncated every round with a lazy
  * localCheckpoint so the plan does not deepen with the iteration
  * count (the classic iterative-algorithm trap on Spark).
  */
object ConnectedComponents {

  /** Components of the undirected graph given by (`srcCol`, `dstCol`)
    * pairs. Returns one row per distinct node: (node, component) with
    * component = min node id reachable from it. Deterministic.
    *
    * `maxIter` bounds the fixpoint loop (diameter rounds needed); if
    * the bound is hit before convergence an IllegalStateException is
    * thrown rather than returning silently-partial components.
    *
    * Adaptive execution: the adjacency is materialized (checkpointed)
    * either way; if it holds at most `maxLocalEdges` rows the
    * components come from a driver-side union-find on one collect —
    * two cheap jobs instead of diameter × (join + agg + sum) rounds.
    * Past the threshold the distributed fixpoint runs unchanged. The
    * same broadcast-threshold logic as a join: bounded driver memory,
    * identical result. Transient driver footprint at the default bound
    * is ~60-100 MB, not the raw 16 bytes/edge: collect() materializes
    * boxed (Long, Long) tuples (~50-80 bytes each with object headers)
    * plus the union-find LongMap — comfortably inside a driver sized
    * for broadcast joins, but size `maxLocalEdges` with the boxed
    * figure, not the primitive one. */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          maxIter: Int = 20, maxLocalEdges: Long = 1L << 20): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
    // closed-neighborhood edges both ways plus (u,u)/(v,v) self-edges,
    // emitted in ONE scan of `sym` (a union of selects would execute
    // the upstream edge pipeline — for dedup, the whole
    // signature+verify flow — once per branch before the checkpoint)
    val adj = sym
      .select(explode(array(
        struct(col("u").as("u"), col("v").as("v")),
        struct(col("v").as("u"), col("u").as("v")),
        struct(col("u").as("u"), col("u").as("v")),
        struct(col("v").as("u"), col("v").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()
      .stable() // eager: runs the upstream (possibly
    // corpus-scale) edge pipeline NOW, at the session's configured
    // parallelism, before the loop below drops shuffle partitions

    // counting the checkpoint is one cheap scan (no recompute); small
    // graphs skip the iterative path entirely
    if (adj.count() <= maxLocalEdges) return localUnionFind(adj)

    // the fixpoint loop iterates over the component graph only, which
    // is orders of magnitude smaller than whatever produced the edges;
    // each round is a fixed-overhead Spark job, so run the loop at low
    // parallelism — 32-task rounds over kilobytes are pure scheduling
    // cost. On a real cluster this knob scales with the expected dup
    // graph size, independent of corpus size.
    val spark = edges.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, loopPartitions.toString)
    try {
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      // round 1 for free: with identity labels, min-label over the
      // closed neighborhood is just the min neighbor id
      var labels = adj.groupBy(col("u").as("node"))
        .agg(min(col("v")).as("label"))
        .localCheckpoint(false)
      // labels are monotonically non-increasing per node ((u,u) is in
      // adj, so a node's own label participates in its min), so the
      // label sum is strictly decreasing until the fixpoint — an
      // equal sum IS convergence, without a per-round change-join
      var prevSum = labelSum(labels)
      var converged = false
      var iter = 1
      while (!converged && iter < maxIter) {
        val next = adj
          .join(labels.withColumnRenamed("node", "v"), Seq("v"))
          .groupBy(col("u").as("node"))
          .agg(min(col("label")).as("label"))
          .localCheckpoint(false)
        val s = labelSum(next)
        labels = next
        converged = (s == null && prevSum == null) ||
          (s != null && prevSum != null && s.compareTo(prevSum) == 0)
        prevSum = s
        iter += 1
      }
      if (!converged) throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "raise maxIter (graph diameter exceeds the bound)")
      labels.select(col("node"), col("label").as("component"))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Shuffle partitions for the label-propagation rounds. */
  private val loopPartitions = 4

  /** Driver-side union-find over a collected (u, v) edge list —
    * min-root convention so the result is bit-identical to the
    * distributed fixpoint. The input is the closed-neighborhood
    * adjacency (self-edges present), so every node appears as a `u`. */
  private def localUnionFind(adj: DataFrame): DataFrame = {
    val spark = adj.sparkSession
    import spark.implicits._
    val pairs = adj.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { // attach larger root under smaller: root = component min
        if (ru < rv) parent(rv) = ru else parent(ru) = rv
      } else parent.getOrElseUpdate(ru, ru)
    }
    val nodes = pairs.iterator.map(_._1).toArray.distinct
    nodes.toSeq.map(n => (n, find(n))).toDF("node", "component")
  }
}
