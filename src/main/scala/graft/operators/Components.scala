package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the missing last step of a
  * dedup pipeline: near-dup PAIRS (L2/L3/ld) are not yet duplicate
  * GROUPS. A document similar to B and B similar to C must collapse into
  * one cluster even when A–C itself is below threshold; that closure is
  * a connected-components problem on the similarity graph.
  *
  * Algorithm: hash-min label propagation WITH pointer doubling. Every
  * vertex starts with its own id as label; each round every vertex takes
  * the min of (its label, its neighbours' labels, its label's label).
  * The last term is the shortcut step (pointer jumping): a chain that
  * plain hash-min walks one hop per round collapses in O(log diameter)
  * rounds, because the distance a label has travelled doubles each
  * round. Fixpoint = component = min vertex id. The shortcut preserves
  * the invariant that a vertex's label is always the id of a vertex in
  * the same component (neighbour labels are in-component; so is the
  * label of an in-component vertex), and labels only decrease, so the
  * fixpoint is exactly hash-min's.
  *
  * Scale posture (the 100 TB question):
  *  - one round = one shuffle-join of the edge list with the label table
  *    on vertex id + one hash aggregate (min), plus one self-join of the
  *    label table for the shortcut — all partial/final, skew handled by
  *    AQE. Nothing driver-side except the convergence counter (a scalar
  *    count per round).
  *  - rounds: near-dup clusters are near-cliques (diameter 2–3), so the
  *    loop runs 3–4 rounds regardless of data size; adversarial chains
  *    take O(log diameter) thanks to the shortcut (maxIter 25 covers
  *    diameter ~2^25), matching the round bound of large-star/small-star
  *    (Kiveris et al., "Connected Components in MapReduce and Beyond")
  *    with one fewer distinct primitive.
  *  - `localCheckpoint` truncates lineage every round so the plan does
  *    not grow with iterations (on a cluster: `checkpoint` to DFS).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract row
  * SURVEY.md §2.10 (dedup family) — grouping is the closure step.
  */
object Components {

  /** @param vertices one-column DataFrame of vertex ids (integral).
    * @param edges    two-column DataFrame (src, dst), undirected.
    * @return (id, component) — component = min vertex id reachable.
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val idCol = vertices.columns.head
    val Array(sCol, dCol) = edges.columns.take(2)

    // symmetrize once and pin it: the edge list is reused every round.
    val sym = edges
      .select(col(sCol).cast("long").as("src"), col(dCol).cast("long").as("dst"))
      .union(edges.select(col(dCol).cast("long").as("src"), col(sCol).cast("long").as("dst")))
      .localCheckpoint(true)

    var labels = vertices
      .select(col(idCol).cast("long").as("id"))
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min neighbour label per vertex, then fold into the current label.
      val prop = sym
        .join(labels, sym("src") === labels("id"))
        .groupBy(sym("dst").as("pid"))
        .agg(min("lbl").as("plbl"))
      val stepped = labels
        .join(prop, labels("id") === prop("pid"), "left")
        .select(
          labels("id").as("id"),
          least(labels("lbl"), coalesce(col("plbl"), labels("lbl"))).as("lbl"))
      // pointer doubling: also adopt the label OF my label — collapses
      // long chains in O(log diameter) rounds instead of one hop/round.
      val short = stepped.select(col("id").as("lid"), col("lbl").as("llbl"))
      val next = stepped
        .join(short, stepped("lbl") === short("lid"), "left")
        .select(
          stepped("id").as("id"),
          least(stepped("lbl"), coalesce(col("llbl"), stepped("lbl"))).as("lbl"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), "id")
        .where(col("n.lbl") < col("o.lbl"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"(diameter > ~2^$maxIter even with pointer doubling)")
    labels
  }
}
