package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the missing last step of a
  * dedup pipeline: near-dup PAIRS (L2/L3/ld) are not yet duplicate
  * GROUPS. A document similar to B and B similar to C must collapse into
  * one cluster even when A–C itself is below threshold; that closure is
  * a connected-components problem on the similarity graph.
  *
  * Algorithm: hash-min label propagation. Every vertex starts with its
  * own id as label; each round every vertex takes the min of its label
  * and its neighbours' labels; fixpoint = component = min vertex id.
  *
  * Scale posture (the 100 TB question):
  *  - one round = one shuffle-join of the edge list with the label table
  *    on vertex id + one hash aggregate (min) — both partial/final,
  *    skew handled by AQE. Nothing driver-side except the convergence
  *    counter (a scalar count per round).
  *  - rounds = graph diameter. Near-dup clusters are near-cliques
  *    (diameter 2–3), so the loop runs 3–4 rounds regardless of data
  *    size. For adversarially long chains, the same join+agg primitives
  *    compose into large-star/small-star (Kiveris et al., MapReduce CC)
  *    with O(log²  n) rounds; hash-min is the right default for dedup.
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
      val next = labels
        .join(prop, labels("id") === prop("pid"), "left")
        .select(
          labels("id").as("id"),
          least(labels("lbl"), coalesce(col("plbl"), labels("lbl"))).as("lbl"))
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
          "(diameter too large for hash-min: use large-star/small-star)")
    labels
  }
}
