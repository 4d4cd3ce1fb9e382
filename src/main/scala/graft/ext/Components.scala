package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over a duplicate-pair edge list —
  * the step that turns LSH/Jaccard candidate PAIRS into duplicate GROUPS
  * so a dedup pass can keep exactly one representative per group.
  * (Pairs alone under-delete: {A~B, B~C} must collapse to one survivor,
  * not two independent pair-wise keeps.)
  *
  * Algorithm: the alternating large-star / small-star method of Kiveris
  * et al., "Connected Components in MapReduce and Beyond" (SoCC 2014).
  * Each round is two groupBy shuffles over the CURRENT edge set (which
  * only shrinks toward star graphs); convergence is O(log^2 n) rounds in
  * the worst case and 2-4 rounds on real dup graphs (small diameters).
  * No driver-side graph state — the driver sees only per-round change
  * counts. Lineage is truncated every round via localCheckpoint so the
  * iteration count never shows up in plan depth.
  *
  * Reference analogue: the reference has no grouping step at all (its
  * dedup surface stops at pair emission) — this is part of the
  * beyond-parity LLM-pipeline surface, mirroring what
  * text-dedup pipelines (Lee et al. 2022 §4.2) do after MinHash.
  *
  * 100 TB posture: edges after LSH banding are O(duplicate pairs), a tiny
  * fraction of corpus size; every round is edge-count-bounded, fully
  * shuffle-parallel, and the final (id, component) map joins back to the
  * corpus on the id key. Nothing is ever collected. Known bound: the
  * star rounds materialize one neighbor array per node, so a single
  * component's representative holds that component's node list in one
  * task — fine for duplicate groups (they are small by construction),
  * degenerate only if the corpus is mostly one repeated document.
  */
object Components {

  /** Map every node appearing in `edges` to its component representative
    * (the component's MINIMUM id, so output is deterministic). Output
    * columns: (id, component). Nodes not present in any edge are absent —
    * callers coalesce(component, id) after a left join.
    *
    * Ids may be any orderable type (long, string); comparisons use Spark's
    * native column ordering on both sides of the oracle.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    var e = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u") =!= col("v"))
      // orient big -> small so both stars see one canonical direction
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      converged = sameEdgeSet(e, next)
      e = next
      iter += 1
    }
    // converged edge set is a star forest big->min: every non-min node has
    // exactly the edge (node, componentMin); add the roots themselves
    e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")).distinct())
      .distinct()
  }

  /** Large-star round: for each node u over the SYMMETRIZED neighborhood,
    * connect every strictly-larger neighbor to m = min(N(u) ∪ {u}).
    * Output re-oriented big -> small.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    sym.groupBy("u").agg(collect_set(col("v")).as("nbrs"))
      .select(col("u"), least(col("u"), array_min(col("nbrs"))).as("m"), col("nbrs"))
      .select(explode(col("nbrs")).as("w"), col("u"), col("m"))
      .where(col("w") > col("u"))
      .select(col("w").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star round: edges arrive oriented big -> small; for each u,
    * connect u and all its smaller neighbors to their minimum.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    e.groupBy("u").agg(collect_set(col("v")).as("nbrs"))
      .select(col("u"), array_min(col("nbrs")).as("m"), col("nbrs"))
      .select(col("m"), explode(array_union(col("nbrs"), array(col("u")))).as("w"))
      .where(col("w") =!= col("m"))
      .select(col("w").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Exact set equality of two edge frames (counts first — the cheap
    * reject — then a one-row-bounded symmetric difference probe).
    */
  private def sameEdgeSet(a: DataFrame, b: DataFrame): Boolean = {
    if (a.count() != b.count()) return false
    b.exceptAll(a).limit(1).count() == 0
  }

  /** Dedup by duplicate groups: keep, per connected component of `edges`,
    * only the row whose id IS the component minimum (plus every row that
    * appears in no pair). The composed shape of a full near-dedup
    * pipeline: pairs -> components -> one survivor each.
    */
  def dedupSurvivors(df: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val comp = connectedComponents(edges, srcCol, dstCol)
    // the component map is O(duplicate nodes) — a small fraction of the
    // corpus; AQE broadcasts it when it measures small, so don't force
    df.join(comp, df(idCol) === comp("id"), "left")
      .where(col("component").isNull || col("component") === df(idCol))
      .select(df.columns.map(df(_)): _*)
  }
}
