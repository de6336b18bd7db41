package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph primitives for the training-data pipeline tier.
  *
  * The one that matters at 100 TB is connected components over the
  * near-duplicate pair graph: pairwise dedup (MinHash/n-gram/SimHash)
  * emits EDGES, but the keep/drop decision needs CLUSTERS — a document
  * that pairs with two others transitively forms one group with one
  * canonical survivor (the reference literature's "dup cluster
  * resolution" step).
  */
object GraphOps {

  /** Minimum-label connected components over an undirected edge list
    * (columns `aCol`, `bCol`), returning one row per vertex:
    * (id, cluster) where cluster = the smallest vertex id reachable from
    * id. Isolated vertices never appear (they have no edges — callers
    * union them back as singleton clusters if needed).
    *
    * Shape: label propagation to fixpoint. Each round is ONE shuffle
    * (edges ⋈ labels on src, then a min-combine keyed on the vertex), and
    * partial aggregation runs map-side, so a round's network cost is
    * bounded by the label frontier, not the edge count. Rounds needed =
    * graph diameter; near-dup clusters are dense (quasi-cliques), so the
    * practical diameter is 2-4. For adversarially long path graphs the
    * large-star/small-star variant (Kiveris et al., "Connected Components
    * in MapReduce") converges in O(log n) rounds at 2 shuffles per round —
    * the `maxIter` guard below is where it would slot in; propagation is
    * the better constant for the dedup workload.
    *
    * Each round's labels are persisted and the previous round's are
    * unpersisted — the loop holds ONE labels frame and the edge list in
    * memory, both spillable (MEMORY_AND_DISK).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val und = edges.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(edges.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // push every vertex's current label to its neighbours, keep the min
      val pushed = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("lab"))
      val next = labels.union(pushed)
        .groupBy("id").agg(min("lab").as("lab"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // fixpoint test: did any label shrink this round? (labels only ever
      // decrease, so "no change" == converged). One count() per round —
      // the same driver action any iterative Spark job pays.
      val changed = next.join(labels.withColumnRenamed("lab", "prev"), "id")
        .where(col("lab") < col("prev"))
        .limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0L
      i += 1
    }
    und.unpersist()
    labels
  }
}
