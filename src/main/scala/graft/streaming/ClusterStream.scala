package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.Clustering

/** Streaming cluster routing: assign an unbounded stream of embedding
  * rows to a batch-trained k-means model — the serving face of
  * [[Clustering.kmeansAssign]], and the clustering entry in the
  * stream-twin family.
  *
  * The model is trained OFFLINE (batch `kmeansCentroids`) and baked
  * into the assignment expression as literals, so the streaming side is
  * STATELESS: one narrow projection per micro-batch, no state store, no
  * shuffle, and the stream plans under any output mode. Retraining is a
  * redeploy (swap the centroid literals), which is exactly how a
  * production router treats a quantizer — the same frozen-model
  * contract [[graft.operators.VectorIndex]] documents for trained
  * cells. Streamed assignments equal the batch operator's on the same
  * rows by construction (one shared expression; spec-pinned). */
object ClusterStream {

  /** `(idCol, cluster)` for each streamed row, against the given
    * trained centroids (ascending cluster id — the seq
    * [[Clustering.kmeansCentroids]] returns). */
  def assignStream(rows: DataFrame, idCol: String, vecCol: String,
                   centroids: Seq[Array[Double]],
                   distDecimals: Int = 9): DataFrame =
    Clustering.assignTo(rows, idCol, vecCol, centroids, distDecimals)
}
