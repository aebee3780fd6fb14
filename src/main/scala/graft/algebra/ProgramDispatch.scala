package graft.algebra

import org.apache.spark.sql.functions._
import graft.KnowledgeGraph
import graft.algebra.GraphAlgebra._

/** P8 statement dispatch (reference program_dispatch.py:46-77,185-394):
  * each GraphProgram statement's operation is either a validated query
  * (the CypherOp analog — here a DataFrame producer over the KG, with the
  * current working-set ids bound like `$W_IDS`) or one of the internal API
  * operations {search concepts, concept details, related, batch}. Every
  * ApiOp re-enters the same engine operators the public facade exposes
  * (V1/T1/J3), so program execution and direct API calls cannot diverge.
  */
object ProgramDispatch {

  sealed trait ApiOp
  final case class SearchConcepts(queryVec: Seq[Double], limit: Int = 10,
      minSimilarity: Double = 0.0) extends ApiOp
  final case class Related(conceptId: String, maxDepth: Int = 2) extends ApiOp
  final case class ConceptDetails(conceptIds: Seq[String]) extends ApiOp
  /** Expand the current working set by one hop (`$W_IDS` seed-then-expand). */
  final case class ExpandWorkingSet(maxDepth: Int = 1) extends ApiOp

  /** Compile an ApiOp into a GraphAlgebra statement against a KG. The
    * result graph carries the nodes plus the semantic links among them
    * (the dangling invariant drops the rest). */
  def statement(kg: KnowledgeGraph, op: Op, api: ApiOp): Statement =
    Statement(op, w => {
      val nodeIds = api match {
        case SearchConcepts(v, limit, minSim) =>
          kg.search(v, limit, minSim).select(col("concept_id").as("node_id"))
        case Related(id, depth) =>
          kg.related(id, depth).select(col("concept_id").as("node_id"))
            .unionAll(kg.spark.createDataFrame(Seq(Tuple1(id)))
              .toDF("node_id"))
        case ConceptDetails(ids) =>
          kg.concepts.where(col("concept_id").isin(ids: _*))
            .select(col("concept_id").as("node_id"))
        case ExpandWorkingSet(depth) =>
          // bind current W ids as BFS seeds — the $W_IDS contract. The seed
          // set stays a DataFrame end to end (bfsFrom): a working set of
          // millions of nodes expands on-cluster, never collected to the
          // driver (the reference materializes $W_IDS as a Python list,
          // program_dispatch.py:185-394 — a driver OOM at scale).
          graft.graph.GraphOps.bfsFrom(kg.semanticEdges,
              w.nodes.select(col("node_id")), depth)
            .select(col("node").as("node_id"))
      }
      val links = kg.semanticEdges
        .join(nodeIds.withColumnRenamed("node_id", "src"), Seq("src"), "left_semi")
        .join(nodeIds.withColumnRenamed("node_id", "dst"), Seq("dst"), "left_semi")
        .select(col("src").as("from_id"), col("rel_type"), col("dst").as("to_id"))
      WorkingGraph(nodeIds.distinct(), links)
    })
}
