package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark pipeline built on the graft library plus an
  * equivalent DuckDB SQL oracle (None → driver does a rows-only check).
  *
  * Contract (driver): output column names must match the oracle's exactly —
  * the compare sorts columns by name before hashing. Every query orders its
  * result deterministically so row-order-sensitive compares also pass.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {
  /** Full registry; SparkEntry derives its maps from this. */
  def all: Seq[Q] =
    AggQueries.all ++ FilterQueries.all ++ ScalarQueries.all ++
    WindowQueries.all ++ SortQueries.all ++ JoinQueries.all ++ SetQueries.all ++
    ReshapeQueries.all ++ PipelineQueries.all ++ MultimodalQueries.all ++
    StreamQueries.all ++ MiscQueries.all ++ HiveQueries.all ++ SinkQueries.all ++
    ExtraQueries.all ++ GqlQueries.all
}
