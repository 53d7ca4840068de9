"""Scatter-gather ("spargel") iteration framework — SURVEY §2.11.

Reference: Graph.runScatterGatherIteration (Graph.java:1624) driving
ScatterFunction.sendMessages / GatherFunction.updateVertex
(flink-gelly .../spargel/ScatterGatherIteration.java:63 — scatter UDF
builds messages from each vertex's state along its edges, gather UDF
folds the messages received by a vertex into its new state, synchronized
per superstep). Gelly's in-tree algorithms (CommunityDetection,
LabelPropagation, the spargel ConnectedComponents/SSSP examples) are all
clients of this loop.

Spark-first: a superstep is two declarative plan fragments —
`scatter(state, edges, superstep)` is typically one join producing a
message frame keyed by destination vertex, `gather(state, messages,
superstep)` one aggregation producing updated vertex rows — and the
framework supplies what the reference's iteration operator supplies:
per-superstep lineage truncation, the keep-old-value rule for vertices
that received no messages (GatherFunction contract: a vertex that never
calls setNewVertexValue keeps its value), 1-based superstep numbers
(getSuperstepNumber), and an optional convergence probe.

Scale per superstep = whatever the two fragments shuffle (for the
library's clients: one message shuffle on the vertex id + one
aggregation) — identical to the hand-rolled loops these clients had, now
behind the reference's API shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scatter_gather(
    edges: DataFrame,
    vertices: DataFrame,
    scatter: Callable[[DataFrame, DataFrame, int], DataFrame],
    gather: Callable[[DataFrame, DataFrame, int], DataFrame],
    max_iterations: int,
    converged: Callable[[DataFrame, DataFrame], bool] | None = None,
    vertex_col: str = "vertex",
) -> DataFrame:
    """Run a synchronous scatter-gather iteration.

    - ``edges``: message topology, materialized once (every superstep
      replays it — the iterate-primitive discipline).
    - ``vertices``: initial state, one row per vertex, keyed by
      ``vertex_col``; all its columns are carried as vertex state.
    - ``scatter(state, edges, superstep)`` → message frame; must contain
      ``vertex_col`` (the destination).
    - ``gather(state, messages, superstep)`` → updated vertex rows, same
      schema as ``vertices``; vertices absent from the result keep their
      previous state (the setNewVertexValue contract).
    - ``superstep`` is 1-based, as getSuperstepNumber().

    Stops after ``max_iterations`` or when ``converged(prev, cur)`` is
    true. Returns the final vertex state frame.
    """
    from proteus_engine_spark.operators.iterations import iterate

    edges = edges.localCheckpoint(eager=True)

    def step(state: DataFrame, i0: int) -> DataFrame:
        superstep = i0 + 1
        messages = scatter(state, edges, superstep)
        updated = gather(state, messages, superstep)
        kept = state.join(
            updated.select(vertex_col), vertex_col, "left_anti"
        )
        return updated.unionByName(kept)

    return iterate(vertices, step, max_iterations, converged)


def sssp(
    edges: DataFrame,
    source: int,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Single-source shortest paths as the canonical scatter-gather client
    (the reference ships exactly this as the spargel example:
    spargel/ScatterGatherIteration.java class doc, and
    library/SingleSourceShortestPaths.java:42 — scatter sends
    dist + edge weight along out-edges, gather keeps the minimum).
    Directed; unit weights unless ``weight`` names an edge column.
    Returns (vertex, distance) for REACHED vertices within
    ``iterations`` hops — unreachable vertices carry the reference's
    Double.MAX_VALUE sentinel, dropped here (a 100 TB result set should
    not be mostly sentinel rows; filter parity is one line either way).
    """
    w_col = F.col(weight) if weight else F.lit(1.0)
    topo = edges.select(
        F.col(src).alias("mfrom"), F.col(dst).alias("vertex"), w_col.alias("w")
    )
    verts = (
        topo.select(F.col("mfrom").alias("vertex"))
        .union(topo.select("vertex"))
        .distinct()
        .withColumn(
            "distance",
            F.when(F.col("vertex") == source, F.lit(0.0)).otherwise(F.lit(None)),
        )
    )

    def scatter(state, edges_f, _superstep):
        return (
            edges_f.join(
                state.filter(F.col("distance").isNotNull()).select(
                    F.col("vertex").alias("mfrom"), "distance"
                ),
                "mfrom",
            )
            .select("vertex", (F.col("distance") + F.col("w")).alias("cand"))
        )

    def gather(state, messages, _superstep):
        best = messages.groupBy("vertex").agg(F.min("cand").alias("cand"))
        return (
            state.join(best, "vertex")
            .select(
                "vertex",
                F.least(
                    F.coalesce("distance", F.lit(float("inf"))), F.col("cand")
                ).alias("distance"),
            )
        )

    final = scatter_gather(topo.select("mfrom", "vertex", "w"), verts, scatter, gather, iterations)
    return final.filter(F.col("distance").isNotNull())


def gather_sum_apply(
    edges: DataFrame,
    vertices: DataFrame,
    gather_expr,
    sum_agg,
    apply_fn: Callable[[DataFrame, DataFrame, int], DataFrame],
    max_iterations: int,
    converged: Callable[[DataFrame, DataFrame], bool] | None = None,
    src: str = "src",
    dst: str = "dst",
    vertex_col: str = "vertex",
) -> DataFrame:
    """Gather-Sum-Apply iteration — Graph.runGatherSumApplyIteration
    (gsa/GatherSumApplyIteration.java:66): per superstep,
    GATHER maps each (edge, source-vertex state) neighbor pair to a
    partial value (gather_expr: a Column over the joined neighbor frame,
    which carries the edge columns plus every source-state column),
    SUM reduces the partials per destination vertex (sum_agg: an
    aggregate Column), and APPLY folds the summed value into the vertex
    state (apply_fn(state, summed, superstep) → updated rows; absent
    vertices keep state). The same superstep plan shape as
    scatter_gather — GSA differs in factoring the user surface into the
    three reference UDFs, which constrain the message stage to
    one-partial-per-edge + an associative reduce (the shape that gets
    map-side partial aggregation for free).
    """

    def scatter(state: DataFrame, edges_f: DataFrame, superstep: int) -> DataFrame:
        neighbors = edges_f.join(
            state.withColumnRenamed(vertex_col, "__src_v__"),
            F.col(src) == F.col("__src_v__"),
        )
        return neighbors.select(
            F.col(dst).alias(vertex_col), gather_expr.alias("__partial__")
        )

    def gather(state: DataFrame, messages: DataFrame, superstep: int) -> DataFrame:
        summed = messages.groupBy(vertex_col).agg(sum_agg.alias("__summed__"))
        return apply_fn(state, summed, superstep)

    return scatter_gather(
        edges, vertices, scatter, gather, max_iterations, converged, vertex_col
    )


def pregel(
    edges: DataFrame,
    vertices: DataFrame,
    compute: Callable[[DataFrame, DataFrame, DataFrame, int], tuple[DataFrame, DataFrame]],
    max_iterations: int,
    message_schema: str = "vertex long, __msg__ double",
    src: str = "src",
    dst: str = "dst",
    vertex_col: str = "vertex",
) -> DataFrame:
    """Vertex-centric (Pregel) iteration — Graph.runVertexCentricIteration
    (pregel/VertexCentricIteration.java:63, ComputeFunction.java:48): one
    user function both updates state and emits the next round's messages.
    ``compute(state, messages, edges, superstep)`` returns
    (updated_vertices, out_messages); vertices absent from
    updated_vertices keep their state (setNewVertexValue contract), and
    the iteration HALTS EARLY when no messages are produced — the
    reference's implicit vote-to-halt (a vertex with no incoming messages
    is inactive; no messages anywhere = convergence).

    Superstep 1 runs with an empty message frame, as the reference's
    first superstep does.
    """
    from proteus_engine_spark.operators.iterations import iterate

    edges = edges.localCheckpoint(eager=True)
    empty_msgs = {"df": None}

    def step(state: DataFrame, i0: int) -> DataFrame:
        superstep = i0 + 1
        msgs = empty_msgs["df"]
        if msgs is None and superstep > 1:
            return state  # halted: no messages last round
        if msgs is None:
            # superstep 1: no incoming messages yet (message_schema gives
            # the empty frame its shape — compute() must accept it)
            msgs = state.sparkSession.createDataFrame([], message_schema)
        updated, out_msgs = compute(state, msgs, edges, superstep)
        empty_msgs["df"] = (
            out_msgs.localCheckpoint(eager=True) if not out_msgs.isEmpty() else None
        )
        kept = state.join(updated.select(vertex_col), vertex_col, "left_anti")
        return updated.unionByName(kept)

    def halted(_prev: DataFrame, _cur: DataFrame) -> bool:
        # vote-to-halt: a round that emitted no messages ends the loop
        # right away (no idle checkpoint passes up to max_iterations)
        return empty_msgs["df"] is None

    return iterate(vertices, step, max_iterations, halted)
