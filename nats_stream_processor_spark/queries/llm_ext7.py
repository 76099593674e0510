"""Round-8 late addition (behind the sampled window).

The r8 50-slot driver sample was already fully allocated (sim_rrf_fusion
+ 5 new llm_ext6 operators + 2 code-changed queries + 42 re-certification
rotations) when this module landed, so its operator sits BEHIND the
window this round: locally oracle-verified at sf0.001/0.01/0.1 and in a
plain driver-style session, pytest-covered, and first in line for a
formal row in the round-9 prefix rotation. (Same honest-certification
pattern as llm_ext5 in round 7 — describing unsampled code as formally
certified is exactly the drift round 6 was flagged for.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Registry import FIRST among intra-package imports (worker re-import
# ordering; see llm_ext2.py's header note).
from ..registry import REGISTRY, pin, register, spread, table

from ..operators import similarity as sim

# ------------------------------------------ NN-Descent kNN-graph build

# NN-Descent (Dong et al.): build an approximate kNN graph WITHOUT an
# index by iterating "a neighbor of my neighbor is probably my
# neighbor" — start from a cheap arbitrary graph, then each round score
# every node against its neighbors' neighbors (and reverse neighbors)
# and keep the best K. This is the graph-construction workhorse behind
# HNSW-class indexes and graph-based dedup at corpus scale, and its
# distributed shape is pure relational algebra: one self-join (2-hop
# candidates), one union (reverse edges), one scoring join against the
# vector table, one rank-window top-K per node — repeated a fixed
# number of rounds. Determinism: the initial graph is a pinned stride
# sample over the contiguous vec_id space (w = (u + j*ND_STRIDE) mod N,
# self-collisions shifted by 1); similarities are ppm-quantized int64
# cosines (the audited dot/dot_sql fold pair), ties broken on neighbor
# id; rounds are unrolled identically in both engines (the same
# fixed-round discipline as the PageRank replay). The output is the
# per-round convergence report (edge count, mean neighbor similarity)
# a graph-index build reads. The true per-round invariant is PER-NODE
# top-m dominance: each round's candidate set contains the previous
# round's edges, so for every node the j-th best kept similarity can
# never fall (j <= previous list length). The GLOBAL mean is only
# nondecreasing when every node's list stays full — a node holding
# fewer than ND_K edges (stride self-collisions on adversarial corpus
# sizes, e.g. n % ND_STRIDE == 0) tops up with lower-similarity edges
# that can pull the mean down. The tests assert per-node dominance as
# the invariant and the rising mean only as a property of the shipped
# fixtures.
ND_K = 5        # neighbors kept per node
ND_ROUNDS = 2   # refinement rounds (unrolled in both engines)
ND_STRIDE = 97  # init-graph stride over the contiguous vec_id space


@register(
    "graph_nn_descent",
    oracle=None,  # set below
    tags=("llm", "graph", "nn-descent", "iterative"),
)
def q_nn_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NN-Descent kNN-graph construction: pinned stride-sample init
    graph, then ND_ROUNDS rounds of candidate generation (current
    edges + 2-hop neighbors-of-neighbors + reverse edges), exact
    ppm-cosine scoring, and per-node top-ND_K selection. Emits one row
    per round (including round 0 = the init graph): edge count and
    mean neighbor similarity — the convergence curve that tells an
    index build when to stop.

    Scale shape: each round is ONE self-join on the (u, w) edge list
    (corpus x K rows, never corpus x corpus), one union, two id-keyed
    joins against the (id, vector, norm) table to score, and one
    rank window partitioned by node — all shuffles carry ids and int
    scores; vectors ride only the two scoring joins. Edge lineage is
    truncated per round with an eager localCheckpoint (the PageRank /
    connected-components pattern), so the driver holds only the loop
    index."""
    e = spread(table(spark, sf_dir, "embeddings"))
    en = pin(e.select("vec_id",
                      sim.as_double(F.col("embedding")).alias("demb"))
             .select("vec_id", "demb",
                     sim.norm(F.col("demb")).alias("nrm")))
    nn = en.agg(F.count("*").cast("bigint").alias("n"))

    def score(cand: DataFrame) -> DataFrame:
        a = en.select(F.col("vec_id").alias("u"),
                      F.col("demb").alias("da"), F.col("nrm").alias("na"))
        b = en.select(F.col("vec_id").alias("w"),
                      F.col("demb").alias("db"), F.col("nrm").alias("nb"))
        return (cand.join(a, "u").join(b, "w")
                .select("u", "w",
                        F.floor((sim.dot(F.col("da"), F.col("db"))
                                 / (F.col("na") * F.col("nb")))
                                * F.lit(1e6) + F.lit(0.5)).cast("long")
                        .alias("sim_ppm")))

    init = (en.select("vec_id").crossJoin(F.broadcast(nn))
            .select(F.col("vec_id").alias("u"),
                    F.explode(F.array(*[
                        F.lit(j) for j in range(1, ND_K + 1)])).alias("j"),
                    "n")
            .select("u",
                    F.expr(f"((u + j * {ND_STRIDE}) % n"
                           f" + if((u + j * {ND_STRIDE}) % n = u, 1, 0))"
                           f" % n").alias("w"))
            .filter(F.col("u") != F.col("w")).distinct())
    edges = score(init).localCheckpoint(eager=True)
    stats = [edges.agg(F.lit(0).cast("bigint").alias("round"),
                       F.count("*").cast("bigint").alias("n_edges"),
                       F.expr("cast(sum(sim_ppm) div count(*) as bigint)")
                       .alias("mean_sim_ppm"))]
    wtop = Window.partitionBy("u").orderBy(F.col("sim_ppm").desc(), "w")
    for t in range(1, ND_ROUNDS + 1):
        cur = edges.select("u", "w")
        twohop = (cur.alias("a")
                  .join(cur.alias("b"), F.col("a.w") == F.col("b.u"))
                  .select(F.col("a.u").alias("u"), F.col("b.w").alias("w")))
        rev = cur.select(F.col("w").alias("u"), F.col("u").alias("w"))
        cand = (cur.unionByName(twohop).unionByName(rev)
                .filter(F.col("u") != F.col("w")).distinct())
        edges = (score(cand)
                 .withColumn("rk", F.row_number().over(wtop))
                 .filter(F.col("rk") <= ND_K)
                 .select("u", "w", "sim_ppm")
                 .localCheckpoint(eager=True))
        stats.append(
            edges.agg(F.lit(t).cast("bigint").alias("round"),
                      F.count("*").cast("bigint").alias("n_edges"),
                      F.expr("cast(sum(sim_ppm) div count(*) as bigint)")
                      .alias("mean_sim_ppm")))
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out.orderBy("round")


def _nn_descent_oracle() -> str:
    # Unrolled fixed rounds (recursive CTEs cannot aggregate in the
    # recursive term; same discipline as the PageRank replay). The
    # pair-scoring dot uses the UNROLLED fold — flat CTEs, plain column
    # references — because the interpreted lambda form costs ~12 us per
    # element and the candidate table is corpus x ~K^2 pairs.
    ppm = (f"CAST(floor(({sim.dot_unrolled_sql('a.demb', 'b.demb')}"
           f" / (a.nrm * b.nrm)) * 1e6 + 0.5) AS BIGINT)")
    parts = [f"""
    WITH e AS (SELECT vec_id, {sim.as_double_sql('embedding')} AS demb
               FROM embeddings),
    en AS (SELECT vec_id, demb, sqrt({sim.dot_sql('demb', 'demb')}) AS nrm
           FROM e),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM en),
    init AS (
        SELECT DISTINCT u, w FROM (
            SELECT a.vec_id AS u,
                   ((a.vec_id + j.j * {ND_STRIDE}) % nn.n
                    + CASE WHEN (a.vec_id + j.j * {ND_STRIDE}) % nn.n
                                = a.vec_id THEN 1 ELSE 0 END) % nn.n AS w
            FROM en a CROSS JOIN nn,
                 LATERAL (SELECT unnest(range(1, {ND_K} + 1)) AS j) j)
        WHERE u != w),
    e0 AS (SELECT i.u, i.w, {ppm} AS sim_ppm
           FROM init i JOIN en a ON a.vec_id = i.u
                       JOIN en b ON b.vec_id = i.w)"""]
    for t in range(1, ND_ROUNDS + 1):
        p = t - 1
        parts.append(f"""
    c{t} AS (
        SELECT DISTINCT u, w FROM (
            SELECT u, w FROM e{p}
            UNION ALL
            SELECT x.u, y.w FROM e{p} x JOIN e{p} y ON x.w = y.u
            UNION ALL
            SELECT w AS u, u AS w FROM e{p})
        WHERE u != w),
    s{t} AS (SELECT c.u, c.w, {ppm} AS sim_ppm
             FROM c{t} c JOIN en a ON a.vec_id = c.u
                         JOIN en b ON b.vec_id = c.w),
    e{t} AS (SELECT u, w, sim_ppm FROM (
                 SELECT u, w, sim_ppm,
                        row_number() OVER (PARTITION BY u
                                           ORDER BY sim_ppm DESC, w) AS rk
                 FROM s{t})
             WHERE rk <= {ND_K})""")
    rounds_union = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({t} AS BIGINT) AS round,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(sim_ppm) // count(*) AS BIGINT) AS mean_sim_ppm
    FROM e{t}""" for t in range(ND_ROUNDS + 1))
    return (",".join(parts) + "\n"
            + rounds_union + "\n    ORDER BY round")


REGISTRY["graph_nn_descent"].oracle = _nn_descent_oracle()
