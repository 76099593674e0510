"""Graph-based ANN: NN-Descent kNN-graph construction (round 8) and
greedy beam search over that graph (round 9) — the build half and the
query half of an HNSW-class index, both expressed as pure relational
plans.

``graph_nn_descent`` landed behind the fully-allocated r8 sampled
window (locally oracle-verified, pytest-covered, honestly labeled) and
leads the round-9 prefix; ``graph_greedy_search`` is new in round 9 and
registers inside the r9 window, so both expect formal driver rows this
round.
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


def _embeddings_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned (vec_id, demb, nrm) — the scoring table both graph
    operators join their id-keyed candidate sets against."""
    e = spread(table(spark, sf_dir, "embeddings"))
    return pin(e.select("vec_id",
                        sim.as_double(F.col("embedding")).alias("demb"))
               .select("vec_id", "demb",
                       sim.norm(F.col("demb")).alias("nrm")))


def _score_pairs(en: DataFrame, cand: DataFrame) -> DataFrame:
    """ppm-quantized cosine for each candidate (u, w) pair; vectors
    ride only these two id-keyed joins."""
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


def _nn_descent_rounds(en: DataFrame) -> list[DataFrame]:
    """[edges_0, ..., edges_ND_ROUNDS]: the stride-init graph and each
    refinement round's kept edges (u, w, sim_ppm), every round
    checkpoint-truncated (eager localCheckpoint — the PageRank /
    connected-components lineage pattern), so the driver holds only
    the loop index."""
    nn = en.agg(F.count("*").cast("bigint").alias("n"))
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
    rounds = [_score_pairs(en, init).localCheckpoint(eager=True)]
    wtop = Window.partitionBy("u").orderBy(F.col("sim_ppm").desc(), "w")
    for _t in range(1, ND_ROUNDS + 1):
        cur = rounds[-1].select("u", "w")
        twohop = (cur.alias("a")
                  .join(cur.alias("b"), F.col("a.w") == F.col("b.u"))
                  .select(F.col("a.u").alias("u"), F.col("b.w").alias("w")))
        rev = cur.select(F.col("w").alias("u"), F.col("u").alias("w"))
        cand = (cur.unionByName(twohop).unionByName(rev)
                .filter(F.col("u") != F.col("w")).distinct())
        rounds.append(_score_pairs(en, cand)
                      .withColumn("rk", F.row_number().over(wtop))
                      .filter(F.col("rk") <= ND_K)
                      .select("u", "w", "sim_ppm")
                      .localCheckpoint(eager=True))
    return rounds


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
    en = _embeddings_en(spark, sf_dir)
    rounds = _nn_descent_rounds(en)
    stats = [
        edges.agg(F.lit(t).cast("bigint").alias("round"),
                  F.count("*").cast("bigint").alias("n_edges"),
                  F.expr("cast(sum(sim_ppm) div count(*) as bigint)")
                  .alias("mean_sim_ppm"))
        for t, edges in enumerate(rounds)]
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out.orderBy("round")


def _graph_ctes() -> str:
    """The construction CTE chain shared by both oracles: embeddings ->
    en (vectors + norms) -> stride init -> e0 .. e{ND_ROUNDS} (scored,
    per-node top-K kept edges). Unrolled fixed rounds (recursive CTEs
    cannot aggregate in the recursive term; same discipline as the
    PageRank replay). The pair-scoring dot uses the UNROLLED fold —
    flat CTEs, plain column references — because the interpreted lambda
    form costs ~12 us per element and the candidate table is
    corpus x ~K^2 pairs."""
    ppm = (f"CAST(floor(({sim.dot_unrolled_sql('a.demb', 'b.demb')}"
           f" / (a.nrm * b.nrm)) * 1e6 + 0.5) AS BIGINT)")
    parts = [f"""
    WITH e AS (SELECT vec_id, {sim.as_double_sql('embedding')} AS demb
               FROM embeddings),
    en AS MATERIALIZED (
        SELECT vec_id, demb, sqrt({sim.dot_sql('demb', 'demb')}) AS nrm
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
    e0 AS MATERIALIZED (SELECT i.u, i.w, {ppm} AS sim_ppm
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
    e{t} AS MATERIALIZED (SELECT u, w, sim_ppm FROM (
                 SELECT u, w, sim_ppm,
                        row_number() OVER (PARTITION BY u
                                           ORDER BY sim_ppm DESC, w) AS rk
                 FROM s{t})
             WHERE rk <= {ND_K})""")
    return ",".join(parts)


def _nn_descent_oracle() -> str:
    rounds_union = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({t} AS BIGINT) AS round,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(sim_ppm) // count(*) AS BIGINT) AS mean_sim_ppm
    FROM e{t}""" for t in range(ND_ROUNDS + 1))
    return _graph_ctes() + "\n" + rounds_union + "\n    ORDER BY round"


REGISTRY["graph_nn_descent"].oracle = _nn_descent_oracle()


# --------------------------------- greedy beam search over the graph

# The query half of the graph-ANN story: HNSW-class indexes answer a
# query by GREEDY NAVIGATION — start at an entry node, repeatedly hop
# to the neighbor closest to the query, stop when no neighbor improves.
# The batch-distributed form is beam search with fixed hop rounds
# unrolled: a per-query frontier of the GS_BEAM best visited nodes,
# expanded each hop through the SYMMETRIZED union of the refined kNN
# edges and the stride-init edges (HNSW links are bidirectional, and
# NSW-style navigability needs the long-range links the init graph
# provides — a pure kNN graph fragments into clusters greedy search
# cannot leave), scored against the query vector, with a visited set so
# no node is scored twice. Everything is relational: per hop, one
# frontier-edges join, one anti-join against the visited set, one
# id-keyed scoring join, one rank window. Queries are GS_NQ pinned
# corpus nodes (stride-sampled over the id space, self excluded) — the
# corpus-distributed workload an ANN index actually serves — searched
# from GS_ENTRIES stride-pinned entry points. The output is the
# per-query search-quality report — nodes visited (= scoring cost) and
# recall@K against the exact cosine ranking — i.e. the navigability
# measurement an index-parameter decision (K, rounds, beam, hops)
# reads. NOTE the fixture corpus is deliberately adversarial for graph
# ANN: its embeddings are near-uniform random (within-label cosine ==
# cross-label cosine == ~0), so the similarity surface is flat and NO
# graph navigates it much better than random visiting — the honest
# report here shows recall modestly above the visited-fraction
# baseline, and the tests assert exactly that (plus sub-linear
# visiting), not a fantasy recall the data cannot support.
#
# Determinism: query ids and entry ids are modular-arithmetic functions
# of the corpus size computed identically in both engines;
# similarities are ppm-quantized int64, all ranks tie-broken on node
# id; hops are unrolled identically in both engines.
GS_NQ = 6        # pinned query panel size
GS_BEAM = 8      # frontier width per query
GS_HOPS = 4      # unrolled hop rounds
GS_TOPK = 10     # answer size / recall@K
GS_ENTRIES = 8   # stride-pinned entry points per query
GS_QOFF = 17     # query id stride sample: (GS_QOFF + GS_QSTRIDE*i) % n
GS_QSTRIDE = 131


@register(
    "graph_greedy_search",
    oracle=None,  # set below
    tags=("llm", "graph", "similarity", "ann", "recall"),
)
def q_graph_greedy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy beam search over the NN-Descent kNN graph: for each of
    GS_NQ stride-pinned corpus-node queries, navigate GS_HOPS hops from
    GS_ENTRIES stride-pinned entry points through the symmetrized
    (refined + init long-link) edge list, keeping the GS_BEAM best
    visited nodes as the frontier, then report nodes visited, hits@K
    and recall@K of the search's top-GS_TOPK against the exact cosine
    top-GS_TOPK (self excluded on both sides), plus the best similarity
    reached — the navigability report that sizes a graph index (and the
    consumer that makes graph_nn_descent's build output usable).

    Scale shape: the graph build is the audited NN-Descent plan; the
    search itself is query-panel-bounded — per hop, the frontier is
    Q x GS_BEAM rows joined against the (u, w) edge list (id-int rows
    only), anti-joined against the visited set, and only NEW nodes ride
    the one id-keyed scoring join against the vector table (the query
    panel itself is Q rows, broadcast). The exact baseline scans the
    corpus ONCE against the broadcast panel and ranks via the two-phase
    top-K ((query, input-partition) rank, then global), so ranking
    never collapses to |Q| partitions. Visited state is
    checkpoint-truncated per hop and bounded by
    Q x (GS_ENTRIES + GS_BEAM x degree x GS_HOPS) rows."""
    en = _embeddings_en(spark, sf_dir)
    rounds = _nn_descent_rounds(en)
    nn = en.agg(F.count("*").cast("bigint").alias("n"))
    und = (rounds[-1].select("u", "w")
           .unionByName(rounds[0].select("u", "w"))
           .unionByName(rounds[-1].select(F.col("w").alias("u"),
                                          F.col("u").alias("w")))
           .unionByName(rounds[0].select(F.col("w").alias("u"),
                                         F.col("u").alias("w")))
           .distinct().localCheckpoint(eager=True))
    qpanel = (spark.range(GS_NQ)
              .select(F.col("id").cast("bigint").alias("query_id"))
              .crossJoin(F.broadcast(nn))
              .select("query_id",
                      F.expr(f"({GS_QOFF} + {GS_QSTRIDE} * query_id) % n")
                      .cast("bigint").alias("qid"))
              .join(en, F.col("qid") == F.col("vec_id"))
              .select("query_id", "qid",
                      F.col("demb").alias("qvec"),
                      F.col("nrm").alias("qnorm")))

    def score(nodes: DataFrame) -> DataFrame:
        """(query_id, node) -> + ppm cosine vs that query's vector;
        the panel is broadcast, vectors ride only the id-keyed join."""
        return (nodes
                .join(en.select(F.col("vec_id").alias("node"),
                                "demb", "nrm"), "node")
                .join(F.broadcast(qpanel.select("query_id", "qvec",
                                                "qnorm")), "query_id")
                .select("query_id", "node",
                        F.floor((sim.dot(F.col("qvec"), F.col("demb"))
                                 / (F.col("qnorm") * F.col("nrm")))
                                * F.lit(1e6) + F.lit(0.5)).cast("long")
                        .alias("sim_ppm")))

    entries = (spark.range(GS_ENTRIES)
               .select(F.col("id").cast("bigint").alias("j"))
               .crossJoin(F.broadcast(nn))
               .select(F.expr(f"j * (n div {GS_ENTRIES})")
                       .cast("bigint").alias("node"))
               .distinct())
    seen = score(qpanel.select("query_id", "qid")
                 .crossJoin(F.broadcast(entries))
                 .filter(F.col("node") != F.col("qid"))
                 .select("query_id", "node")
                 ).localCheckpoint(eager=True)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim_ppm").desc(), "node")
    frontier = (seen.withColumn("rk", F.row_number().over(wq))
                .filter(F.col("rk") <= GS_BEAM)
                .select("query_id", "node"))
    for _h in range(1, GS_HOPS + 1):
        nbrs = (frontier.join(und, frontier["node"] == und["u"])
                .select("query_id", F.col("w").alias("node"))
                .distinct()
                .join(F.broadcast(qpanel.select("query_id", "qid")),
                      "query_id")
                .filter(F.col("node") != F.col("qid"))
                .select("query_id", "node"))
        new = nbrs.join(seen.select("query_id", "node"),
                        ["query_id", "node"], "left_anti")
        seen = (seen.unionByName(score(new))
                .localCheckpoint(eager=True))
        frontier = (seen.withColumn("rk", F.row_number().over(wq))
                    .filter(F.col("rk") <= GS_BEAM)
                    .select("query_id", "node"))
    found = (seen.withColumn("rk", F.row_number().over(wq))
             .filter(F.col("rk") <= GS_TOPK)
             .select("query_id", "node"))

    # Exact baseline: corpus scanned once against the broadcast panel,
    # two-phase top-K (the sim_crossmodal_recall discipline).
    scored_all = (en.crossJoin(F.broadcast(qpanel))
                  .filter(F.col("vec_id") != F.col("qid"))
                  .select("query_id", "vec_id",
                          F.floor((sim.dot(F.col("qvec"), F.col("demb"))
                                   / (F.col("qnorm") * F.col("nrm")))
                                  * F.lit(1e6) + F.lit(0.5)).cast("long")
                          .alias("sim_ppm")))
    w1 = (Window.partitionBy("query_id", "pid")
          .orderBy(F.col("sim_ppm").desc(), "vec_id"))
    exact = (scored_all.withColumn("pid", F.spark_partition_id())
             .withColumn("r1", F.row_number().over(w1))
             .filter(F.col("r1") <= GS_TOPK)
             .withColumn("rk", F.row_number().over(
                 Window.partitionBy("query_id").orderBy(
                     F.col("sim_ppm").desc(), "vec_id")))
             .filter(F.col("rk") <= GS_TOPK)
             .select("query_id", F.col("vec_id").alias("node")))

    nv = (seen.groupBy("query_id")
          .agg(F.count("*").cast("bigint").alias("n_visited"),
               F.max("sim_ppm").cast("bigint").alias("best_sim_ppm")))
    hits = (found.join(exact, ["query_id", "node"])
            .groupBy("query_id")
            .agg(F.count("*").cast("bigint").alias("n_hits")))
    return (nv.join(hits, "query_id", "left")
            .select("query_id", "n_visited",
                    F.coalesce("n_hits", F.lit(0)).cast("bigint")
                    .alias("n_hits"),
                    F.expr(f"cast(coalesce(n_hits, 0) * 1000000"
                           f" div {GS_TOPK} as bigint)")
                    .alias("recall_ppm"),
                    "best_sim_ppm")
            .orderBy("query_id"))


def _greedy_search_oracle() -> str:
    # Scoring reuses the lambda-fold dot_sql so the add sequence
    # matches Spark's F.aggregate fold bit-for-bit; query/entry ids are
    # the same modular expressions over the corpus count. Hops
    # unrolled; NOT EXISTS is the anti-join twin.
    score = (f"CAST(floor(({sim.dot_sql('p.qvec', 'b.demb')}"
             f" / (p.qnorm * b.nrm)) * 1e6 + 0.5) AS BIGINT)")
    parts = [f"""
    und AS MATERIALIZED (SELECT DISTINCT u, w FROM (
                SELECT u, w FROM e{ND_ROUNDS}
                UNION ALL
                SELECT u, w FROM e0
                UNION ALL
                SELECT w AS u, u AS w FROM e{ND_ROUNDS}
                UNION ALL
                SELECT w AS u, u AS w FROM e0)),
    qp AS MATERIALIZED (SELECT CAST(i.i AS BIGINT) AS query_id,
                  CAST(({GS_QOFF} + {GS_QSTRIDE} * i.i) % nn.n AS BIGINT)
                      AS qid,
                  b.demb AS qvec, b.nrm AS qnorm
           FROM (SELECT unnest(range(0, {GS_NQ})) AS i) i
                CROSS JOIN nn
                JOIN en b
                  ON b.vec_id = ({GS_QOFF} + {GS_QSTRIDE} * i.i) % nn.n),
    ent AS MATERIALIZED (SELECT DISTINCT CAST(j.j * (nn.n // {GS_ENTRIES}) AS BIGINT)
                       AS node
            FROM (SELECT unnest(range(0, {GS_ENTRIES})) AS j) j
                 CROSS JOIN nn),
    gs0 AS MATERIALIZED (SELECT p.query_id, t.node, {score} AS sim_ppm
            FROM qp p CROSS JOIN ent t
                 JOIN en b ON b.vec_id = t.node
            WHERE t.node != p.qid),
    gf0 AS MATERIALIZED (SELECT query_id, node FROM (
                SELECT query_id, node,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim_ppm DESC, node)
                           AS rk
                FROM gs0)
            WHERE rk <= {GS_BEAM})"""]
    for h in range(1, GS_HOPS + 1):
        p = h - 1
        parts.append(f"""
    gn{h} AS MATERIALIZED (SELECT DISTINCT f.query_id, u2.w AS node
              FROM gf{p} f JOIN und u2 ON u2.u = f.node
                   JOIN qp q2 ON q2.query_id = f.query_id
              WHERE u2.w != q2.qid
                AND NOT EXISTS (SELECT 1 FROM gs{p} s
                                WHERE s.query_id = f.query_id
                                  AND s.node = u2.w)),
    gc{h} AS (SELECT g.query_id, g.node, {score} AS sim_ppm
              FROM gn{h} g JOIN en b ON b.vec_id = g.node
                           JOIN qp p ON p.query_id = g.query_id),
    gs{h} AS MATERIALIZED (
        SELECT * FROM gs{p} UNION ALL SELECT * FROM gc{h}),
    gf{h} AS MATERIALIZED (SELECT query_id, node FROM (
                  SELECT query_id, node,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY sim_ppm DESC, node)
                             AS rk
                  FROM gs{h})
              WHERE rk <= {GS_BEAM})""")
    parts.append(f"""
    found AS (SELECT query_id, node FROM (
                  SELECT query_id, node,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY sim_ppm DESC, node)
                             AS rk
                  FROM gs{GS_HOPS})
              WHERE rk <= {GS_TOPK}),
    allsc AS MATERIALIZED (SELECT p.query_id, b.vec_id, {score} AS sim_ppm
              FROM qp p CROSS JOIN en b
              WHERE b.vec_id != p.qid),
    exact AS (SELECT query_id, vec_id AS node FROM (
                  SELECT query_id, vec_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY sim_ppm DESC, vec_id)
                             AS rk
                  FROM allsc)
              WHERE rk <= {GS_TOPK}),
    nv AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_visited,
                  CAST(max(sim_ppm) AS BIGINT) AS best_sim_ppm
           FROM gs{GS_HOPS} GROUP BY query_id),
    hits AS (SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_hits
             FROM found f JOIN exact e ON e.query_id = f.query_id
                                      AND e.node = f.node
             GROUP BY f.query_id)""")
    return (_graph_ctes() + "," + ",".join(parts) + f"""
    SELECT nv.query_id, nv.n_visited,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(coalesce(h.n_hits, 0) * 1000000 // {GS_TOPK} AS BIGINT)
               AS recall_ppm,
           nv.best_sim_ppm
    FROM nv LEFT JOIN hits h ON h.query_id = nv.query_id
    ORDER BY nv.query_id""")


REGISTRY["graph_greedy_search"].oracle = _greedy_search_oracle()
