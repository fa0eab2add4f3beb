"""Core-parity named queries (SURVEY.md §2.9) over the derived edge view.

Each reference job appears as a named query with a DuckDB oracle; the
MAX constants are chosen per FIXTURES.md §1.5 so the sf0.01 graph
(≈58k edges over 997 nodes) exercises the filter and keeps materialized
path sets hashable (MAX=200 → ≈28k path rows).

Column names are aliased identically in the Spark plan and the oracle
SQL — the driver's compare hashes values under sorted column names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators import graph as G
from twitter_followers_patterns_mapreduce_spark.plans.registry import register
from twitter_followers_patterns_mapreduce_spark.operators import graph_iter as GI
from twitter_followers_patterns_mapreduce_spark.sources.readers import EDGES_ORACLE_CTE, derived_edges

_E = f"WITH edges AS ({EDGES_ORACLE_CTE})"

#: MAX cutoffs for the harness graph (reference defaults are id-scale
#: specific: 11,316,812 for CE, 12,500 for join jobs — SURVEY.md §2.2 note).
MAX_CE = G.MAX_EDGE_COUNT
MAX_TRI = 500
MAX_PATHS = 200


@register(
    "ce_count_edges",
    oracle=f"""{_E}
SELECT CAST(COUNT(*) AS BIGINT) AS edge_count
FROM edges WHERE src < {MAX_CE} AND dst < {MAX_CE}""",
    description="CE: edge count after MAX filter (reference default MAX, passes all)",
)
def ce_count_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.count_edges(derived_edges(spark, sf_dir), MAX_CE)


@register(
    "ce_count_edges_max",
    oracle=f"""{_E}
SELECT CAST(COUNT(*) AS BIGINT) AS edge_count
FROM edges WHERE src < {MAX_TRI} AND dst < {MAX_TRI}""",
    description="CE with a binding MAX cutoff (filter actually selective)",
)
def ce_count_edges_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.count_edges(derived_edges(spark, sf_dir), MAX_TRI)


@register(
    "ce_count_edges_csv",
    # Oracle reads the DERIVATION from the parquet views, never the
    # materialized CSV: it stays valid at every sf the replica gate
    # runs (an earlier read_csv('<sf0.01 path>') oracle broke the
    # sf0.001 sweep), and it is independent of the CSV writer — a
    # materialization bug shows up as a Spark-vs-oracle mismatch
    # instead of being mirrored on both sides.
    oracle=f"""{_E}
SELECT CAST(COUNT(*) AS BIGINT) AS edge_count
FROM edges WHERE src < {MAX_TRI} AND dst < {MAX_TRI}""",
    description="CE on the reference's NATIVE csv input (S1 text scan, binding MAX); "
    "oracle is the parquet derivation the CSV was materialized from",
)
def ce_count_edges_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CE job on its actual input format: a headerless ``src,dst``
    CSV scanned with an explicit schema (``sources/readers.py``
    ``edges_from_csv``; reference ``countedges/CountEdgesAfterMax.java:80``
    reads the same lines via TextInputFormat).  The MAX filter pushes
    into the CSV scan (Spark CSV source supports predicate pushdown)."""
    from twitter_followers_patterns_mapreduce_spark.sources.readers import (
        edges_from_csv,
        materialize_edges_csv,
    )

    return G.count_edges(edges_from_csv(spark, materialize_edges_csv(sf_dir)), MAX_TRI)


@register(
    "degrees",
    oracle=f"""{_E},
tagged AS (
  SELECT src AS id, 1 AS out_deg, 0 AS in_deg FROM edges
  UNION ALL
  SELECT dst AS id, 0 AS out_deg, 1 AS in_deg FROM edges)
SELECT id, CAST(SUM(out_deg) AS BIGINT) AS out_deg, CAST(SUM(in_deg) AS BIGINT) AS in_deg
FROM tagged GROUP BY id""",
    description="per-node in/out degree table (EX mapper double-emit as UNION)",
)
def degrees_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.degrees(derived_edges(spark, sf_dir))


@register(
    "ex_two_hop_count",
    oracle=f"""{_E},
outd AS (SELECT src AS id, COUNT(*) AS o FROM edges GROUP BY src),
ind  AS (SELECT dst AS id, COUNT(*) AS i FROM edges GROUP BY dst)
SELECT CAST(COALESCE(SUM(i * o), 0) AS BIGINT) AS two_hop_count
FROM ind JOIN outd USING (id)""",
    description="EX: exact 2-hop count via degree-product rewrite (no path materialization)",
)
def ex_two_hop_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.two_hop_count_exact(derived_edges(spark, sf_dir))


@register(
    "ap_two_hop_count",
    oracle=f"""{_E},
e AS (SELECT * FROM edges WHERE src < {MAX_TRI} AND dst < {MAX_TRI})
SELECT CAST(COUNT(*) AS BIGINT) AS two_hop_count
FROM e a JOIN e b ON a.dst = b.src""",
    description="AP: 2-hop count by materializing the self-join under MAX (includes round-trips)",
)
def ap_two_hop_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.two_hop_count_approx(derived_edges(spark, sf_dir), MAX_TRI)


@register(
    "ap_two_hop_paths",
    oracle=f"""{_E},
e AS (SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS})
SELECT a.src AS x, a.dst AS y, b.dst AS z
FROM e a JOIN e b ON a.dst = b.src""",
    description="AP path enumeration: (x,y,z) tuples incl. round-trips",
)
def ap_two_hop_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.two_hop_paths(derived_edges(spark, sf_dir), MAX_PATHS, exclude_roundtrips=False)


@register(
    "rs_two_hop_paths_noloop",
    oracle=f"""{_E},
e AS (SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS})
SELECT a.src AS x, a.dst AS y, b.dst AS z
FROM e a JOIN e b ON a.dst = b.src AND a.src <> b.dst""",
    description="RS job 1: 2-hop paths excluding X→Y→X round-trips (F3 theta-conjunct)",
)
def rs_two_hop_paths_noloop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.two_hop_paths(derived_edges(spark, sf_dir), MAX_PATHS, exclude_roundtrips=True)


_TRI_ORACLE = f"""{_E},
e AS (SELECT * FROM edges WHERE src < {MAX_TRI} AND dst < {MAX_TRI}),
paths AS (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM e a JOIN e b ON a.dst = b.src AND a.src <> b.dst)
SELECT CAST(COUNT(*) AS BIGINT) AS triangle_count_raw
FROM paths p
WHERE EXISTS (SELECT 1 FROM e WHERE e.src = p.z AND e.dst = p.x)"""


@register(
    "rs_triangle_count_raw",
    oracle=_TRI_ORACLE,
    description="RS: raw triangle incidence count (3× triangles), shuffle sort-merge semi-join",
)
def rs_triangle_count_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_count_raw(
        derived_edges(spark, sf_dir), MAX_TRI, strategy="shuffle", min_rotation=True
    )


@register(
    "rj_triangle_count_raw",
    oracle=_TRI_ORACLE,
    description="RJ: same logical query, broadcast (replicated) semi-join — README.md:79-81",
)
def rj_triangle_count_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_count_raw(
        derived_edges(spark, sf_dir), MAX_TRI, strategy="broadcast", min_rotation=True
    )


@register(
    "triangle_count",
    oracle=f"""SELECT CAST(triangle_count_raw // 3 AS BIGINT) AS triangle_count
FROM ({_TRI_ORACLE}) raw""",
    description="normalized triangle count = raw ÷ 3 (engine-added variant, AQE-chosen join)",
)
def triangle_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_count(
        derived_edges(spark, sf_dir), MAX_TRI, strategy="auto", min_rotation=True
    )


@register(
    "rank_by_degree",
    oracle=f"""{_E},
tagged AS (
  SELECT src AS id, 1 AS out_deg, 0 AS in_deg FROM edges
  UNION ALL SELECT dst, 0, 1 FROM edges),
deg AS (
  SELECT id, CAST(SUM(out_deg) AS BIGINT) AS out_deg, CAST(SUM(in_deg) AS BIGINT) AS in_deg,
         CAST(SUM(out_deg) + SUM(in_deg) AS BIGINT) AS total_deg
  FROM tagged GROUP BY id),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY total_deg DESC, id ASC) AS rank, id, total_deg, out_deg, in_deg
  FROM deg)
SELECT CAST(rank AS INT) AS rank, id, total_deg, in_deg, out_deg FROM ranked WHERE rank <= 20""",
    description="extension: top-20 nodes by total degree (window row_number, deterministic tiebreak)",
)
def rank_by_degree_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.rank_by_degree(derived_edges(spark, sf_dir), k=20)


@register(
    "mutual_follow_pairs",
    oracle=f"""{_E}
SELECT DISTINCT a.src AS u, a.dst AS v
FROM edges a JOIN edges b ON a.src = b.dst AND a.dst = b.src
WHERE a.src < a.dst""",
    description="extension: reciprocal-edge pairs (the round-trip structure EX counts / RS excludes)",
)
def mutual_follow_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.mutual_follow_pairs(derived_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# Iterative extensions: connected components + PageRank (operators/graph_iter)

#: deterministic sparsifier keeping ~1/50 of edges — the full derived view is
#: one giant component (boring fixture); this cut yields ~20 components at
#: sf0.01 so the CC output actually discriminates.
SPARSE_MOD = 53
_SPARSE_CTE = f"SELECT * FROM ({EDGES_ORACLE_CTE}) e WHERE (src * 31 + dst) % {SPARSE_MOD} = 0"


def _sparse_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    return e.where((e["src"] * 31 + e["dst"]) % SPARSE_MOD == 0)


@register(
    "graph_components",
    oracle=GI.connected_components_oracle(_SPARSE_CTE),
    description="iterative: undirected connected components via hash-min label propagation "
    "(O(diameter) passes, lineage truncated per pass); oracle = recursive closure",
)
def graph_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.connected_components(_sparse_edges(spark, sf_dir))


@register(
    "graph_degree_gini",
    oracle=G.degree_gini_oracle(_SPARSE_CTE),
    description="attention-inequality Gini of the degree distribution, SORT-FREE "
    "exact form: the rank sum collapses onto the degree HISTOGRAM (nodes sharing "
    "a degree occupy consecutive ranks; their rank-sum is permutation-invariant), "
    "so the only window rides the bounded distinct-degree spine — no |V|-row "
    "global sort; exact DECIMAL(38,0) integer terms, 1e-6 floor",
)
def graph_degree_gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.degree_gini(_sparse_edges(spark, sf_dir))


@register(
    "graph_rich_club",
    oracle=G.rich_club_oracle(_SPARSE_CTE, ks=(2, 4, 8, 16)),
    description="rich-club coefficient phi(k) at degree thresholds 2/4/8/16 — do hubs "
    "preferentially wire to each other (subgraph-density companion of assortativity); "
    "all thresholds fold into ONE conditional aggregate each on the degree-annotated "
    "edge table and the degree table, crossed 1x1",
)
def graph_rich_club_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.rich_club(_sparse_edges(spark, sf_dir), ks=(2, 4, 8, 16))


@register(
    "graph_kcore",
    oracle=GI.k_core_oracle(_SPARSE_CTE, k=2, rounds=8),
    description="iterative: 2-core via synchronous parallel peeling (drop all deg<k "
    "nodes per round to a fixed point); oracle = the same peeling unrolled 8 rounds",
)
def graph_kcore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.k_core(_sparse_edges(spark, sf_dir), k=2, rounds=8)


@register(
    "graph_coreness",
    # kmax=4 on the sparse slice: tiers 3-4 are EMPTY there (the
    # sparse 3-core is empty, see graph_kcore_k16's note), which pins
    # the empty-top-tier path under the driver's gate; the all-tiers-
    # populated case is pinned by the constructed-graph unit test, and
    # high-k peeling by graph_kcore_k16.
    oracle=GI.coreness_oracle(_SPARSE_CTE, kmax=4, rounds=8),
    description="core-number decomposition (coreness per node, k<=4): union of the "
    "per-k parallel peelings + MAX per node — the degeneracy-ordering signal; "
    "bounded-k parallel Batagelj-Zaversnik by composition of k_core",
)
def graph_coreness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.coreness(_sparse_edges(spark, sf_dir), kmax=4, rounds=8)


@register(
    "graph_coreness_k17",
    # The BINDING companion to graph_coreness: the dense src/dst<200
    # subgraph (degrees 11-35) 16-cores to 186 nodes (graph_kcore_k16's
    # calibration), so kmax=17 yields a SPREAD of populated tiers
    # (coreness values 11..16 at sf0.01) — the full incremental-peeling
    # chain is exercised and non-degenerate under the driver's gate,
    # not only in unit goldens.  rounds=4 per tier (the dense cascade
    # fixed-points in <=3, ktruss precedent); the k=17 peeling has NOT
    # fully unravelled after 4 bounded rounds, so a 17 tier survives —
    # by the documented bounded-rounds contract BOTH engines peel
    # exactly 4 rounds, and "coreness 17" reads as ">= kmax under
    # bounded peeling" (the saturation semantics in coreness()).
    oracle=GI.coreness_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}",
        kmax=17,
        rounds=4,
    ),
    description="core decomposition at a binding kmax=17 on the dense subgraph — "
    "populated tiers through k=16, empty 17th: pins the incremental tier "
    "peeling's k-generality under the driver's gate",
)
def graph_coreness_k17_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] < MAX_PATHS) & (e["dst"] < MAX_PATHS))
    return GI.coreness(e, kmax=17, rounds=4)


@register(
    "graph_kcore_k16",
    # k=16 on the dense src/dst<200 subgraph (degrees 11-35, median 23):
    # a 3-round cascade peels 14 nodes and a 186-node core survives —
    # a BINDING second-k check of the peeling loop with a NON-EMPTY
    # fixed point (the sparse graph's 3-core is empty, the dense
    # graph's 3-core is everything, and k>=17 here unravels the whole
    # subgraph; neither extreme exercises the loop).
    oracle=GI.k_core_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}",
        k=16,
        rounds=8,
    ),
    description="16-core at a second, binding k — pins the peeling loop's "
    "k-generality under the driver's gate, not only in unit goldens",
)
def graph_kcore_k16_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] < MAX_PATHS) & (e["dst"] < MAX_PATHS))
    return GI.k_core(e, k=16, rounds=8)


@register(
    "graph_clustering_coefficient",
    oracle=f"""WITH sparse AS ({_SPARSE_CTE}),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM sparse WHERE src <> dst),
nbrs AS (SELECT a AS v, b AS n FROM und UNION ALL SELECT b AS v, a AS n FROM und),
deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM nbrs GROUP BY v),
wedges AS (SELECT n1.v, n1.n AS x, n2.n AS y
           FROM nbrs n1 JOIN nbrs n2 ON n1.v = n2.v AND n1.n < n2.n),
tri AS (SELECT w.v, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM wedges w JOIN und u ON w.x = u.a AND w.y = u.b GROUP BY w.v)
SELECT d.v, d.deg,
       CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       (2 * COALESCE(t.n_triangles, 0)) / (d.deg * (d.deg - 1)) AS clustering_coeff
FROM deg d LEFT JOIN tri t ON d.v = t.v
WHERE d.deg >= 2""",
    description="extension: per-vertex local clustering coefficient (closed/possible "
    "wedges) — wedge self-join + semi-join closure over canonical undirected pairs",
)
def graph_clustering_coefficient_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.clustering_coefficient(_sparse_edges(spark, sf_dir))


@register(
    "graph_pagerank",
    oracle=GI.pagerank_oracle(EDGES_ORACLE_CTE, iters=5, damping=0.85),
    description="iterative: 5-iteration PageRank, DECIMAL reduction for order-independent "
    "cross-engine-exact sums; oracle = unrolled CTE chain",
)
def graph_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.pagerank(derived_edges(spark, sf_dir), iters=5, damping=0.85)


@register(
    "graph_components_twostar",
    oracle=GI.connected_components_oracle(_SPARSE_CTE),
    description="iterative: connected components via large-star/small-star contraction "
    "(Kiveris et al. SoCC'14) — O(log n) rounds vs O(diameter); same oracle as "
    "graph_components, same result by construction",
)
def graph_components_twostar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.connected_components_twostar(_sparse_edges(spark, sf_dir))


@register(
    "ex_three_hop_count",
    oracle=f"""{_E},
outd AS (SELECT src AS id, COUNT(*) AS o FROM edges GROUP BY src),
ind  AS (SELECT dst AS id, COUNT(*) AS i FROM edges GROUP BY dst)
SELECT CAST(COALESCE(SUM(ind.i * outd.o), 0) AS BIGINT) AS three_hop_count
FROM edges e JOIN ind ON e.src = ind.id JOIN outd ON e.dst = outd.id""",
    description="extension: exact 3-hop walk count — the EX degree-product rewrite "
    "generalized (decompose by middle edge); O(|E|) state, no path cube",
)
def ex_three_hop_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.three_hop_count_exact(derived_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# Incremental view maintenance over the degree aggregate

from twitter_followers_patterns_mapreduce_spark.operators import cdc as CDC  # noqa: E402

#: deterministic base/delta partition of the edge set (≈1/5 arrives "late")
_DELTA_PRED = "(src * 7 + dst) % 5 = 0"


@register(
    "degrees_incremental",
    oracle=f"""{_E},
tagged AS (
  SELECT src AS id, 1 AS out_deg, 0 AS in_deg FROM edges
  UNION ALL
  SELECT dst AS id, 0 AS out_deg, 1 AS in_deg FROM edges)
SELECT id, CAST(SUM(out_deg) AS BIGINT) AS out_deg, CAST(SUM(in_deg) AS BIGINT) AS in_deg
FROM tagged GROUP BY id""",
    description="incremental view maintenance: degree aggregate updated from a delta "
    "edge batch alone (aggregate-merge full-outer join) — oracle is the full recompute, "
    "proving delta-merge == rescan",
)
def degrees_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    base = e.where(~F.expr(_DELTA_PRED))
    delta = e.where(F.expr(_DELTA_PRED))
    return CDC.degrees_incremental(base, delta)


@register(
    "follow_recommendations",
    oracle=f"""{_E},
e AS (SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}),
cand AS (
  SELECT a.src AS u, b.dst AS v, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM e a JOIN e b ON a.dst = b.src AND a.src <> b.dst
  GROUP BY a.src, b.dst),
fresh AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = c.u AND e.dst = c.v)),
ranked AS (
  SELECT u, CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY n_common DESC, v ASC) AS INT) AS rec_rank,
         v, n_common
  FROM fresh)
SELECT u, rec_rank, v, n_common FROM ranked WHERE rec_rank <= 5""",
    description="extension: people-you-may-know — per-user top-5 candidates by "
    "common-intermediate count (AP self-join → (u,v) hash agg → anti-join "
    "already-followed → partitioned-window top-k)",
)
def follow_recommendations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.follow_recommendations(derived_edges(spark, sf_dir), MAX_PATHS, k=5)


@register(
    "degree_distribution",
    oracle=f"""{_E},
tagged AS (
  SELECT src AS id, 1 AS out_deg, 0 AS in_deg FROM edges
  UNION ALL SELECT dst, 0, 1 FROM edges),
deg AS (SELECT id, SUM(out_deg) + SUM(in_deg) AS total_deg FROM tagged GROUP BY id)
SELECT CAST(total_deg AS BIGINT) AS total_deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY total_deg""",
    description="extension: degree histogram (n_nodes per total degree) — the "
    "power-law skew profile behind the reference's MAX guardrail; two chained "
    "hash aggregates, both map-side partial",
)
def degree_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.degree_distribution(derived_edges(spark, sf_dir))


@register(
    "reciprocity_summary",
    oracle=f"""{_E},
e AS (SELECT * FROM edges WHERE src <> dst)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocated,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src)
                THEN 1 ELSE 0 END) AS BIGINT) / CAST(COUNT(*) AS BIGINT) AS reciprocity_rate
FROM e""",
    description="extension: one-row reciprocity profile (reciprocated-edge count "
    "and rate) via a 1:1 reversed-edge probe join + global aggregate",
)
def reciprocity_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.reciprocity_summary(derived_edges(spark, sf_dir))


@register(
    "audience_overlap_pairs",
    oracle=f"""{_E},
e AS (SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}),
shared AS (
  SELECT x.dst AS a, y.dst AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM e x JOIN e y ON x.src = y.src AND x.dst < y.dst
  GROUP BY x.dst, y.dst),
aud AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS n_aud FROM e GROUP BY dst)
SELECT a, b, n_shared,
       n_shared / (aa.n_aud + ab.n_aud - n_shared) AS jaccard
FROM shared JOIN aud aa ON shared.a = aa.id JOIN aud ab ON shared.b = ab.id
ORDER BY jaccard DESC, a ASC, b ASC LIMIT 20""",
    description="extension: top-20 followee pairs by follower-set Jaccard "
    "(co-follow inverted-index self-join → (a,b) hash agg → broadcast audience "
    "sizes → TakeOrdered top-k)",
)
def audience_overlap_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.audience_overlap_pairs(derived_edges(spark, sf_dir), MAX_PATHS, k=20)


@register(
    "two_hop_reach",
    oracle=f"""{_E},
e AS (SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS})
SELECT a.src AS u, CAST(COUNT(DISTINCT b.dst) AS BIGINT) AS reach
FROM e a JOIN e b ON a.dst = b.src AND a.src <> b.dst
GROUP BY a.src ORDER BY reach DESC, u ASC LIMIT 20""",
    description="extension: top-20 users by distinct 2-hop reach — the AP path join "
    "into a two-level distinct aggregate (map-side (u,y) dedup), TakeOrdered top-k",
)
def two_hop_reach_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.two_hop_reach(derived_edges(spark, sf_dir), MAX_PATHS, k=20)


@register(
    "degree_assortativity",
    oracle=f"""{_E},
tagged AS (
  SELECT src AS id, 1 AS out_deg, 0 AS in_deg FROM edges
  UNION ALL SELECT dst, 0, 1 FROM edges),
deg AS (SELECT id, CAST(SUM(out_deg) AS BIGINT) AS out_deg, CAST(SUM(in_deg) AS BIGINT) AS in_deg
        FROM tagged GROUP BY id),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx.out_deg) AS BIGINT) AS sx,
         CAST(SUM(dy.in_deg) AS BIGINT) AS sy,
         CAST(SUM(dx.out_deg * dy.in_deg) AS BIGINT) AS sxy,
         CAST(SUM(dx.out_deg * dx.out_deg) AS BIGINT) AS sxx,
         CAST(SUM(dy.in_deg * dy.in_deg) AS BIGINT) AS syy
  FROM edges e JOIN deg dx ON e.src = dx.id JOIN deg dy ON e.dst = dy.id)
SELECT n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN (n * sxy - sx * sy) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
       END AS assortativity
FROM s""",
    description="extension: out→in degree assortativity (Pearson over edges) — "
    "all correlation terms exact BIGINT sums, one closed-form double at the end",
)
def degree_assortativity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.degree_assortativity(derived_edges(spark, sf_dir))


#: BFS source: smallest node id in the derived view (deterministic)
_BFS_SOURCE = 0


@register(
    "graph_bfs_distances",
    oracle=GI.bfs_distances_oracle(EDGES_ORACLE_CTE, source=_BFS_SOURCE),
    description="iterative: directed single-source BFS hop distances — frontier "
    "equi-join + distinct + anti-join settle per pass, O(diameter) passes; "
    "oracle = bounded recursive closure",
)
def graph_bfs_distances_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.bfs_distances(derived_edges(spark, sf_dir), source=_BFS_SOURCE)


#: the truss runs on the MAX_PATHS-filtered graph (dense enough for real
#: triangle structure — the sparse CC graph 4-trusses to ~3 edges, a
#: vacuous check) with k=4 so the support threshold (k-2=2) actually
#: prunes; 3 rounds reach the fixed point at sf0.01 (FIXTURES.md §1.5).
_TRUSS_CTE = f"{_E} SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}"


@register(
    "graph_ktruss",
    oracle=GI.k_truss_oracle(_TRUSS_CTE, k=4, rounds=3),
    description="iterative: 4-truss via synchronous edge peeling — each round is the "
    "triangle-support join pipeline (wedge equi-join + semi-join closure) over the "
    "shrinking edge set; oracle = same peeling unrolled",
)
def graph_ktruss_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] < MAX_PATHS) & (e["dst"] < MAX_PATHS))
    return GI.k_truss(e, k=4, rounds=3)


@register(
    "graph_ktruss_k5",
    oracle=GI.k_truss_oracle(_TRUSS_CTE, k=5, rounds=3),
    description="5-truss at a second k (support >= 3) — pins the edge-peeling "
    "loop's k-generality under the driver's gate",
)
def graph_ktruss_k5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] < MAX_PATHS) & (e["dst"] < MAX_PATHS))
    return GI.k_truss(e, k=5, rounds=3)


@register(
    "graph_landmark_closeness",
    oracle=GI.landmark_closeness_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}",
        mod=20,
        max_depth=4,
    ),
    description="landmark closeness: multi-source BFS keyed by (landmark, node) — all "
    "sources share each frontier pass; bounded horizon, integer-exact LCM closeness",
)
def graph_landmark_closeness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] < MAX_PATHS) & (e["dst"] < MAX_PATHS))
    return GI.landmark_closeness(e, mod=20, max_depth=4)


@register(
    "triangle_count_oriented",
    oracle=G.triangle_count_oriented_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_TRI} AND dst < {MAX_TRI}"
    ),
    description="undirected triangles by degree-ordered orientation — each triangle "
    "counted exactly once from its lowest-(deg,id) vertex; oriented out-degree is "
    "O(sqrt(|E|))-bounded, capping wedge fan-out on power-law hubs",
)
def triangle_count_oriented_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_count_oriented(derived_edges(spark, sf_dir), MAX_TRI)


@register(
    "triangle_census_directed",
    oracle=G.triangle_census_directed_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}"
    ),
    description="directed triangle motif census: cyclic (a->b->c->a feedback loops, "
    "counted once per cycle via /3) vs transitive (a->b, b->c, a->c hierarchy "
    "instances) — the direction-aware refinement of the reference's closure count; "
    "one MAX-bounded 2-path join feeds both closure probes (MAX=200, the "
    "materialized-path cutoff: the raw directed wedge volume on the densifying "
    "mod-997 view is the AP/RS regime, and the census pays it twice)",
)
def triangle_census_directed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_census_directed(derived_edges(spark, sf_dir), MAX_PATHS)


@register(
    "graph_triangle_ivm",
    oracle=G.triangle_count_ivm_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}",
        delta_mod=4,
    ),
    description="incremental raw-triangle maintenance under edge inserts (graph "
    "IVM): deterministic hash split into base (3/4) + delta (1/4), the delta "
    "contribution counted by rotation symmetry + inclusion-exclusion over closure "
    "positions (3*|DUU| - 3*|DDU| + |DDD|) with every term STARTING from a delta "
    "edge (|D|*deg-driven joins, base never recounted); the exact total recount is "
    "the gate companion pinning base + added == total",
)
def graph_triangle_ivm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_count_ivm(derived_edges(spark, sf_dir), MAX_PATHS, delta_mod=4)


def _stage_edge_batches(spark: SparkSession, sf_dir: str, n_batches: int = 4):
    """Stage the MAX_PATHS-filtered edge view as ``n_batches`` parquet
    files split by a deterministic content hash — edge-set union is
    order-free (the final state is a set), so like the mixture stager
    no mtime-ordered replay semantics are needed; files still get
    ascending mtimes for a deterministic drain.  Batches share ~1/16
    of their edges (the second hash term) so the cross-batch duplicate
    path is exercised at every SF.  State/checkpoint wiped per
    invocation for a fresh replay."""
    import glob as _glob
    import hashlib
    import os
    import shutil
    import tempfile
    import time as _time

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"spark_tristream_{tag}")
    feed_dir = os.path.join(root, "feed")
    state_dir = os.path.join(root, "state")
    ckpt_dir = os.path.join(root, "ckpt")
    for d in (state_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    if not os.path.exists(feed_dir):
        os.makedirs(feed_dir)
        e = derived_edges(spark, sf_dir).where(
            (F.col("src") < MAX_PATHS) & (F.col("dst") < MAX_PATHS)
        )
        now = _time.time()
        for b in range(n_batches):
            tmp = os.path.join(root, f"stage_b{b}")
            # primary split by edge hash; every 16th edge ALSO lands in
            # the next batch — a deliberate duplicate re-arrival
            h = F.pmod(F.xxhash64(F.col("src"), F.col("dst")), F.lit(n_batches))
            dup = F.pmod(F.xxhash64(F.col("dst"), F.col("src")), F.lit(16))
            e.where(
                (h == b)
                | ((dup == 0) & (F.pmod(h + 1, F.lit(n_batches)) == b))
            ).coalesce(1).write.mode("overwrite").parquet(tmp)
            (part,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
            dst = os.path.join(feed_dir, f"b{b}.parquet")
            os.rename(part, dst)
            os.utime(dst, (now + b, now + b))
            shutil.rmtree(tmp)
    return feed_dir, state_dir, ckpt_dir


@register(
    "graph_triangle_ivm_streamed",
    oracle=f"""{_E},
u AS (SELECT DISTINCT src, dst FROM edges
      WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS} AND src <> dst),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_raw
          FROM u e1 JOIN u e2 ON e1.dst = e2.src AND e1.src <> e2.dst
          JOIN u e3 ON e3.src = e2.dst AND e3.dst = e1.src),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM u)
SELECT total.t_raw, ne.n_edges, TRUE AS consistent FROM total, ne""",
    description="streamed incremental triangle maintenance (nineteenth streaming "
    "class): edge arrivals drain as 4 micro-batches (with deliberate cross-batch "
    "duplicate re-arrivals) into versioned two-table state — the accumulated "
    "DISTINCT edge set plus a 1-row maintained closure count folded per batch by "
    "the graph_triangle_ivm delta algebra (3|DUU| - 3|DDU| + |DDD|, every term "
    "starting from the anti-joined genuinely-new delta); edge-set union is "
    "commutative and each step exact, so the drained count equals the one-shot "
    "closure count under any chunking and the oracle is the full-recompute SQL, "
    "with the exact recount emitted as the consistent gate companion",
)
def graph_triangle_ivm_streamed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_followers_patterns_mapreduce_spark.streaming.triangles import (
        edges_tri_stream,
        triangle_view_from_state,
        triangles_apply_stream,
    )

    feed_dir, state_dir, ckpt_dir = _stage_edge_batches(spark, sf_dir)
    triangles_apply_stream(
        spark, edges_tri_stream(spark, feed_dir), state_dir, ckpt_dir
    )
    return triangle_view_from_state(spark, state_dir)


@register(
    "triangle_census_sampled",
    oracle=G.triangle_census_sampled_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_TRI} AND dst < {MAX_TRI}", p=4
    ),
    description="DOULION-sampled directed motif census — the registered scale path "
    "past triangle_census_directed's MAX=200 cutoff: deterministic 1/4 edge sample "
    "(content hash, never rand()), exact census pipeline on the sample (wedge volume "
    "~p^2 cheaper), cyclic AND transitive counts scaled p^3; runs at MAX=500 where "
    "the exact census's wedge join measured 8.6x its MAX=200 cost",
)
def triangle_census_sampled_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_census_sampled(derived_edges(spark, sf_dir), MAX_TRI, p=4)


@register(
    "triangle_count_sampled",
    oracle=G.triangle_count_sampled_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_TRI} AND dst < {MAX_TRI}", p=4
    ),
    description="DOULION sampled triangle estimate: deterministic 1/4 edge sample "
    "(content hash, never rand()), reference pipeline on the sample, p^3 scale-up — "
    "the sampling upgrade of the reference's MAX-cutoff approximation",
)
def triangle_count_sampled_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_count_sampled(derived_edges(spark, sf_dir), MAX_TRI, p=4)


@register(
    "graph_pagerank_personalized",
    oracle=GI.pagerank_personalized_oracle(_SPARSE_CTE, mod=20, iters=4),
    description="personalized PageRank: teleport mass restricted to the landmark "
    "source set (random-walk-with-restart relevance, vs global importance) — same "
    "decimal-exact per-pass pipeline as graph_pagerank",
)
def graph_pagerank_personalized_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.pagerank_personalized(_sparse_edges(spark, sf_dir), mod=20, iters=4)


@register(
    "link_prediction_scores",
    oracle=G.link_prediction_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}", k=200
    ),
    description="link prediction over non-adjacent pairs: common neighbors, Jaccard, "
    "Adamic-Adar from wedge enumeration (never all-pairs), integer-keyed top-k",
)
def link_prediction_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    return G.link_prediction_scores(e, MAX_PATHS, k=200)


@register(
    "graph_negative_samples",
    oracle=G.negative_samples_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}",
        k=5,
        n_slots=12,
    ),
    description="deterministic negative sampling for link-prediction training: each "
    "node draws 5 reproducible non-neighbors via node_index[h64(u:slot) % |V|] — "
    "|V|*slots hash candidates equi-joined to the node index (never a |V|^2 cross), "
    "positives removed both directions by anti-join; replays bit-identically where "
    "rand() negatives resample every epoch",
)
def graph_negative_samples_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.negative_samples(derived_edges(spark, sf_dir), MAX_PATHS, k=5, n_slots=12)


@register(
    "graph_label_propagation",
    oracle=GI.label_propagation_oracle(_SPARSE_CTE, rounds=4),
    description="synchronous label-propagation communities: 4 deterministic rounds, "
    "per-node argmax as one max_by hash agg (no window sort), smallest-label ties",
)
def graph_label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.label_propagation(_sparse_edges(spark, sf_dir), rounds=4)


@register(
    "graph_hits",
    oracle=GI.hits_oracle(_SPARSE_CTE, iters=3),
    description="HITS hubs/authorities: 3 integer-exact unnormalized rounds on the "
    "directed follow graph — two direction-alternating join+reagg shuffles per round",
)
def graph_hits_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.hits(_sparse_edges(spark, sf_dir), iters=3)


@register(
    "graph_random_walks",
    oracle=GI.random_walks_oracle(_SPARSE_CTE, walks_per_node=2, length=3),
    description="deterministic DeepWalk corpus: 2 walks/node, 3 steps, next hop = "
    "h64(start:walk:step) %% out_deg over a pre-aggregated sorted neighbor array — "
    "1:1 frontier joins, no per-step fan-out, rerun/retry/oracle identical",
)
def graph_random_walks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.random_walks(_sparse_edges(spark, sf_dir), walks_per_node=2, length=3)


# mod-29 density (vs the iterative ops' mod-53): mutual cycles at radius 3
# are rare — mod 53 yields ZERO pairs at sf0.001 (a vacuously-green oracle),
# mod 29 yields 1 / 84 / hundreds at sf0.001/0.01/0.1 with the node set
# still capped at 997, so the closure stays small at every scale.
MUTUAL_MOD = 29
_MUTUAL_CTE = f"SELECT * FROM ({EDGES_ORACLE_CTE}) e WHERE (src * 31 + dst) % {MUTUAL_MOD} = 0"


@register(
    "graph_mutual_reach_k3",
    oracle=GI.mutual_reach_pairs_oracle(_MUTUAL_CTE, k=3),
    description="pairs mutually reachable within 3 directed hops (bounded SCC "
    "relaxation): k-1 deduped frontier extensions, one left-semi swap self-join — "
    "closure tuples only, never materialized paths",
)
def graph_mutual_reach_k3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] * 31 + e["dst"]) % MUTUAL_MOD == 0)
    return GI.mutual_reach_pairs(e, k=3)


#: bipartite order×part projection: the two-mode companion of the
#: one-mode derived edge view (same lineitem scan, coprime moduli)
_BIP_CTE = ("SELECT DISTINCT CAST(l_orderkey % 997 AS BIGINT) AS o, "
            "CAST(l_partkey % 499 AS BIGINT) AS p FROM lineitem")


@register(
    "bipartite_butterfly_count",
    oracle=G.butterfly_count_oracle(_BIP_CTE, deg_cap=64),
    description="butterfly (2x2 biclique) count on the order x part bipartite graph: "
    "o-centered wedge self-join -> (p1,p2) multiplicities -> integer C(c,2) fold; "
    "deg_cap=64 bounds hub fan-out (the reference's MAX-filter lever, bipartite form)",
)
def bipartite_butterfly_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    e = li.selectExpr(
        "CAST(l_orderkey % 997 AS BIGINT) AS o",
        "CAST(l_partkey % 499 AS BIGINT) AS p",
    ).distinct()
    return G.butterfly_count(e, deg_cap=64)


from twitter_followers_patterns_mapreduce_spark.operators import patterns as PT  # noqa: E402

#: motif queries run on the MAX-capped edge view (the reference's own
#: fan-out lever); 80 keeps the 2-path half-relations small at sf0.1+
PATTERN_CAP = 80


def _pattern_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    return e.where((e["src"] < PATTERN_CAP) & (e["dst"] < PATTERN_CAP))


@register(
    "graph_square_count",
    oracle=PT.square_count_oracle(
        f"SELECT * FROM ({EDGES_ORACLE_CTE}) e WHERE src < {PATTERN_CAP} AND dst < {PATTERN_CAP}"
    ),
    description="directed 4-cycles counted once (min-vertex anchor): BUSHY compile — "
    "two 2-path half-relations joined on both endpoints, never a 3-path intermediate "
    "(the next motif up from the reference's triangle job)",
)
def graph_square_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PT.square_count(_pattern_edges(spark, sf_dir))


@register(
    "graph_diamond_count",
    oracle=PT.diamond_count_oracle(
        f"SELECT * FROM ({EDGES_ORACLE_CTE}) e WHERE src < {PATTERN_CAP} AND dst < {PATTERN_CAP}"
    ),
    description="feed-forward diamonds (a->b, a->c, b->d, c->d) via the generic "
    "SPARQL-style BGP matcher: greedy left-deep variable-binding joins over one "
    "deduped edge scan — the reference's fixed patterns as a query language",
)
def graph_diamond_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PT.diamond_count(_pattern_edges(spark, sf_dir))


#: SCC runs on the MAX_TRI-filtered subgraph: the closure oracle is
#: O(V^2) pairs, and 500 nodes keeps it ~1.5s at sf0.01 / ~10s at sf0.1
#: while the sf0.001 slice still has real structure (200-node giant SCC
#: + 300 trimmed singletons — the same cutoff discipline as _TRUSS_CTE).
_SCC_CTE = f"SELECT * FROM ({EDGES_ORACLE_CTE}) e WHERE src < {MAX_TRI} AND dst < {MAX_TRI}"


def _scc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    return e.where((e["src"] < MAX_TRI) & (e["dst"] < MAX_TRI))


@register(
    "graph_scc",
    oracle=GI.strongly_connected_components_oracle(_SCC_CTE),
    description="iterative: strongly connected components by trim + FW/BW hash-min "
    "peeling — trim clears acyclic periphery (no-in/no-out anti-joins), then fmin/bmin "
    "label propagation settles every component whose minimum is its own closure min; "
    "oracle = transitive closure + mutual-reach argmin",
)
def graph_scc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.strongly_connected_components(_scc_edges(spark, sf_dir))


@register(
    "graph_scc_condensation",
    oracle=GI.scc_condensation_oracle(_SCC_CTE),
    description="condensation-DAG edge list: contract each SCC to one node, emit "
    "distinct cross-component edges — two O(|V|) map joins + distinct on top of "
    "graph_scc's assignment",
)
def graph_scc_condensation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _scc_edges(spark, sf_dir)
    return GI.scc_condensation_edges(e, GI.strongly_connected_components(e))


@register(
    "graph_reach_profile",
    oracle=GI.reach_profile_oracle(_MUTUAL_CTE, kmax=3),
    description="exact neighborhood function N(1..3): ordered pairs within k "
    "directed hops + average out-reach — closure TUPLES only per hop (join + "
    "distinct, state <= V^2, never path fan-out); the exact small-k companion "
    "of sketch-based ANF",
)
def graph_reach_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] * 31 + e["dst"]) % MUTUAL_MOD == 0)
    return GI.reach_profile(e, kmax=3)


@register(
    "graph_effective_diameter",
    oracle=GI.effective_diameter_oracle(_MUTUAL_CTE, kmax=3, q=0.9),
    description="effective diameter (ANF's headline readout): smallest k whose "
    "pair count reaches 90% of N(kmax), linearly interpolated — integer-exact "
    "threshold (n_pairs*1e6 >= qi*n_total), one closed-form double over exact "
    "counts; at 100 TB the same readout runs over graph_reach_anf's HLL estimates",
)
def graph_effective_diameter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] * 31 + e["dst"]) % MUTUAL_MOD == 0)
    return GI.effective_diameter(e, kmax=3, q=0.9)


@register(
    "graph_reach_anf",
    oracle=GI.reach_anf_checked_oracle(_MUTUAL_CTE, kmax=3),
    description="HyperANF (Boldi-Vigna) sketch neighborhood function vs the exact "
    "closure: per-node HyperLogLog reach sketches advanced one hop per pass "
    "(O(|V|) fixed-size state, one join + hll_union_agg per hop — the 100 TB "
    "reach path where the exact V^2-state closure cannot go); oracle asserts "
    "the 5%-error boolean against the exact k<=3 companion",
)
def graph_reach_anf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] * 31 + e["dst"]) % MUTUAL_MOD == 0)
    return GI.reach_anf_checked(e, kmax=3)


@register(
    "graph_effective_diameter_anf",
    oracle=GI.effective_diameter_anf_oracle(_MUTUAL_CTE, kmax=3, q=0.9),
    description="effective diameter read from the HyperANF HLL profile — the "
    "readout that actually runs at 100 TB, where the exact closure cannot; "
    "exposed columns are the exact readout, the sketch-derived diameter feeds "
    "an oracle-asserted 5%-agreement boolean (reach_anf_checked discipline)",
)
def graph_effective_diameter_anf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] * 31 + e["dst"]) % MUTUAL_MOD == 0)
    return GI.effective_diameter_anf(e, kmax=3, q=0.9)


@register(
    "graph_modularity",
    oracle=GI.modularity_oracle(_SPARSE_CTE, rounds=4),
    description="Newman modularity Q of the 4-round LPA communities — exact integer "
    "e_c/d_c/m counts, one pointwise double per community floored to 1e-9 BIGINTs, "
    "order-independent sum; label map joins map-side onto both edge endpoints",
)
def graph_modularity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _sparse_edges(spark, sf_dir)
    return GI.modularity(e, GI.label_propagation(e, rounds=4))


@register(
    "graph_sssp_weighted",
    oracle=GI.sssp_weighted_oracle(EDGES_ORACLE_CTE, source=_BFS_SOURCE, max_hops=6),
    description="iterative: bounded-hop Bellman-Ford weighted shortest paths — "
    "per pass one frontier equi-join + MIN hash-agg, re-relaxation replaces BFS's "
    "settle-once (invalid under weights); deterministic endpoint-derived weights; "
    "oracle = hop-bounded recursive walk",
)
def graph_sssp_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.sssp_weighted(derived_edges(spark, sf_dir), source=_BFS_SOURCE, max_hops=6)


@register(
    "graph_hub_attack",
    oracle=GI.hub_attack_tolerance_oracle(_SPARSE_CTE, top_k=5),
    description="targeted-attack robustness (Albert-Barabási): remove the 5 "
    "highest-degree hubs, re-run components, count fragmentation + stranded "
    "singletons — two label-propagation runs + deterministic hub TakeOrdered",
)
def graph_hub_attack_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GI.hub_attack_tolerance(_sparse_edges(spark, sf_dir), top_k=5)


@register(
    "graph_betweenness_landmark",
    oracle=GI.betweenness_landmark_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}",
        mod=20,
        max_depth=3,
    ),
    description="landmark-sampled Brandes betweenness: multi-source BFS carrying "
    "shortest-path counts (the landmark_closeness state shape + a SUM(sigma) agg "
    "per pass), then the backward dependency accumulation depth-by-depth as "
    "settled-edges-settled equi-joins — delta terms on the 1e-6 integer grid so "
    "per-node sums are exact BIGINTs (a double SUM would be shuffle-order "
    "dependent); bounded horizon, deterministic mod-20 sources, oracle unrolls "
    "both directions",
)
def graph_betweenness_landmark_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = derived_edges(spark, sf_dir)
    e = e.where((e["src"] < MAX_PATHS) & (e["dst"] < MAX_PATHS))
    return GI.betweenness_landmark(e, mod=20, max_depth=3)


@register(
    "graph_triangle_ivm_deletes",
    oracle=G.triangle_count_ivm_deletes_oracle(
        f"{_E} SELECT * FROM edges WHERE src < {MAX_PATHS} AND dst < {MAX_PATHS}",
        delete_mod=4,
    ),
    description="incremental raw-triangle maintenance under edge DELETIONS — the "
    "hard IVM direction (inserts never invalidate standing results; deletes do): "
    "a deterministic hash split purges 1/4 of the edge set and the standing count "
    "drops by the closures the purged edges participated in, counted against the "
    "PRE-deletion graph by the same 3|DUU| - 3|DDU| + |DDD| inclusion-exclusion "
    "with every term starting from a deleted edge; the exact post-deletion recount "
    "is the gate companion pinning before - lost == after",
)
def graph_triangle_ivm_deletes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.triangle_count_ivm_deletes(
        derived_edges(spark, sf_dir), MAX_PATHS, delete_mod=4
    )
