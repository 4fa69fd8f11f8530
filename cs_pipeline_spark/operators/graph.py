"""Graph operators over a deterministic document link graph
(SURVEY §2.10 extension, north star).

Web-crawl curation is graph work: link-based quality signals
(PageRank-family centrality) and degree profiles are standard
features in crawl-corpus filtering. The corpus has no link column, so
a deterministic synthetic graph is derived from doc_ids (two out-links
per doc via fixed affine maps mod N) — the same synthesis on both
engines, like ``text_pii_scrub``'s synthesized PII.

Determinism: PageRank is computed in INTEGER arithmetic — ranks are
scaled by N·1e6 so the initial rank is exactly 1,000,000; each
iteration is ``150000 + (850000 · Σ (R(u) div outdeg(u))) div 1000000``
over int64. Integer sums are order-independent, so the result is
bit-identical on any engine/partitioning — no float dust from the
usual Σ contributions. (Σ R ≤ N·1e6·850000 ≈ 4·10^15 at sf0.1 —
inside int64, outside double-exact range, hence `div`, never `/`.)

Scale (100 TB): each iteration is one groupBy(dst) shuffle of
(dst, contribution) pairs after map-side combine, joined back to the
node list — the standard Pregel-as-SQL shape. Spark reuses the hash
partitioning of `dst` across iterations; the loop count is fixed (3),
so the lineage stays bounded without checkpointing. The degree profile
is a single map-side-combined aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import load

_ITERS = 3
# two out-links per doc: affine maps mod N; non-coprime multipliers (4, 10) make the
# maps lossy, so the graph has real orphans (in-deg 0) and hubs
_EDGE_SQL = """
  SELECT doc_id AS src, (doc_id * 4 + 3) % {n} AS dst FROM documents
  UNION
  SELECT doc_id, (doc_id * 10 + 5) % {n} FROM documents
"""


def _edges(docs: DataFrame, n_docs: int) -> DataFrame:
    e1 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 4 + 3) % n_docs).alias("dst"),
    )
    e2 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 10 + 5) % n_docs).alias("dst"),
    )
    return e1.union(e2).distinct()


def _n_docs(spark: SparkSession, sf_dir: str) -> int:
    # metadata-scale count used as a literal in the edge synthesis —
    # parquet footer read, not a data scan
    return load(spark, "documents", sf_dir).count()


def _pagerank_oracle() -> str:
    """Unrolled integer-PageRank CTE chain (DuckDB side)."""
    n = "(SELECT COUNT(*) FROM documents)"
    parts = [
        f"WITH edges AS ({_EDGE_SQL.format(n=n)}), ",
        "outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src), ",
        "r0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS r "
        "FROM documents)",
    ]
    for t in range(_ITERS):
        parts.append(
            f", s{t} AS ("
            f"SELECT e.dst AS node, SUM(r{t}.r // o.d) AS contrib "
            f"FROM edges e JOIN r{t} ON r{t}.node = e.src "
            "JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        parts.append(
            f", r{t + 1} AS ("
            f"SELECT r{t}.node, CAST(150000 + "
            f"(850000 * COALESCE(s{t}.contrib, 0)) // 1000000 AS BIGINT) AS r "
            f"FROM r{t} LEFT JOIN s{t} ON s{t}.node = r{t}.node)"
        )
    parts.append(
        f" SELECT node AS doc_id, r AS rank_scaled FROM r{_ITERS}"
    )
    return "".join(parts)


@register(
    "graph_pagerank",
    _pagerank_oracle(),
    doc=f"integer-exact PageRank ({_ITERS} iterations, damping 0.85) "
    "over the synthetic doc link graph — Pregel-as-SQL, one "
    "map-side-combined shuffle per iteration, bit-stable ranks",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank with ranks scaled to integers (×N·1e6)
    so every operation — per-edge contribution (`div`), damped update —
    is exact int64 arithmetic; see module docstring for the recurrence.

    Dangling nodes simply contribute nothing (their mass is dropped,
    not redistributed) — fine for a ranking signal and far cheaper
    than the global dangling-mass broadcast at scale; with this edge
    synthesis every node has out-degree ≥ 1 anyway.
    """
    docs = load(spark, "documents", sf_dir)
    n = _n_docs(spark, sf_dir)
    edges = _edges(docs, n)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    esrc = edges.join(outdeg, "src")
    ranks = docs.select(
        F.col("doc_id").alias("node"), F.lit(1000000).cast("long").alias("r")
    )
    for _ in range(_ITERS):
        contrib = (
            esrc.join(ranks, esrc.src == ranks.node)
            .select("dst", F.expr("r div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            ranks.join(contrib, ranks.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(150000).cast("long")
                    + F.expr(
                        "(850000 * coalesce(contrib, 0L)) div 1000000"
                    )
                ).alias("r"),
            )
        )
    return ranks.select(
        F.col("node").alias("doc_id"), F.col("r").alias("rank_scaled")
    )


@register(
    "graph_degree_stats",
    f"""
    WITH edges AS ({_EDGE_SQL.format(n="(SELECT COUNT(*) FROM documents)")}),
    deg AS (
      SELECT n.doc_id,
             COALESCE(o.d, 0) AS out_deg, COALESCE(i.d, 0) AS in_deg
      FROM documents n
      LEFT JOIN (SELECT src, COUNT(*) AS d FROM edges GROUP BY src) o
        ON o.src = n.doc_id
      LEFT JOIN (SELECT dst, COUNT(*) AS d FROM edges GROUP BY dst) i
        ON i.dst = n.doc_id
    )
    SELECT CAST(in_deg AS BIGINT) AS in_deg,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(out_deg) AS BIGINT) AS sum_out
    FROM deg GROUP BY in_deg
    """,
    doc="in-degree histogram of the doc link graph (+ out-degree mass "
    "per class) — the hub/orphan profile a crawl-quality filter reads",
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree profile: nodes bucketed by in-degree, with the total
    out-degree mass per bucket. Orphans (in_deg 0) and hubs (high
    in_deg) are the interesting tails for crawl curation.

    Scale: two map-side-combined degree aggregations + broadcast-sized
    join back to the node list (degree tables are ≤ |nodes|), then a
    tiny histogram groupBy. Integer-only.
    """
    docs = load(spark, "documents", sf_dir)
    n = _n_docs(spark, sf_dir)
    edges = _edges(docs, n)
    o = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    i = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    deg = (
        docs.select("doc_id")
        .join(o, docs.doc_id == o.src, "left")
        .join(i, docs.doc_id == i.dst, "left")
        .select(
            F.coalesce("od", F.lit(0)).alias("out_deg"),
            F.coalesce("idg", F.lit(0)).alias("in_deg"),
        )
    )
    return deg.groupBy("in_deg").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("out_deg").cast("long").alias("sum_out"),
    )
