"""Declared query inventory (SURVEY.md §2.6).

Importing the submodules populates :data:`goose_spark.queries.base.REGISTRY`.
"""

from goose_spark.queries import (  # noqa: F401
    base,
    events_ext,
    jobs,
    relational,
    relational_ext,
    relational_more,
    sessions,
    tpch_extra,
    tpch_more,
    tpch_shapes,
)
from goose_spark.queries.base import REGISTRY, QuerySpec  # noqa: F401


def load_all() -> dict:
    """Import every query-providing module (incl. operator extensions)."""
    from goose_spark.operators import (  # noqa: F401
        bpe,
        clusters,
        containment,
        curation,
        dedup,
        heavyhitters,
        hybrid,
        knn,
        layout,
        linkage,
        mmr,
        multimodal,
        pipeline,
        pq,
        semdedup,
        similarity,
        sketches,
        sq,
        text,
    )

    return REGISTRY
