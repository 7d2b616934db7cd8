"""PySpark-native analytics engine.

A Spark-first rebuild of the query and data-processing surface of the
reference (WFSRBigData/systematic-review-classification — supplementary
materials for a systematic-review text-classification paper; see
/root/reference/README.md:1-6 and SURVEY.md §0 for provenance), plus
the LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) required for 100 TB scale.

Everything is declared through the DataFrame API so Catalyst handles
pushdown, pruning, join selection, and AQE; Python UDFs appear only
where built-ins genuinely cannot express the semantics (and are then
Arrow-vectorized pandas UDFs).
"""

from __future__ import annotations

from systematic_review_classification_spark.registry import all_oracles, all_queries
from systematic_review_classification_spark.session import get_session

__all__ = ["all_oracles", "all_queries", "get_session", "load_all"]

_LOADED = False

# Operator modules, each of which registers queries via the @query
# decorator at import time. Import is deferred so that importing the
# package (e.g. for session utilities) never pays operator-module cost.
_OPERATOR_MODULES = [
    "systematic_review_classification_spark.operators.scans",
    "systematic_review_classification_spark.operators.relational",
    "systematic_review_classification_spark.operators.joins",
    "systematic_review_classification_spark.operators.aggregates",
    "systematic_review_classification_spark.operators.windows",
    "systematic_review_classification_spark.functions.scalar",
    "systematic_review_classification_spark.operators.text",
    "systematic_review_classification_spark.operators.text_analysis",
    "systematic_review_classification_spark.operators.multimodal",
    "systematic_review_classification_spark.operators.ml",
    "systematic_review_classification_spark.operators.dedup",
    "systematic_review_classification_spark.operators.similarity",
    "systematic_review_classification_spark.operators.scale",
    "systematic_review_classification_spark.operators.workloads",
    "systematic_review_classification_spark.operators.analytics",
    "systematic_review_classification_spark.operators.reshape",
    "systematic_review_classification_spark.operators.warehouse",
    "systematic_review_classification_spark.operators.ir",
    "systematic_review_classification_spark.operators.runtime",
    "systematic_review_classification_spark.streaming.batch_twins",
    "systematic_review_classification_spark.streaming.stream_ops",
    "systematic_review_classification_spark.functions.udfs",
]


def load_all() -> None:
    """Import every operator module so the registry is fully populated."""
    global _LOADED
    if _LOADED:
        return
    import importlib

    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Modules land milestone by milestone; only swallow a missing
            # engine module, never a real import error inside one.
            if not exc.name.startswith("systematic_review_classification_spark"):
                raise
    _LOADED = True
