"""PySpark-native analytics engine with the capability surface of the
reference retail ETL pipeline (yasserzs3/ETL-Pipeline-for-Retail-Sales-Data),
re-expressed Spark-first, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Design stance (see SURVEY.md §7):
- DataFrame API only; everything lazy until a sink/action.
- Typed end-to-end (the reference's stringly-typed transport is reproduced
  only as a "hostile input" cast layer, operators/cleaning.py).
- Catalyst + AQE do the planning; no hand-scheduling.
"""

__version__ = "0.1.0"

from .session import configure_session, get_spark  # noqa: F401
