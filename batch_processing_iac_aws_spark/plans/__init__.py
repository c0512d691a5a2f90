"""Query registry: every implemented operator from SURVEY.md §2 registers a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a DuckDB
oracle twin with identical column names and value canonicalization."""

from __future__ import annotations

from .registry import ORACLES, QUERIES

# importing a module registers its queries
from . import reference  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import scalars  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import stream_windows  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES"]
