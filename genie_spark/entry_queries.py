"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

Populated operator by operator as SURVEY.md §2 coverage lands; each entry
here is the correctness gate for one implemented operator.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}
