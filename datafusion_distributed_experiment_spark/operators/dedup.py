"""Placeholder — implemented in this round, see operators/__init__.py."""
from __future__ import annotations
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {}


def oracles() -> dict[str, str]:
    return {}
