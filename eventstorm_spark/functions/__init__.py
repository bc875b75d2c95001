"""Scalar function surface (SURVEY §2.7) — re-exported from scalars."""

from eventstorm_spark.functions.scalars import *  # noqa: F401,F403
from eventstorm_spark.functions.scalars import __all__ as _scalar_all  # noqa: F401
from eventstorm_spark.functions.sql_udfs import register_sql_functions  # noqa: F401

__all__ = list(_scalar_all) + ["register_sql_functions"]
