"""Scalar function surface (SURVEY §2.7) — re-exported from scalars."""

from eventstorm_spark.functions.scalars import *  # noqa: F401,F403
from eventstorm_spark.functions.scalars import __all__  # noqa: F401
