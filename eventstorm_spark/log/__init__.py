from eventstorm_spark.log.store import EventLog
from eventstorm_spark.log.normalize import normalize_events
from eventstorm_spark.log.plan import compile_read
from eventstorm_spark.log.filters import filter_column, build_prefix_regex

__all__ = ["EventLog", "normalize_events", "compile_read", "filter_column", "build_prefix_regex"]
