"""Local transaction-log shim with Delta's optimistic-commit semantics.

``format="delta"`` needs three storage operations (see ``delta.py``):
read the table, detect table existence, and commit an append batch with
serializable conflict detection. When the real delta-spark package is
absent, this module provides those three over a plain local filesystem
using the same protocol shape Delta's ``_delta_log`` uses:

- The table is ``{path}/_shim_log/{version:020d}.json`` commit files,
  each listing the data files that commit added (``{path}/data/*``).
- A commit is **atomic and serializable**: the writer reads the current
  snapshot version ``v``, validates its batch against that snapshot,
  writes its data file, then publishes ``v+1`` with ``open(..., "x")``
  (O_EXCL). If another writer published ``v+1`` first, the create
  fails, the data file is removed, and the append reports "lost the
  optimistic race" — exactly the signal Delta's
  ``ConcurrentAppendException`` carries, and exactly what the marker
  protocol's ``_reserve`` returning None means. The loser refreshes its
  caches, re-runs the expected-revision CAS, and retries at the
  advanced tail (``store.py`` append loop).
- Insert-when-not-matched on ``position``: the batch is validated
  against the snapshot's position set; any overlap means a competitor
  already holds those positions and the append loses the race without
  committing.

Scope: a **single-filesystem miniature** for local runs and the
acceptance suite in ``tests/test_delta_log.py`` — it relies on POSIX
O_EXCL atomicity, so it is NOT for object stores or NFS; a cluster
deployment installs delta-spark and gets the identical semantics from
Delta's transaction log (the dispatch in ``delta.py`` prefers the real
backend whenever importable).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid as uuidlib
from typing import TYPE_CHECKING
from eventstorm_spark.localframe import local_frame

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

LOG_DIR = "_shim_log"
DATA_DIR = "data"


def _log_dir(path: str) -> str:
    return os.path.join(path, LOG_DIR)


def _version_file(path: str, v: int) -> str:
    return os.path.join(_log_dir(path), f"{v:020d}.json")


def is_shim_table(path: str) -> bool:
    d = _log_dir(path)
    return os.path.isdir(d) and bool(glob.glob(os.path.join(d, "*.json")))


def _snapshot(path: str) -> tuple[int, list[str]]:
    """(current version, data files) — version 0 = empty table. Commit
    files are read in version order; a torn reader is impossible
    because each version file is published whole via O_EXCL create."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return 0, []
    files: list[str] = []
    versions = sorted(
        int(os.path.basename(f)[:-5]) for f in glob.glob(os.path.join(d, "*.json")))
    for v in versions:
        with open(_version_file(path, v)) as fh:
            files.extend(os.path.join(path, rel) for rel in json.load(fh)["add"])
    return (versions[-1] if versions else 0), files


def read_log(spark: "SparkSession", path: str) -> "DataFrame":
    """The shim-backed envelope table (empty-safe)."""
    from eventstorm_spark.model import EVENT_SCHEMA

    _, files = _snapshot(path)
    if not files:
        return local_frame(spark, [], EVENT_SCHEMA)
    return spark.read.schema(EVENT_SCHEMA).parquet(*files)


def append_batch(spark: "SparkSession", path: str, batch: "DataFrame") -> bool:
    """Commit one append batch with serializable conflict detection.
    Returns False when the optimistic commit lost a race (position
    overlap in the observed snapshot, or the next version file was
    taken first) — the caller refreshes caches and retries, same
    contract as ``delta.append_batch``."""
    os.makedirs(_log_dir(path), exist_ok=True)
    os.makedirs(os.path.join(path, DATA_DIR), exist_ok=True)
    v, files = _snapshot(path)
    if files:
        # validate against the SAME snapshot whose version we will CAS
        # on (re-resolving could observe a newer commit and tear the
        # read-validate-publish triple)
        from eventstorm_spark.model import EVENT_SCHEMA

        existing = (spark.read.schema(EVENT_SCHEMA).parquet(*files)
                    .select("position"))
        taken = (batch.select("position")
                 .join(existing, "position", "left_semi").count())
        if taken:
            return False  # competitor holds (some of) our positions
    # stage the data file: Spark writes a directory; move the single
    # part file under a unique name so commits never collide on paths
    staging = os.path.join(path, DATA_DIR, f"_staging-{uuidlib.uuid4().hex}")
    batch.coalesce(1).write.parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    rel = os.path.join(DATA_DIR, f"part-{uuidlib.uuid4().hex}.parquet")
    os.replace(part, os.path.join(path, rel))
    shutil.rmtree(staging, ignore_errors=True)
    try:
        # O_EXCL publish: exactly one writer owns version v+1
        with open(_version_file(path, v + 1), "x") as fh:
            json.dump({"add": [rel]}, fh)
        return True
    except FileExistsError:
        os.remove(os.path.join(path, rel))
        return False
