"""Executed coverage for ``log/delta.py``'s REAL-Delta branch — the
code that runs when delta-spark is importable.

This container has no network and no Delta JVM jars (verified round
15: pip cannot reach an index, no delta jar under pyspark/jars), so
the branch cannot be driven against real Delta here. These tests
execute its Python-side control flow instead — backend dispatch,
first-commit vs MERGE, conflict-classification -> lost-race signal,
the uuid placement backstop, reader option plumbing, and the
version-clock listing — against a scripted double of the delta-spark
and DataFrame surfaces (pure Python; no SparkSession, because a real
session without the jars fails at ``format("delta")`` resolution,
which is exactly the part the double stands in for).

What this does NOT prove: Delta's JVM-side transaction-log semantics
(serializable conflict detection, atomic commit visibility). Those
are delta-spark's own published contract; the engine's reliance on
them is documented in ``delta.py``'s module docstring, and the
r14 cross-process fixes (bc64c0e) were reasoned against that
contract. The shim backend (``deltashim.py``) carries the executed
end-to-end evidence (tests/test_delta_log.py + the
``delta_log_lifecycle`` driver query)."""

from __future__ import annotations

import pytest

from eventstorm_spark.log import delta as dmod


class FakeWriter:
    def __init__(self, sink):
        self.sink = sink

    def format(self, fmt):
        self.sink["format"] = fmt
        return self

    def mode(self, m):
        self.sink["mode"] = m
        return self

    def save(self, path):
        self.sink["saved_to"] = path
        exc = self.sink.get("raise_on_save")
        if exc is not None:
            raise exc


class FakeBatch:
    """Stands in for the append batch DataFrame."""

    def __init__(self, uuids, raise_on_save=None):
        self.uuids = uuids
        self.write_calls = {"raise_on_save": raise_on_save}
        self.write = FakeWriter(self.write_calls)

    def alias(self, _name):
        return self

    def select(self, col):
        assert col == "uuid"
        return self

    def collect(self):
        return [{"uuid": u} for u in self.uuids]


class FakeMerge:
    def __init__(self, raise_on_execute=None):
        self.raise_on_execute = raise_on_execute
        self.executed = False

    def merge(self, _src, cond):
        assert "t.position = s.position" == cond
        return self

    def whenNotMatchedInsertAll(self):
        return self

    def execute(self):
        self.executed = True
        if self.raise_on_execute is not None:
            raise self.raise_on_execute


class FakeDeltaTable:
    """Class double for delta.tables.DeltaTable."""

    is_table = True
    merge_obj = None

    @classmethod
    def isDeltaTable(cls, _spark, _path):
        return cls.is_table

    @classmethod
    def forPath(cls, _spark, _path):
        class _Tgt:
            @staticmethod
            def alias(_n):
                return cls.merge_obj

        return _Tgt()


class FakeCol:
    def __init__(self, placed):
        self.placed = placed

    def isin(self, uuids):
        return (self.placed, list(uuids))


class FakeLogDF:
    """The post-merge verification read."""

    def __init__(self, placed):
        self.placed = placed

    def __getitem__(self, col):
        assert col == "uuid"
        return FakeCol(self.placed)

    def where(self, cond):
        placed, _uuids = cond
        self._n = placed
        return self

    def count(self):
        return self._n


class FakeReader:
    def __init__(self, calls, result):
        self.calls = calls
        self.result = result

    def format(self, fmt):
        self.calls["format"] = fmt
        return self

    def option(self, k, v):
        self.calls.setdefault("options", {})[k] = v
        return self

    def load(self, path):
        self.calls["path"] = path
        return self.result


class FakeSpark:
    def __init__(self, placed=0, stream_result="STREAM_DF"):
        self.read_calls = {}
        self.stream_calls = {}
        self._placed = placed
        self.read = FakeReader(self.read_calls, FakeLogDF(placed))
        self.readStream = FakeReader(self.stream_calls, stream_result)
        self.created = None

    def createDataFrame(self, rows, schema):
        self.created = (rows, schema)
        return "EMPTY_DF"


@pytest.fixture()
def real_branch(monkeypatch):
    """Flip the module into its delta-spark-installed configuration."""
    monkeypatch.setattr(dmod, "DELTA_AVAILABLE", True)
    monkeypatch.setattr(dmod, "DeltaTable", FakeDeltaTable)
    FakeDeltaTable.is_table = True
    FakeDeltaTable.merge_obj = FakeMerge()
    yield


def _conflict(name):
    return type(name, (Exception,), {})("commit conflict")


def test_backend_reports_delta_and_no_shim_warning(real_branch,
                                                   recwarn):
    assert dmod.backend() == "delta"
    dmod.require_delta()
    assert not [w for w in recwarn if "shim" in str(w.message)]


def test_first_commit_creates_table_with_error_mode(real_branch):
    FakeDeltaTable.is_table = False
    batch = FakeBatch(["u1", "u2"])
    assert dmod.append_batch(FakeSpark(), "/t/log", batch) is True
    assert batch.write_calls["format"] == "delta"
    assert batch.write_calls["mode"] == "error"       # never overwrite
    assert batch.write_calls["saved_to"] == "/t/log"


def test_first_commit_race_is_lost_race_not_error(real_branch):
    FakeDeltaTable.is_table = False
    batch = FakeBatch(["u1"], raise_on_save=RuntimeError(
        "Delta table already exists at /t/log"))
    assert dmod.append_batch(FakeSpark(), "/t/log", batch) is False
    # ...and a genuinely unrelated failure propagates
    batch = FakeBatch(["u1"], raise_on_save=ValueError("disk on fire"))
    with pytest.raises(ValueError):
        dmod.append_batch(FakeSpark(), "/t/log", batch)


@pytest.mark.parametrize("name", dmod._CONFLICT_MARKERS)
def test_merge_conflict_signals_lost_race(real_branch, name):
    FakeDeltaTable.merge_obj = FakeMerge(raise_on_execute=_conflict(name))
    got = dmod.append_batch(FakeSpark(), "/t/log", FakeBatch(["u1"]))
    assert got is False


def test_merge_non_conflict_propagates(real_branch):
    FakeDeltaTable.merge_obj = FakeMerge(
        raise_on_execute=ValueError("schema mismatch"))
    with pytest.raises(ValueError):
        dmod.append_batch(FakeSpark(), "/t/log", FakeBatch(["u1"]))


def test_merge_uuid_backstop_detects_silently_skipped_rows(real_branch):
    # merge succeeded but only 1 of our 2 uuids landed (positions were
    # already occupied by a racing winner): lost race, never a success
    batch = FakeBatch(["u1", "u2"])
    assert dmod.append_batch(FakeSpark(placed=1), "/t/log", batch) is False
    assert dmod.append_batch(FakeSpark(placed=2), "/t/log", batch) is True
    assert FakeDeltaTable.merge_obj.executed


def test_read_log_existing_and_missing_table(real_branch):
    sp = FakeSpark()
    FakeDeltaTable.is_table = True
    df = dmod.read_log(sp, "/t/log")
    assert sp.read_calls == {"format": "delta", "path": "/t/log"}
    assert isinstance(df, FakeLogDF)
    FakeDeltaTable.is_table = False
    from eventstorm_spark.model import EVENT_SCHEMA

    assert dmod.read_log(sp, "/t/log") == "EMPTY_DF"
    assert sp.created == ([], EVENT_SCHEMA)


def test_stream_source_plumbs_native_delta_reader(real_branch):
    sp = FakeSpark()
    assert dmod.stream_source(sp, "/t/log") == "STREAM_DF"
    assert sp.stream_calls == {"format": "delta", "path": "/t/log",
                               "options": {"maxFilesPerTrigger": 64}}
    sp2 = FakeSpark()
    dmod.stream_source(sp2, "/t/log", max_files_per_trigger=None)
    assert "options" not in sp2.stream_calls  # unthrottled


def test_current_version_lists_delta_log_dir(real_branch, tmp_path):
    p = tmp_path / "tbl"
    assert dmod.current_version(str(p)) == -1
    logdir = p / "_delta_log"
    logdir.mkdir(parents=True)
    for n in (0, 1, 12):
        (logdir / f"{n:020d}.json").write_text("{}")
    (logdir / "00000000000000000001.checkpoint.parquet").write_text("")
    (logdir / "_last_checkpoint").write_text("{}")
    assert dmod.current_version(str(p)) == 12
