"""Two-writer append-race worker: a real OS process with its OWN
SparkSession and EventLog instance on a shared log path.

Executed by ``test_append.py::test_multiprocess_two_writer_race`` via
``subprocess`` — separate interpreters, so the serialization the test
proves comes from the on-disk commit-marker protocol
(``log/store.py``), not from Python's GIL or a shared in-process lock
(which the threaded race test already covers).

Usage: python mp_append_worker.py <log_path> <worker_id> <out_json> <n_batches>
Writes {"wid", "positions": [first_position per batch], "cas": "won"|"lost"}.
"""

from __future__ import annotations

import json
import os
import sys
import uuid


def main(log_path: str, wid: str, out_path: str, n_batches: int) -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[2]")
             .appName(f"mp-writer-{wid}")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "4")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from eventstorm_spark import EventLog, ExpectedRevision, NewEvent
    from eventstorm_spark.errors import WrongExpectedRevisionError

    def ev(t: str) -> NewEvent:
        return NewEvent(uuid=str(uuid.uuid4()), event_type=t, data="{}")

    log = EventLog(spark, log_path)
    res: dict = {"wid": wid, "positions": [], "cas": None}
    for _ in range(n_batches):
        r = log.append(f"w-{wid}", [ev("E") for _ in range(3)])
        res["positions"].append(r.first_position)
    # cross-process CAS: exactly one writer may create the shared stream
    try:
        log.append("cas", [ev("C")], ExpectedRevision.no_stream())
        res["cas"] = "won"
    except WrongExpectedRevisionError:
        res["cas"] = "lost"
    with open(out_path, "w") as f:
        json.dump(res, f)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
