"""T8 (VERDICT r1 missing #5): an INDUCED task failure mid-merge, not
just logical re-delivery. The reference retries whole RPC fetches with
exponential backoff (/root/reference/src/ch_eth/init.rs:349-351); the
Spark-native equivalent is task-level retry under the idempotent sink —
a failed write-stage task is rerun by the scheduler and the commit
happens once. This drives that path for real: a pandas UDF inside
``pre_write_transform`` (the production extraction hook) raises on
exactly one attempt, and the converged state must be byte-identical to
a clean run.

Runs in a subprocess because task retries need spark.task.maxFailures≥2
(master=local[4,2]) while the shared test session runs plain local[N].
"""

import json
import os
import subprocess
import sys

_JOB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_induced_failure_job.py")


def test_induced_midmerge_task_failure_converges(tmp_table_dir):
    proc = subprocess.run(
        [sys.executable, _JOB, tmp_table_dir],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr[-3000:]}"
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["bomb_fired"], "failure injection never ran"
    assert out["hash_clean"] == out["hash_bombed"]
    assert out["epochs_bombed"] == [0]
