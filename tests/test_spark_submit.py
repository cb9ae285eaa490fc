"""spark-submit --py-files packaging: the production deployment path.

The reference collector ships as a single binary; this engine's
equivalent deployment artifact is ``sparkotel.zip`` + ``jobs/
run_pipeline.py`` submitted with ``--py-files`` (README "production-
style spec-driven run").  This test proves the packaging genuinely
works: the job script is copied OUTSIDE the repo and run with a
scrubbed PYTHONPATH, so ``import sparkotel`` can only resolve from the
zip that ``--py-files`` distributed — not from a sys.path accident.
It then exercises kill (``--fail-after``) + resume through the CLI,
i.e. the checkpoint-ledger resumability contract end to end in the
deployed form, not just in-process (test_runner_kill_resume covers
that arm).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from conftest import SF_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_kill_resume(tmp_path):
    # 1. package the library exactly as the README documents
    zpath = tmp_path / "sparkotel.zip"
    pkg = os.path.join(REPO, "sparkotel")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # 2. job script copied outside the repo: its repo-root sys.path
    #    insert then points at tmp_path (which holds no package), so the
    #    import must be served by the --py-files zip
    jobs = tmp_path / "jobs"
    jobs.mkdir()
    shutil.copy(
        os.path.join(REPO, "jobs", "run_pipeline.py"), jobs / "run_pipeline.py"
    )
    spec = os.path.join(REPO, "tests", "fixtures", "pipeline_m1.json")
    out = tmp_path / "out"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update(
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
        SPARK_GRAFT_CPUS="4",
    )

    def submit(*extra: str) -> dict:
        cmd = [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            str(zpath),
            str(jobs / "run_pipeline.py"),
            "--spec",
            spec,
            "--input",
            SF_DIR,
            "--output",
            str(out),
            *extra,
        ]
        p = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            timeout=600,
            env=env,
            cwd=str(tmp_path),
        )
        assert p.returncode == 0, p.stderr[-4000:]
        summaries = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        assert summaries, p.stdout[-4000:]
        return json.loads(summaries[-1])

    s1 = submit("--fail-after", "3")
    assert s1 == {"committed": 3, "resumed_from": 0, "complete": False}

    s2 = submit()
    assert s2["complete"] is True
    assert s2["resumed_from"] == 3
    assert s2["committed"] == 5
    assert s2["rows"] > 0
