"""North-rule packaging: the engine runs under the literal
`spark-submit --py-files reiz_io_spark.zip` invocation, with the
package supplied ONLY by the zip (cwd outside the repo, no
PYTHONPATH) — exactly how a multi-executor cluster receives it."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    zip_path = str(tmp_path / "reiz_io_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py"),
         zip_path],
        capture_output=True, text=True, check=True,
    )
    assert zip_path in out.stdout

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_smoke.py")],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "SUBMIT_SMOKE_OK" in proc.stdout, (
        proc.stdout[-1000:], proc.stderr[-2000:]
    )
