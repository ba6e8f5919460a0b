"""Driver-environment portability gate.

Launches ``tests/driver_sim.py`` in a fresh subprocess (fresh JVM) so its
bare ``SparkSession.builder.getOrCreate()`` cannot reuse the test suite's
configured session.  Catches any dependency on ``session.get_spark()``
confs — the exact failure mode that zeroed CORRECTNESS_r01.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_run_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "driver_sim.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, (
        f"driver simulation failed\nstdout:\n{proc.stdout[-8000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
