"""Driver-shaped regression test for ``__graft_entry__.dryrun_multichip``.

Round 3 shipped a process-pool loader whose spawn children could only import
``sisr_tpu`` when the parent's ``sys.path`` carried an *absolute* repo entry —
the test suite masked this (tests/conftest.py inserts one) while the driver's
invocation relies on a cwd-relative ``''`` entry, which multiprocessing's
spawn rewrites to ``ORIGINAL_DIR`` (the cwd at first ``multiprocessing``
import — inside the experiment tempdir here).  Children died with
``ModuleNotFoundError`` and the pool hung forever (MULTICHIP_r03: rc=124).

This test runs the dry run the way the driver does: a fresh interpreter,
``python -c "import __graft_entry__; ..."``, cwd-relative import only
(``sys.path[0]=''``), PYTHONPATH stripped — no conftest help.  It must
complete, not hang, with the process-pool loader default engaged.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    code = ("import sys; sys.path = [''] + [p for p in sys.path if p]; "
            "import __graft_entry__; __graft_entry__.dryrun_multichip(2)")
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=900)
    assert proc.returncode == 0, f"dryrun failed:\n{proc.stdout[-6000:]}"
    assert "dryrun_multichip: 2 devices" in proc.stdout
