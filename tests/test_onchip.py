"""Real-TPU uint32 bit-exactness (VERDICT r2 weak #2): gate outputs on the
actual chip must equal the golden model word-for-word at the full 128-bit
parameter set. conftest pins tests to CPU, so this spawns a subprocess with
the default (TPU) platform; gated by CUFHE_RUN_TPU=1 because the tunnel is
not always up. The suite's `golden` section runs the same check on every
hardware bench pass."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.environ.get("CUFHE_RUN_TPU"),
                    reason="needs the real TPU; set CUFHE_RUN_TPU=1")
def test_onchip_gates_match_golden_u32():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "golden_check.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["mismatched_words"] == 0
    assert "TPU" in rec["device"], rec["device"]
