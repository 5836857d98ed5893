"""Smoke-run the examples/ walkthroughs: they are executable documentation
(the reference's README "Usage" snippets, but runnable), so doc rot shows
up here as a red test instead of a broken first-user experience."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    ("01_gates.py", "all 192 decryptions correct"),
    ("02_adder_and_netlists.py", "additions OK"),
    ("03_server_client_split.py", "all decryptions correct"),
    ("04_encrypted_processor.py",
     "all encrypted program runs match the plaintext interpreter"),
    ("05_encrypted_lookup.py", "all encrypted lookups correct"),
    ("06_encrypted_integers.py", "all encrypted integer results correct"),
]


@pytest.mark.parametrize("script,expect", EXAMPLES,
                         ids=[e[0] for e in EXAMPLES])
def test_example_runs(script, expect):
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert expect in proc.stdout, proc.stdout[-2000:]
