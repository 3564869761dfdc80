"""Doc count tallies must match reality (VERDICT r4 task 5: the README test
count drifted two rounds running — generate it, don't hand-maintain it)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_doc_counts_not_stale():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "update_counts.py"),
         "--check"], cwd=ROOT, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
