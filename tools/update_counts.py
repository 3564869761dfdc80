#!/usr/bin/env python
"""Regenerate the drift-prone counts quoted in README.md / docs.

VERDICT r3 weak #6 and r4 weak #4: hand-maintained test tallies went stale
two rounds running. This script derives them and rewrites the standardized
phrases in place; ``--check`` fails (exit 1) if any quoted number disagrees
with reality — wired as a slow-marked test and the ``make counts`` target.

Generated phrases (the ONLY forms the docs may quote):
  "NNN tests collected (NN slow-marked, enabled with --runslow)"
  "NN committed protocol evidence dirs"
  "NN dryrun checks"
"""

import argparse
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FILES = ["README.md", "docs/parity_matrix.md", "docs/testing.md",
         "BENCHMARKS.md", "CLAUDE.md"]


def collected_counts():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT + ":" + os.environ.get("PYTHONPATH", ""))

    def collect(*extra):
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only",
             "-q", *extra],
            cwd=ROOT, env=env, capture_output=True, text=True).stdout
        m = re.search(r"(\d+)(?:/\d+)? tests collected", out)
        if not m:
            raise RuntimeError(f"pytest collect failed:\n{out[-2000:]}")
        return int(m.group(1))

    total = collect()
    slow = collect("-m", "slow")
    return total, slow


def evidence_dirs():
    out = subprocess.run(
        ["git", "ls-files", "trained_models/experiments"],
        cwd=ROOT, capture_output=True, text=True).stdout
    return len({line.split("/")[2] for line in out.splitlines()
                if len(line.split("/")) > 3})


def dryrun_checks():
    with open(os.path.join(ROOT, "__graft_entry__.py")) as f:
        return len(re.findall(r'print\(f?"dryrun_multichip:', f.read()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="fail if any doc quotes a stale number")
    args = ap.parse_args()

    total, slow = collected_counts()
    # every pattern tolerates a hard line wrap anywhere in the phrase
    # (markdown reflow); staleness is judged on the NUMBERS only, so a
    # wrapped-but-correct phrase is neither flagged nor reflowed
    subs = [
        (r"\d+[ \n]+tests[ \n]+collected[ \n]+\(\d+[ \n]+slow-marked,"
         r"[ \n]+enabled[ \n]+with[ \n]+--runslow\)",
         f"{total} tests collected ({slow} slow-marked, enabled with "
         f"--runslow)"),
        (r"\d+[ \n]+committed[ \n]+protocol[ \n]+evidence[ \n]+dirs",
         f"{evidence_dirs()} committed protocol evidence dirs"),
        (r"\d+[ \n]+dryrun[ \n]+checks", f"{dryrun_checks()} dryrun checks"),
    ]

    stale = False
    for rel in FILES:
        path = os.path.join(ROOT, rel)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            text = f.read()
        new = text
        for pat, repl in subs:
            want = re.findall(r"\d+", repl)
            new = re.sub(
                pat,
                lambda m, repl=repl, want=want:
                    m.group(0) if re.findall(r"\d+", m.group(0)) == want
                    else repl,
                new)
        if new != text:
            stale = True
            if args.check:
                print(f"STALE counts in {rel}")
            else:
                with open(path, "w") as f:
                    f.write(new)
                print(f"updated {rel}")
    print(f"counts: {total} collected / {slow} slow / "
          f"{evidence_dirs()} evidence dirs / {dryrun_checks()} dryrun checks")
    return 1 if (stale and args.check) else 0


if __name__ == "__main__":
    sys.exit(main())
