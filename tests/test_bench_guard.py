"""run_scaling's live-sibling guard: a concurrent bench.py process
(e.g. an orphaned sweep from a crashed session) must be detected before
a new sweep truncates and shares BENCH/scaling_trials.jsonl with it."""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _live_sibling_benches


def test_no_siblings_normally():
    # the test runner itself is pytest, not bench.py
    assert all("pytest" not in s for s in _live_sibling_benches())


def test_detects_live_bench_process(tmp_path):
    decoy = tmp_path / "bench.py"
    decoy.write_text("import time; time.sleep(30)\n")
    proc = subprocess.Popen([sys.executable, str(decoy)])
    try:
        time.sleep(0.3)
        sibs = _live_sibling_benches()
        assert any(str(decoy) in s for s in sibs), sibs
    finally:
        proc.kill()
        proc.wait()
    # gone once the process exits
    assert all(str(decoy) not in s for s in _live_sibling_benches())
