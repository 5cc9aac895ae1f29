"""bench.py measurement hygiene (r14): the process-tree CPU clock
counts descendants and ignores unrelated load; the compact stdout
tail always fits the driver's 2000-char capture. No Spark needed."""

from __future__ import annotations

import json
import subprocess
import time

import bench


def test_tree_cpu_counts_descendants():
    a = bench._tree_cpu_seconds()
    child = "import time\nt=time.time()\nwhile time.time()-t<0.8: pass\nimport sys; sys.stdin.read()"
    p = subprocess.Popen(
        ["python", "-c", child], stdin=subprocess.PIPE
    )
    t0 = time.time()
    while time.time() - t0 < 1.2:  # parent burn while child burns
        pass
    b = bench._tree_cpu_seconds()
    p.stdin.close()
    p.wait()
    # child (0.8s) + parent (1.2s) CPU both land in the delta
    assert b - a >= 1.5, (a, b)


def test_compact_tail_always_fits_capture():
    # current suite size and well past it: every degradation stage
    # emits a line the 2000-char tail cannot decapitate
    def synth_timings(n):
        return {
            f"synth200k_entry_with_a_rather_long_name_{i}": 1.234
            for i in range(n // 2)
        } | {f"headline_query_with_long_name_{i}": 2.5 for i in range(n - n // 2)}

    for n in (10, 80, 200, 600):
        t = synth_timings(n)
        line = bench._compact_tail_line(sum(t.values()), 0.1, t)
        assert len(line) <= 1995, (n, len(line))
        parsed = json.loads(line)  # and it parses
        assert parsed["total"] > 0
