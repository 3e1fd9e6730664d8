"""bench.py must print exactly one parseable JSON line (driver contract)."""

import io
import json
import contextlib
import sys

sys.path.insert(0, "/root/repo")


def test_bench_json_contract():
    import bench

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main(M=128, BATCH=2, REPS=2)  # tiny: runs on the CPU backend
    lines = [l for l in buf.getvalue().strip().splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["unit"] == "pairs/s"
