"""bench.py's driver output contract (VERDICT r10 #2): the FINAL
stdout line must be a standalone-parseable compact JSON under the
driver's ~2 kB tail capture — round 10's verbose single line (~2.7 kB
with the methodology string) overflowed it and the round's perf record
was lost to ``parsed: null``."""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from bench import (  # noqa: E402
    HEADLINE,
    METHODOLOGY,
    compact_record,
    sentinel_fields,
)


def _fake_timings(names):
    return {n: 1.23456 + i * 0.111 for i, n in enumerate(names)}


def _fake_sentinel(contended=False):
    return sentinel_fields(
        [40.0 if contended else 2.1, 30.5], [0.051, 0.049], 32
    )


def test_compact_record_parses_and_fits_at_current_headline():
    timings = _fake_timings(HEADLINE)
    line = compact_record(sum(timings.values()), timings, 0.1, _fake_sentinel())
    assert len(line.encode()) <= 1500, len(line.encode())
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total_wall"
    assert rec["unit"] == "sec"
    assert set(rec["queries"]) == set(HEADLINE)
    assert rec["methodology_ref"] == "bench.py METHODOLOGY"
    # the contention sentinel rides along (VERDICT r11 #4)
    assert rec["contended"] is False
    assert len(rec["load1"]) == 2 and len(rec["calib"]) == 2
    # the verbose methodology string must NOT ride along
    assert METHODOLOGY not in line


def test_sentinel_band():
    """The METHODOLOGY-named band: calibration drift > 1.5x or a
    pre-loaded box flips `contended`; the end-of-run loadavg does NOT
    (it is polluted by this bench's own 32-thread tail)."""
    # quiet box, stable calibration
    assert sentinel_fields([1.0, 30.0], [0.05, 0.06], 32)["contended"] is False
    # calibration job slowed 2x mid-run -> contended
    assert sentinel_fields([1.0, 30.0], [0.05, 0.11], 32)["contended"] is True
    # box already loaded before the run began -> contended
    assert sentinel_fields([49.0, 30.0], [0.05, 0.05], 32)["contended"] is True
    # r11's failure mode would have self-reported: the driver's 3.12x
    # capture ran on a box whose fixed-work job could not have held a
    # 1.5x-stable wall across the run


def test_compact_record_fits_even_with_many_more_queries():
    # headroom: ~42 queries of realistic (headline-average) name length
    # still fit with the per-query map intact — several rounds of
    # headline growth before the n_queries last resort would trigger
    names = [f"q{i}_realistic_name_{i}" for i in range(42)]
    timings = _fake_timings(names)
    line = compact_record(sum(timings.values()), timings, 0.1)
    assert len(line.encode()) <= 1500, len(line.encode())
    assert len(json.loads(line)["queries"]) == 42


def test_compact_record_last_resort_keeps_total():
    names = [f"q{i}_" + "x" * 80 for i in range(100)]
    timings = _fake_timings(names)
    line = compact_record(sum(timings.values()), timings, 0.1)
    assert len(line.encode()) <= 1500
    rec = json.loads(line)
    assert rec["value"] > 0 and rec["n_queries"] == 100
