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
    CALIB_POST_IDLE_MAX,
    HEADLINE,
    METHODOLOGY,
    compact_record,
    sentinel_fields,
)


def _fake_timings(names):
    return {n: 1.23456 + i * 0.111 for i, n in enumerate(names)}


def _fake_sentinel(contended=False):
    s = sentinel_fields(
        [40.0 if contended else 2.1, 30.5],
        [0.221, 0.151, 0.112, 0.098, 0.104, 0.091],  # pre + 4 mid + post
        32,
    )
    # ride-along fields main() adds to the compact record
    return {**s, "n_suspect": 1, "r1_12q": 8.564}


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
    assert len(rec["load1"]) == 2 and len(rec["calib"]) == 6
    # the verbose methodology string must NOT ride along
    assert METHODOLOGY not in line


def test_sentinel_band():
    """The METHODOLOGY-named bands: a pre-loaded box, a session-aged
    calibration wall above the idle band, or a >3x mid-run swing flip
    `contended`; the job's own ~2x session warm-up (JIT tiering,
    measured 0.22 -> 0.11 s on an idle box) does NOT — nor does the
    end-of-run loadavg, which this bench's own 32-thread tail
    pollutes."""
    # quiet box: fresh-to-aged warm-up drift (3.5x, measured idle) is
    # NOT contention — calib[0] is excluded from both rules
    assert (
        sentinel_fields(
            [1.0, 30.0], [0.246, 0.076, 0.087, 0.107, 0.095, 0.071], 32
        )["contended"]
        is False
    )
    # session-aged wall above the idle band -> contended (r11's
    # 1.5-3x-inflated capture would have cleared 0.25 s here)
    assert sentinel_fields([1.0, 30.0], [0.30, 0.30], 32)["contended"] is True
    # MID-RUN spike the endpoints never see: an interleaved aged
    # calibration above the absolute band flips it with clean pre/post
    assert (
        sentinel_fields([1.0, 30.0], [0.22, 0.12, 0.41, 0.10, 0.09], 32)[
            "contended"
        ]
        is True
    )
    # idle aged noise (spreads up to ~2.3x between GC neighborhoods,
    # measured) is NOT contention
    assert (
        sentinel_fields(
            [1.0, 30.0], [0.185, 0.086, 0.107, 0.15, 0.066, 0.07], 32
        )["contended"]
        is False
    )
    # a >3x aged spread is load even under the absolute band
    assert (
        sentinel_fields([1.0, 30.0], [0.22, 0.07, 0.22, 0.08], 32)["contended"]
        is True
    )
    # box already loaded before the run began -> contended
    assert sentinel_fields([49.0, 30.0], [0.05, 0.05], 32)["contended"] is True


def test_suspect_row_trigger():
    """The row-adaptive probe (round 13): a timed median far above the
    same row's same-session warm-up wall fires an immediate
    calibration. Thresholds sit outside the §5e ±30% row-variance band
    and small-row jitter."""
    from bench import suspect_row

    assert suspect_row(17.9, 8.0) is True  # the r13 st6 straddle
    assert suspect_row(8.3, 8.0) is False  # in-band variance
    assert suspect_row(10.3, 8.0) is False  # 1.29x: inside ±30%
    assert suspect_row(12.5, 8.0) is True  # 1.56x on a big row
    assert suspect_row(0.35, 0.2) is False  # small-row jitter floored
    assert suspect_row(0.55, 0.2) is True  # 0.3 s past a small warm
    assert suspect_row(1.0, float("inf")) is False  # no warm wall: never


def test_suspect_reprobe_rule_round13_vector():
    """VERDICT r13 #2: one mid-loop transient inflated official rows
    and the drift pipeline consumed the capture anyway. The r14
    protocol re-probes each suspect row once after the loop; the
    OFFICIAL wall is min(timed, reprobe) — the REPROBE_MIN rule — and
    the record carries all three walls per suspect. Vector: the r13
    session's sd3 straddle (timed 18.5 s vs same-session warm 9.1 s;
    an isolated same-box re-read gave ~9.4 s)."""
    from bench import official_wall, suspect_row

    timed, warm, reprobe = 18.5, 9.1, 9.4
    assert suspect_row(timed, warm) is True  # flags, probes, re-probes
    assert official_wall(timed, reprobe) == 9.4  # transient stripped
    # the rule never manufactures speed: a re-probe SLOWER than the
    # timed median (load arrived late) keeps the timed wall
    assert official_wall(2.0, 3.1) == 2.0
    # a clean row (not suspect) never re-probes — unchanged methodology
    assert suspect_row(9.3, 9.1) is False
    # record shape: suspects carry [timed, warm, reprobe] in the
    # verbose record so the substitution is auditable
    entry = [timed, warm] + [reprobe]
    assert entry == [18.5, 9.1, 9.4]


def test_sentinel_self_relative_rule_round12_captures():
    """VERDICT r12 #5 regression vectors: the round-12 ledger's
    recorded captures must classify identically under the r13
    self-relative primary rule, and the rule must TRAVEL — the same
    loaded-run shape on a 2x-faster box, where every absolute value
    sits inside this box's idle band, still reads contended.

    Vectors from SCALE.md's round-12 drift ledger: the 67.8 s clean
    capture recorded aged calibrations 0.069-0.113; the official
    76.47 s clean capture 0.081-0.121; the 100.0 s loaded capture's
    signature was clean ENDPOINTS with 2-3x-inflated mid-run rows
    (q18 2.87 vs 1.11-1.42 same-day) — under the final interleaved
    protocol its mid-run calibrations read at that same 2-3x over the
    clean floor (interior points of the clean vectors interpolated;
    the loaded capture predates the interleaved sentinel, so its
    mid-run points are the ledger's documented inflation applied to
    the measured clean floor)."""
    # 67.8 s clean capture: floor 0.069, top 0.113 -> rel 1.64, clean
    s = sentinel_fields([2.1, 30.0], [0.246, 0.113, 0.097, 0.082, 0.069], 32)
    assert s["contended"] is False
    assert s["calib_floor"] == 0.069 and s["calib_rel"] == 1.64
    # official r12 capture (76.47 s): aged 0.081-0.121, clean
    assert (
        sentinel_fields([1.4, 30.0], [0.21, 0.121, 0.104, 0.093, 0.081], 32)[
            "contended"
        ]
        is False
    )
    # the 100.0 s loaded capture: clean endpoints, 2-3x mid-run
    s = sentinel_fields([2.0, 30.0], [0.24, 0.09, 0.29, 0.32, 0.10], 32)
    assert s["contended"] is True
    assert s["calib_rel"] > 3.0  # the relative rule alone catches it
    # travel: same shape on a 2x-faster box — every point inside this
    # box's 0.25 s rail, so the old absolute-primary rule was blind;
    # the self-relative rule still fires
    s = sentinel_fields([2.0, 30.0], [0.12, 0.045, 0.145, 0.16, 0.05], 32)
    assert s["contended"] is True
    assert s["calib_rel"] > 3.0
    assert max([0.045, 0.145, 0.16, 0.05]) < CALIB_POST_IDLE_MAX


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
