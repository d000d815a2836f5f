"""Unit tests for bench/scaling.py's protocol arithmetic and clean gates.

The scaling headline (BENCH/BASELINE.md) is only as trustworthy as the
pair math and the gate predicates that pick which pairs count — these
are pure functions over recorded trial JSON, so they get direct tests:
no Spark, no corpus, no timing.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench")
if BENCH not in sys.path:
    sys.path.insert(0, BENCH)

import scaling  # noqa: E402  (bench/scaling.py)


def _trial(
    fps,
    qsec,
    *,
    ext=0.0,
    cal_thr=None,
    cal_sec=None,
    q_ext=None,
    q_cal=None,
    q_cal_post=None,
    warm=None,
):
    t = {
        "files_per_sec": fps,
        "query_batch_sec": qsec,
        "build_sec": 100.0,
        "query_p50_sec": 1.0,
        "ext_cores": ext,
        "commit": None,
    }
    if cal_thr is not None:
        t["cal_thr_cores"] = cal_thr
    if cal_sec is not None:
        t["cal_sec"] = cal_sec
    if q_ext is not None:
        t["ext_cores_query"] = q_ext
    if q_cal is not None:
        t["cal_sec_query"] = q_cal
    if q_cal_post is not None:
        t["cal_sec_query_post"] = q_cal_post
    if warm is not None:
        t["query_warm_batch_sec"] = warm
    return t


def _row(**kw):
    """A pair row with every gate field quiet; override per test."""
    base = {
        "ext": 0.0,
        "hw_ceil": 0.9,
        "cal_drift": 1.0,
        "q_ext": 0.0,
        "q_drift": 1.0,
        "q_drift_post": 1.0,
    }
    base.update(kw)
    return base


# ---------------------------------------------------------------- medians


def test_median_odd_even():
    assert scaling._median([3.0, 1.0, 2.0]) == 2.0
    assert scaling._median([4.0, 1.0, 2.0, 3.0]) == 2.5


def test_bootstrap_ci_deterministic_and_ordered():
    xs = [0.7, 0.75, 0.8, 0.82, 0.85, 0.9, 0.95]
    ci1 = scaling._bootstrap_median_ci(xs, n_boot=2000)
    ci2 = scaling._bootstrap_median_ci(xs, n_boot=2000)
    assert ci1 == ci2  # fixed seed -> reproducible report
    lo, hi = ci1
    assert min(xs) <= lo <= hi <= max(xs)
    # the median itself lies inside its own CI
    assert lo <= scaling._median(xs) <= hi


def test_bootstrap_ci_needs_four_pairs():
    assert scaling._bootstrap_median_ci([0.8, 0.9, 1.0]) is None


# ---------------------------------------------------------- pair assembly


def test_pair_rows_math():
    lo = _trial(
        10_000.0, 40.0, ext=0.5, cal_thr=1.5, cal_sec=1.0,
        q_ext=0.0, q_cal=1.0, q_cal_post=1.0, warm=32.0,
    )
    hi = _trial(
        32_000.0, 12.5, ext=1.0, cal_thr=4.5, cal_sec=1.1,
        q_ext=2.0, q_cal=1.2, q_cal_post=0.9, warm=10.0,
    )
    (r,) = scaling._pair_rows({"p#0": {2: lo, 8: hi}}, 2)
    assert r["eff"] == pytest.approx((32_000 / 10_000) / 4)
    assert r["q_eff"] == pytest.approx((40.0 / 12.5) / 4)
    assert r["q_warm_eff"] == pytest.approx((32.0 / 10.0) / 4)
    assert r["ext"] == 1.0  # max over the two build windows
    assert r["hw_ceil"] == pytest.approx((4.5 / 1.5) / 4)
    assert r["cal_drift"] == pytest.approx(1.1)
    assert r["q_ext"] == 2.0
    assert r["q_drift"] == pytest.approx(1.2)
    assert r["q_drift_post"] == pytest.approx(0.9)


def test_pair_rows_preprobe_fields_are_none():
    lo = _trial(10_000.0, 40.0)
    hi = _trial(30_000.0, 15.0)
    (r,) = scaling._pair_rows({"p#0": {2: lo, 8: hi}}, 2)
    for f in (
        "hw_ceil", "cal_drift", "q_ext", "q_drift", "q_drift_post",
        "q_warm_eff",
    ):
        assert r[f] is None, f


# ------------------------------------------------------------ build gate


def test_build_gate_quiet_pair_is_clean():
    assert scaling._build_gate_ok(_row())


def test_build_gate_external_load_rejects():
    assert not scaling._build_gate_ok(_row(ext=scaling.EXT_GATE + 0.1))
    # and a pair with NO load reading at all is never clean
    assert not scaling._build_gate_ok(_row(ext=None))


def test_build_gate_hw_ceiling_rejects_steal_regime():
    assert not scaling._build_gate_ok(_row(hw_ceil=0.4))
    # pre-probe pairs pass (None)
    assert scaling._build_gate_ok(_row(hw_ceil=None))


def test_build_gate_drift_is_symmetric():
    # a slow N window (drift < lo) INFLATES eff — must be cut too
    assert not scaling._build_gate_ok(_row(cal_drift=0.62))
    assert not scaling._build_gate_ok(_row(cal_drift=1.44))
    assert scaling._build_gate_ok(_row(cal_drift=scaling.DRIFT_LO))
    assert scaling._build_gate_ok(_row(cal_drift=scaling.DRIFT_HI))
    assert scaling._build_gate_ok(_row(cal_drift=None))


# ------------------------------------------------------------ query gate


def _qok(r):
    return scaling._qgate_ok(
        r, scaling.EXT_GATE, scaling.DRIFT_LO, scaling.DRIFT_HI
    )


def test_query_gate_mirrors_build_thresholds():
    assert _qok(_row())
    assert not _qok(_row(q_ext=scaling.EXT_GATE + 0.1))
    assert not _qok(_row(q_drift=0.5))
    assert not _qok(_row(q_drift_post=1.5))
    # pre-probe pairs pass
    assert _qok(_row(q_ext=None, q_drift=None, q_drift_post=None))


def test_query_gate_is_independent_of_build_fields():
    # a build-dirty pair can still have clean query windows (the caller
    # composes the gates; this predicate must not peek at build fields)
    assert _qok(_row(ext=99.0, hw_ceil=0.1, cal_drift=9.9))


# --------------------------------------------------------------- eras


def test_engine_commit_none_is_pretag():
    assert scaling._engine_commit(None) == "pre-tag"


def test_engine_commit_maps_doc_commit_to_engine_commit():
    # HEAD may be a doc/bench-only commit; the era key must be the last
    # commit at-or-before it touching the measured code, so doc commits
    # landing mid-pool don't split one engine into cosmetic eras
    import subprocess

    head = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    engine = subprocess.run(
        ["git", "log", "-1", "--format=%h", "HEAD", "--",
         "quickb_spark/", "bench/_scale_worker.py"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    if not head or not engine:
        pytest.skip("not a git checkout")
    assert scaling._engine_commit(head) == engine


# ------------------------------------------------- end-to-end regeneration


def _pool_trial(cpus, pair, fps, qsec, **extra):
    master = (
        "local-cluster[1,2,14336]" if cpus == 2 else "local-cluster[4,2,14336]"
    )
    t = {
        "cpus": cpus,
        "master": master,
        "mode": "cluster",
        "n_docs": 100,
        "n_files": 100,
        "pair": pair,
        "build_sec": 100.0,
        "files_per_sec": fps,
        "query_batch_sec": qsec,
        "query_p50_sec": 1.0,
        "ext_cores": 0.0,
        "commit": None,
        "ts": "2026-01-01 00:00:00",
    }
    t.update(extra)
    return t


def test_report_from_pool_regenerates_deterministically(tmp_path):
    """write_report must digest a pool mixing pre-probe trials (minimal
    fields) with fully-instrumented round-4 trials, and two regenerations
    of the same pool must be byte-identical below the timestamp line."""
    import argparse
    import json

    pool = tmp_path / "pool.jsonl"
    rows = []
    # three fully-instrumented pairs (enough for the clean-median path)
    for i, (flo, fhi) in enumerate([(100, 340), (100, 330), (100, 320)]):
        for cpus, fps, qsec, warm in (
            (2, flo, 40.0, 30.0),
            (8, fhi, 14.0, 9.0),
        ):
            rows.append(_pool_trial(
                cpus, f"t#{i}", float(fps), qsec,
                query_warm_batch_sec=warm,
                cal_thr_cores=1.5 if cpus == 2 else 4.6,
                cal_sec=1.0,
                ext_cores_query=0.0,
                cal_sec_query=1.0,
                cal_sec_query_post=1.0,
                phases={
                    "phase1 flat checkpoint": 70.0,
                    "phase2 merge wave 0-63": 25.0,
                },
            ))
    # one pre-probe pair: minimal fields only (like early recorded trials)
    rows.append(_pool_trial(2, "t#old", 100.0, 44.0))
    rows.append(_pool_trial(8, "t#old", 300.0, 18.0))
    pool.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    out = tmp_path / "report.md"
    args = argparse.Namespace(
        n=2, exec_cores=2, cluster=True, docs=100,
        pool=str(pool), out=str(out), pairs=0,
    )
    scaling.report_from_pool(args)
    body1 = out.read_text().splitlines()[1:]
    assert any("scaling efficiency" in l for l in body1)
    # all four pairs appear in the per-pair table, none dropped
    text = "\n".join(body1)
    for pid in ("t#0", "t#1", "t#2", "t#old"):
        assert pid in text
    # 4 clean pairs (pre-probe passes every probe gate it predates)
    assert "4\nclean matched pairs" in text or "4 clean" in text.replace(
        "\n", " "
    ) or "over the\n4" in text
    scaling.report_from_pool(args)
    body2 = out.read_text().splitlines()[1:]
    assert body1 == body2


def test_cold_reopen_note_renders_for_reopen_pairs(tmp_path):
    """Pairs recording query_cold_batch_secs (the min-over-3 fresh
    server re-opens) must be counted in the current-engine cold-batch
    headline; a pool without the field must not mention re-opens."""
    import argparse
    import json

    def _pool(with_reopen):
        rows = []
        # two eras so the current-engine branch of the headline renders:
        # one old pre-tag pair, three pairs at a fake "current" commit
        # old pair id sorts FIRST: eras are keyed by recording order and
        # the headline leads with the newest era
        rows.append(_pool_trial(2, "a#old", 100.0, 44.0))
        rows.append(_pool_trial(8, "a#old", 300.0, 18.0))
        for i in range(3):
            for cpus, fps, qsec, warm in ((2, 100, 40.0, 30.0),
                                          (8, 330, 14.0, 9.0)):
                extra = dict(
                    query_warm_batch_sec=warm, commit="deadbee",
                    cal_sec=1.0, ext_cores_query=0.0,
                    cal_sec_query=1.0, cal_sec_query_post=1.0,
                )
                if with_reopen:
                    extra["query_cold_batch_secs"] = [qsec, qsec + 9.0,
                                                      qsec + 1.0]
                rows.append(_pool_trial(cpus, f"t#{i}", float(fps),
                                        qsec, **extra))
        p = tmp_path / f"pool_{with_reopen}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        return p

    for with_reopen in (True, False):
        out = tmp_path / f"report_{with_reopen}.md"
        args = argparse.Namespace(
            n=2, exec_cores=2, cluster=True, docs=100,
            pool=str(_pool(with_reopen)), out=str(out), pairs=0,
        )
        scaling.report_from_pool(args)
        text = out.read_text()
        if with_reopen:
            assert "min over 3 fresh server re-opens for the 3 pairs" in text
        else:
            assert "fresh server re-opens for the" not in text
