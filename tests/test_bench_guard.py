"""Bench-regression guard (VERDICT r10 #7): the r10 driver artifact
showed +51%/3x flagship "regressions" that were pure session contention,
which means a REAL regression could hide in bench noise. This guard
turns BENCH_HISTORY.jsonl into an automatic gate: a fresh-session
control re-timing of the flagship diffs must stay within GUARD_FACTOR of
the recorded history median.

The measurement runs bench.py --control in a SUBPROCESS with the bench's
own 32-thread configuration — the pytest session is local[8] with 8
shuffle partitions, which is ~10x slower on the sf0.1 flagships and
would make any in-session comparison against 32-thread history
meaningless.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
HISTORY = REPO / "BENCH_HISTORY.jsonl"

GUARD_FACTOR = 2.0
#: absolute slack for ~1-second timings: scheduler jitter on a loaded
#: machine can add a few hundred ms that would be a huge RELATIVE error
GUARD_SLACK_SEC = 0.75


def flagship_history(name: str, sf: float = 0.1, last_n: int = 8) -> list:
    """Recorded values for one flagship query at the given sf: control
    blocks where present (contention-free by construction), else the
    per-query map (older rounds)."""
    vals: list[float] = []
    if not HISTORY.exists():
        return vals
    for line in HISTORY.read_text().splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("sf") != sf:
            continue
        ctl = d.get("control")
        if isinstance(ctl, dict) and isinstance(ctl.get(name), (int, float)):
            if ctl[name] > 0:
                vals.append(float(ctl[name]))
                continue
        q = d.get("queries") or {}
        if isinstance(q.get(name), (int, float)):
            vals.append(float(q[name]))
    return vals[-last_n:]


def check_guard(
    history_vals: list,
    measured: float,
    *,
    factor: float = GUARD_FACTOR,
    slack: float = GUARD_SLACK_SEC,
) -> float:
    """Raise AssertionError when ``measured`` exceeds ``factor`` x the
    history median (+ absolute ``slack``); returns the bound."""
    med = statistics.median(history_vals)
    bound = factor * med + slack
    assert measured <= bound, (
        f"flagship regression: measured {measured:.3f}s exceeds "
        f"{factor}x history median {med:.3f}s (+{slack}s slack = "
        f"{bound:.3f}s) over {len(history_vals)} recorded runs"
    )
    return bound


class TestGuardLogic:
    def test_planted_3x_slowdown_fails(self):
        """A planted 3x sleep must trip the guard."""
        hist = [1.2, 1.1, 1.3, 1.25]
        with pytest.raises(AssertionError, match="flagship regression"):
            check_guard(hist, 3 * statistics.median(hist) + 1.0)

    def test_within_noise_passes(self):
        hist = [1.2, 1.1, 1.3, 1.25]
        check_guard(hist, 1.8)

    def test_median_robust_to_one_contended_entry(self):
        """One contended history entry (the r10 artifact) must not
        inflate the bound enough to hide a 3x regression forever, nor
        deflate a healthy measurement into failure."""
        hist = [1.2, 1.1, 7.6]  # r10-shaped history
        check_guard(hist, 2.0)
        with pytest.raises(AssertionError):
            check_guard(hist, 3 * 1.2 + 2.0)


class TestControlSet:
    def test_expensive_tail_in_control_set(self):
        """VERDICT r11 #6: the fresh-session control block must cover
        the expensive non-streaming tail, not just the flagship diffs —
        in-session medians for these swung 2-3x on identical code, so
        the control entries are their only contention-free trend line.
        The live guard below iterates the whole control block, so every
        name here is automatically gated once history accrues."""
        sys.path.insert(0, str(REPO))
        import bench

        for name in (
            "dedup_containment",
            "profile_spearman",
            "curate_classifier_train",
            "diff_stats_orders_digest_sparse",
        ):
            assert name in bench.CONTROL
        # every control name must be a registered gate
        for name in bench.CONTROL:
            assert name in bench.ALL_QUERIES, name


class TestMachineHealthProbe:
    def test_probe_fields(self):
        """VERDICT r12 #6: the bench JSON must carry a machine-health
        block (spin-probe ms, load average, steal%) so a degraded-box
        run is machine-flagged instead of judge-inferred. Additions
        only — the probe must not perturb the timing contract."""
        sys.path.insert(0, str(REPO))
        import bench

        h = bench.machine_health()
        assert set(h) == {"spin_ms", "load1", "steal_pct"}
        assert isinstance(h["spin_ms"], float) and 0 < h["spin_ms"] < 60_000
        # load1/steal_pct may be None on exotic platforms; when present
        # they are bounded sane numbers
        if h["load1"] is not None:
            assert 0 <= h["load1"] < 10_000
        if h["steal_pct"] is not None:
            assert 0 <= h["steal_pct"] <= 100

    def test_summary_line_carries_machine_block(self):
        """The emitted summary dict wires the probe in: guard the key so
        a refactor cannot silently drop it from BENCH_r13+ artifacts."""
        src = (REPO / "bench.py").read_text()
        assert '"machine": health,' in src
        assert "health_launch = machine_health()" in src


class TestLiveFlagshipGuard:
    @pytest.fixture(scope="class")
    def control_block(self):
        sf_dir = "/root/testdata/sf0.1"
        if not Path(sf_dir).exists():
            pytest.skip("sf0.1 testdata not present")
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        env.setdefault("SPARK_GRAFT_CPUS", "32")
        # 2 timed reps (after the untimed warm-up) instead of the
        # bench's 3: the 2x-of-history gate is insensitive to the
        # median estimator, and the saved rep keeps the default suite
        # inside the driver's pytest budget (VERDICT r12 #1)
        env["SPARK_GRAFT_CONTROL_REPS"] = "2"
        r = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--control"],
            capture_output=True, text=True, timeout=1200, env=env,
            cwd=str(REPO),
        )
        assert r.returncode == 0, f"control run failed: {r.stderr[-800:]}"
        for line in reversed(r.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)["control"]
        raise AssertionError(f"no control JSON in output: {r.stdout[-400:]}")

    def test_flagships_within_2x_of_history(self, control_block):
        checked = 0
        for name, measured in control_block.items():
            assert measured > 0, f"control query {name} failed"
            hist = flagship_history(name)
            if len(hist) < 2:
                continue  # too little history to gate on
            check_guard(hist, measured)
            checked += 1
        assert checked >= 1, "no flagship had enough history to check"
