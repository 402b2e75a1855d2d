"""Round-5 restart hardening of the north-star harness.

The host can restart mid-round and restore the workspace from git
(observed 2026-08-19 06:14 — a 2.4h flagship run lost uncommitted), so
the harness emits mid-run partial eval rows (NS_EVAL_EVERY) that the log
autocommitter persists, and stops early once the grouped gate criterion
is met (NS_GATE).  Env is read at import time: each config runs in a
subprocess (same pattern as test_northstar_methods).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_ENV = {
    "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
    "NS_NEIGS": "1", "NS_BATCH": "32", "NS_CHUNK": "10",
    "NS_EVAL_ROUNDS": "2", "NS_FMAP": "32",
}


def _run(iters, extra_env):
    env = dict(os.environ)
    env.update(BASE_ENV)
    env.update(extra_env)
    r = subprocess.run(
        [sys.executable, "scripts/validate_northstar.py", str(iters), "-1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (
        f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}")
    recs = [json.loads(ln) for ln in r.stdout.splitlines()
            if ln.startswith("{")]
    return r.stdout, recs


def test_partial_rows_emitted_and_labeled():
    out, recs = _run(60, {"NS_EVAL_EVERY": "20"})
    partial = [r for r in recs if "partial_at_iter" in r]
    # evals at 20 and 40 (60 == num_iters is the final eval, not partial)
    assert [p["partial_at_iter"] for p in partial] == [20, 40]
    for p in partial:
        assert p["metric"] == "hydrogen2d_L1_eigval_max_rel_err_grouped"
        assert "value" in p and "n_spurious_modes" in p
        assert "method" not in p  # only the FINAL row carries "method":
        # the queue's done-marker greps distinguish partial from final
    final = recs[-1]
    assert final["method"] == "nestedlora"
    assert final["num_iters"] == 60


def test_gate_early_stop_truncates_budget():
    # an L=1 run is nowhere near 1e-3 after 20 iters, so gate=1e9 always
    # fires at the FIRST partial eval; the final JSON must report the true
    # (truncated) budget and a steps/s computed from steps actually run
    out, recs = _run(100, {"NS_EVAL_EVERY": "20", "NS_GATE": "1e9"})
    assert "early stop" in out
    final = recs[-1]
    assert final["num_iters"] == 20
    assert final["train_steps_per_sec"] > 0
    partial = [r for r in recs if "partial_at_iter" in r]
    assert len(partial) == 1  # stopped at the first milestone


def test_corrupt_checkpoint_degrades_to_fresh_start(tmp_path):
    # load_resumable must warn-and-restart on an unreadable snapshot
    # (orbax force=True deletes the old tree before writing — a kill in
    # the write window leaves a partial dir), never crash-loop the queue
    ck = tmp_path / "broken.ckpt"
    ck.mkdir()
    (ck / "checkpoint").write_text("not an orbax tree")
    out, recs = _run(20, {"NS_CKPT": str(ck), "NS_CKPT_EVERY": "1"})
    assert "unreadable checkpoint" in out
    assert recs[-1]["resumed_at_iter"] == 0
    # ...and the run then OVERWRITES it with a valid one: resume works
    out2, recs2 = _run(40, {"NS_CKPT": str(ck), "NS_CKPT_EVERY": "1"})
    assert recs2[-1]["resumed_at_iter"] == 20
