"""NS_METHOD lever of the north-star harness (VERDICT r3 item 5): SpIN and
NeuralEF must flow through the IDENTICAL sampler/model/eval stack and emit
the same JSON schema as NestedLoRA.  Env is read at import time, so each
config runs in a subprocess."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_northstar(method, extra_env=None):
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
        "NS_METHOD": method, "NS_NEIGS": "1", "NS_BATCH": "32",
        "NS_CHUNK": "20", "NS_EVAL_ROUNDS": "2", "NS_FMAP": "32",
    })
    env.update(extra_env or {})
    r = subprocess.run(
        [sys.executable, "scripts/validate_northstar.py", "100", "-1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}"
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.parametrize("method,extra", [
    ("spin", {"NS_PARALLEL": "0"}),
    ("neuralef", {}),
])
def test_northstar_method_lever(method, extra):
    rec = _run_northstar(method, extra)
    assert rec["method"] == method
    assert rec["metric"].endswith(f"_{method}")
    import numpy as np
    assert np.isfinite(rec["value"])
    assert rec["config"]["parallel"] == (extra.get("NS_PARALLEL", "1") == "1")


def test_northstar_rejects_nestedlora_levers_for_other_methods():
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
        "NS_METHOD": "spin", "NS_NEIGS": "1", "NS_BATCH": "32",
        "NS_TAIL_LR": "3", "NS_FMAP": "32",
    })
    r = subprocess.run(
        [sys.executable, "scripts/validate_northstar.py", "100", "-1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "NestedLoRA-only" in (r.stderr + r.stdout)
