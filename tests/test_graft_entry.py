"""Regression: the driver invokes dryrun_multichip from a bare process whose
backend has one device (MULTICHIP_r01 failure mode).  The entry must
self-provision a virtual CPU mesh via subprocess re-exec."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the axon TPU plugin out
    env.pop("XLA_FLAGS", None)  # driver-like: no forced device count
    return env


def test_dryrun_multichip_self_provisions_from_one_device():
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; assert len(jax.devices()) == 1; "
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=_driver_env(), capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
