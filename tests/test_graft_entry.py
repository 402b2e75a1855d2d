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


# ---- round-3 regression: MULTICHIP_r03 rc=124 ----
# With the axon relay dead, jax.devices() in the CALLER's process blocks
# forever inside backend init; dryrun_multichip must never probe the
# caller's backend and must bound the guarded subprocess with a timeout.

def _load_entry_module():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
        return g
    finally:
        sys.path.remove(REPO)


def test_dryrun_never_probes_caller_backend(monkeypatch):
    """Simulates the blocked-backend path: jax.devices() hangs (here:
    raises) when the relay is down.  dryrun_multichip must not call it."""
    g = _load_entry_module()

    def _blocked(*a, **k):
        raise AssertionError(
            "dryrun_multichip probed the caller's backend (would hang "
            "forever with the axon relay down — MULTICHIP_r03 regression)")

    monkeypatch.setattr(g.jax, "devices", _blocked)
    seen = {}

    def _fake_run(cmd, env=None, **kw):
        seen["env"] = env
        seen["timeout"] = kw.get("timeout")
        return subprocess.CompletedProcess(cmd, 0, stdout="", stderr="")

    monkeypatch.setattr(g.subprocess, "run", _fake_run)
    g.dryrun_multichip(8)  # must not raise, must not probe
    # the guarded subprocess must be axon-proof and bounded
    assert seen["env"]["JAX_PLATFORMS"] == "cpu"
    assert seen["env"]["PALLAS_AXON_POOL_IPS"] == ""
    assert "--xla_force_host_platform_device_count=8" in seen["env"]["XLA_FLAGS"]
    assert seen["timeout"] and seen["timeout"] <= 3600


def test_dryrun_subprocess_timeout_raises(monkeypatch):
    g = _load_entry_module()

    def _hang(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0),
                                        output=b"partial")

    monkeypatch.setattr(g.subprocess, "run", _hang)
    try:
        g.dryrun_multichip(8)
    except RuntimeError as e:
        assert "timed out" in str(e)
    else:
        raise AssertionError("expected RuntimeError on subprocess timeout")


def test_dryrun_subprocess_failure_raises(monkeypatch):
    g = _load_entry_module()
    monkeypatch.setattr(
        g.subprocess, "run",
        lambda cmd, **kw: subprocess.CompletedProcess(
            cmd, 7, stdout="out", stderr="boom"))
    try:
        g.dryrun_multichip(8)
    except RuntimeError as e:
        assert "rc=7" in str(e) and "boom" in str(e)
    else:
        raise AssertionError("expected RuntimeError on subprocess failure")
