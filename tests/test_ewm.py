"""EWM monitor: outlier-robust averaging + blow-up arming/decay."""
import numpy as np

from neuralsvd_tpu.training.ewm import EWMAverage, EWMMonitor, STAT_INDEX


def test_ewm_average_rejects_transient_outliers(rng):
    ewm = EWMAverage(init=5, outlier=3.0, outlier_maxlen=3)
    for _ in range(50):
        ewm.update(np.array([1.0 + 0.01 * rng.normal()]))
    mean_before = float(ewm.mean[0])
    out = ewm.update(np.array([100.0]))  # single spike
    assert bool(out[0])                  # flagged as outlier
    assert abs(float(ewm.mean[0]) - mean_before) < 1e-6  # not absorbed
    # persistent level shift IS eventually absorbed (outlier_maxlen cap)
    for _ in range(10):
        ewm.update(np.array([100.0]))
    assert float(ewm.mean[0]) > 10.0


def test_ewm_monitor_arms_and_clears_blowup(rng):
    mon = EWMMonitor(stat_outlier=6, blowup_maxlen=5, blowup_thre=0.5)
    for _ in range(60):
        mon.update(1.0 + 0.05 * rng.normal(size=256))
    assert not mon.blowup
    # sudden regime change: most percentile stats become outliers at once
    for _ in range(3):
        mon.update(5.0 + 0.05 * rng.normal(size=256))
    assert mon.blowup and "indicator" in mon.blowup
    # back to normal: blowup state decays after blowup_maxlen quiet steps
    for _ in range(40):
        mon.update(1.0 + 0.05 * rng.normal(size=256))
    assert not mon.blowup


def test_ewm_monitor_mean_of(rng):
    mon = EWMMonitor()
    for _ in range(100):
        mon.update(2.0 + 0.1 * rng.normal(size=512))
    mean, stderr = mon.mean_of("mean")
    assert abs(mean - 2.0) < 0.05 and stderr < 0.05
    med, _ = mon.mean_of("med")
    assert abs(med - 2.0) < 0.05
    assert set(STAT_INDEX) == {"-3s", "-2s", "-1s", "med", "+1s", "+2s",
                               "+3s", "mean", "mean_slow"}
