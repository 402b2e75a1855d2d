"""Reconstruct log/r5/fp/fp1d.result.json from the committed measurement
log (log/r5/fp_validate.log, run of 2026-08-19 03:36 UTC).

The host restarted at 06:14 and restored the workspace from git: the
fp1d 50k plain-protocol row finished and its numbers are in the committed
log, but the .result.json the validator uses to skip finished rows was
not committed.  Re-deriving the FD spectrum exactly (deterministic dense
eigendecomposition) and lifting the learned values from the log avoids
burning ~45 min of the single host core re-measuring a measured row.

The reconstructed file is labeled as such; rel-errs are recomputed from
the exact FD values and the log's learned values and must match the log's
printed rel-grp to 1e-4 (asserted below).
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from validate_fokker_planck import fd_fp_spectrum_1d  # noqa: E402

OUT = os.environ.get("NS_FP_OUT", "log/r5/fp")

# from log/r5/fp_validate.log (printed at 5-6 significant decimals)
LEARNED_MINUS_SHIFT = [-8.00000e-05, -1.09006e+00, -1.11276e+00,
                       -3.73862e+00, -3.75225e+00, -4.76109e+00,
                       -4.78755e+00]
LOG_REL_GRP = [7.00000e-06, 2.50800e-03, 2.50800e-03, 5.25910e-02,
               5.25910e-02, 2.28721e+00, 2.27327e+00]
MAX_OFF_CORR = 0.9395
N_SPURIOUS = 3
ITERS = 50_000
GROUPS = [1, 2, 2, 2]


def main():
    top = int(np.sum(GROUPS))
    gt = fd_fp_spectrum_1d(k=top)
    assert abs(gt[0]) < 2e-4
    gt[0] = 0.0
    shift = float(np.ceil(-gt[top - 1] + 1.0))

    # sanity: recompute the grouped rel-err for the HEALTHY groups (the
    # collapse-aware eval falls back to per-mode rel on groups holding
    # spurious modes — here the last shell — so those two values are
    # taken from the log as printed): |group_mean(learned) - gt| / gt on
    # the shifted spectrum
    learned = np.array(LEARNED_MINUS_SHIFT) + shift
    gts = gt + shift
    rel = np.empty(top)
    i = 0
    for g in GROUPS:
        lm, gm = learned[i:i + g].mean(), gts[i:i + g].mean()
        rel[i:i + g] = abs(lm - gm) / abs(gm)
        i += g
    assert np.allclose(rel[:5], LOG_REL_GRP[:5], atol=2e-4), (
        rel, LOG_REL_GRP)

    row = {
        "fd_eigvals": [round(float(v), 6) for v in gt],
        "learned_minus_shift": [round(float(v), 6)
                                for v in LEARNED_MINUS_SHIFT],
        "rel_err_grouped_vs_fd": [round(float(v), 6) for v in LOG_REL_GRP],
        "lambda0_abs_err": round(abs(LEARNED_MINUS_SHIFT[0]), 8),
        "max_off_corr": MAX_OFF_CORR,
        "n_spurious": N_SPURIOUS,
        "iters": ITERS, "shift": shift,
        "reconstructed_from": ("log/r5/fp_validate.log (fp1d 50k run of "
                               "2026-08-19 03:36 UTC; host restart 06:14 "
                               "lost the uncommitted result file)"),
    }
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "fp1d.result.json"), "w") as f:
        json.dump(row, f)
    print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
