"""A/B bench: exact-Laplacian engines inside the E4 train step (TPU).

Times the gate-passing E4 config's fused train step with
(a) the forward-Laplacian engine (ops/forward_laplacian.py),
(b) the round-2 vmapped nested-JVP path, and
(c) the FD-0.1 stencil for reference.
One JSON line; run with the TPU free (one TPU process at a time).
"""
import json
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402  (repo-root bench.py: config + timing pattern)


def main():
    fwd = bench.bench_jax_e4("forward")
    jvp = bench.bench_jax_e4("jvp")
    print(json.dumps({
        "metric": "hydrogen2d_L16_bs512_E4_lap_engine_steps_per_sec",
        "forward": round(fwd, 2),
        "jvp": round(jvp, 2),
        "speedup": round(fwd / jvp, 3),
        "unit": "steps/sec",
    }), flush=True)

    # 3D probe (H3D top-14 flagship config): the forward engine's edge
    # grows with D — (D+2) vs ~(4D+1) tower passes
    bench.NDIM, bench.NEIGS = 3, 14
    bench.ENVELOPES = tuple(1.0 / (2 * (n + 1)) for n in range(3))
    fwd3 = bench.bench_jax_e4("forward")
    jvp3 = bench.bench_jax_e4("jvp")
    print(json.dumps({
        "metric": "hydrogen3d_L14_bs512_lap_engine_steps_per_sec",
        "forward": round(fwd3, 2),
        "jvp": round(jvp3, 2),
        "speedup": round(fwd3 / jvp3, 3),
        "unit": "steps/sec",
    }), flush=True)


if __name__ == "__main__":
    main()
