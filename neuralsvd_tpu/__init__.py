"""neuralsvd_tpu — a TPU-native (JAX/XLA/Pallas) spectral-learning framework.

Re-implements the capabilities of the NeuralSVD reference (ICML 2024,
"Operator SVD with Neural Networks via Nested Low-Rank Approximation")
as a from-scratch JAX library designed for TPU:

- ``ops``        — nesting masks and custom-VJP loss kernels (the L0 numerics)
- ``methods``    — NestedLoRA / SpIN / SpINx / NeuralEF / Nystrom behind one API
- ``operators``  — differential operators, Hamiltonians, analytic ground truths
- ``models``     — eigenfunction networks (MLP / ParallelMLP / two-tower)
- ``parallel``   — device mesh + sharding helpers (DP over batch, TP over modes)
- ``training``   — jitted train step, optimizers, EMA, monitors, checkpoints
- ``data``       — samplers and the Sketchy CDK data pipeline
- ``eval``       — spectrum estimation, retrieval metrics, subspace distances
"""

__version__ = "0.1.0"
