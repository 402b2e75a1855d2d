"""CDK pipeline tests: retrieval metrics vs hand-computed oracles, and a
synthetic end-to-end two-tower training run through the shared driver."""
import os

import jax.numpy as jnp
import numpy as np

from neuralsvd_tpu.data.sketchy import ArrayPairLoader
from neuralsvd_tpu.eval.retrieval import (
    Retrieval,
    average_precisions,
    get_retrievals,
    precision_at_k,
    top_k_retrievals,
)


def test_top_k_inner_product_matches_numpy(rng):
    Q, N, D = 13, 57, 8
    zx = rng.normal(size=(Q, D)).astype(np.float32)
    zy = rng.normal(size=(N, D)).astype(np.float32)
    idx = top_k_retrievals(zx, zy, K=5, metric="inner_product")
    scores = zx @ zy.T
    expected = np.argsort(-scores, axis=1)[:, :5]
    np.testing.assert_array_equal(idx, expected)


def test_top_k_euclidean_matches_numpy(rng):
    Q, N, D = 9, 31, 4
    zx = rng.normal(size=(Q, D)).astype(np.float32)
    zy = rng.normal(size=(N, D)).astype(np.float32)
    idx = top_k_retrievals(zx, zy, K=3, metric="euclidean")
    d2 = ((zx[:, None] - zy[None]) ** 2).sum(-1)
    expected = np.argsort(d2, axis=1)[:, :3]
    np.testing.assert_array_equal(idx, expected)


def test_precision_and_ap_oracles():
    # query 0: hits at ranks 1 and 3; query 1: no hits
    rel = np.array([[1, 0, 1, 0], [0, 0, 0, 0]], dtype=bool)
    np.testing.assert_allclose(precision_at_k(rel), [0.5, 0.0])
    # AP ver1 with optimistic interpolation:
    # precs = [1, .5, 2/3, .5]; maxprecs = [1, 2/3, 2/3, .5]
    # AP(q0) = (1 + 2/3)/2
    aps = average_precisions(rel, n_relevant_items=np.array([2, 2]), ver=1)
    np.testing.assert_allclose(aps, [(1 + 2 / 3) / 2, 0.0], rtol=1e-6)
    aps2 = average_precisions(rel, n_relevant_items=np.array([2, 2]), ver=2)
    np.testing.assert_allclose(aps2, [(1 + 2 / 3) / 2, 0.0], rtol=1e-6)
    aps3 = average_precisions(rel, n_relevant_items=np.array([2, 2]), ver=3)
    np.testing.assert_allclose(aps3, [(1 + 2 / 3) / 2, 0.0], rtol=1e-6)


def test_perfect_retrieval_scores_one(rng):
    """Class-clustered embeddings give P@K = 1 and mAP = 1."""
    n_cls, per_cls, D = 4, 8, 6
    centers = 10 * rng.normal(size=(n_cls, D))
    cls = np.repeat(np.arange(n_cls), per_cls)
    zx = centers[cls] + 0.01 * rng.normal(size=(len(cls), D))
    zy = centers[cls] + 0.01 * rng.normal(size=(len(cls), D))
    rel, _ = get_retrievals(zx, zy, cls, cls, K=per_cls, metric="euclidean")
    assert precision_at_k(rel).mean() == 1.0


def _make_synth_loaders(rng, n_cls=6, per_cls=30, D=16, batch=64):
    """Correlated (x, y) pairs: class-dependent means + noise."""
    centers_x = 3 * rng.normal(size=(n_cls, D)).astype(np.float32)
    centers_y = 3 * rng.normal(size=(n_cls, D)).astype(np.float32)

    def split(seed):
        r = np.random.default_rng(seed)
        cls = np.repeat(np.arange(n_cls), per_cls)
        x = centers_x[cls] + r.normal(size=(len(cls), D)).astype(np.float32)
        y = centers_y[cls] + r.normal(size=(len(cls), D)).astype(np.float32)
        return ArrayPairLoader(x, y, cls, batch_size=batch, seed=seed)

    return split(1), split(2), split(3)


def test_cdk_end_to_end_synthetic(rng, tmp_path):
    """Two-tower CDK training on synthetic class-correlated pairs improves
    retrieval well above chance and produces the full artifact set."""
    from neuralsvd_tpu.cli.sketchy import get_args, run_training

    train, test, valid = _make_synth_loaders(rng)
    args = get_args([
        "--log_dir", str(tmp_path), "--num_epochs", "3",
        "--batch_size", "64", "--network_dims", "64,16", "--neigs", "16",
        "--optimizer", "adam", "--base_lr", "1e-3", "--mu", "4.0",
        "--n_retrievals", "10", "--return_map_all",
        "--n_retrievals_to_save", "5",
        "--trunc_dims", "4", "8", "-8",
    ])
    params, trunc_results = run_training(args, train, test, valid,
                                         input_dim=16)
    import csv
    logs = [f for f in os.listdir(tmp_path) if f.endswith(".csv")]
    assert logs
    with open(os.path.join(tmp_path, logs[0])) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 3
    final_pk = float(rows[-1]["test_P@K"])
    chance = 1.0 / 6  # 6 balanced classes
    assert final_pk > 2 * chance, f"P@K {final_pk} not above chance"
    assert set(trunc_results) == {4, 8, -8}
    assert os.path.exists(os.path.join(tmp_path, "best_stats.npz"))
    assert os.path.exists(os.path.join(tmp_path, "retrievals_best.npz"))


def test_cdk_end_to_end_bf16_matches_f32_quality(rng, tmp_path):
    """bf16 mixed-precision towers train to the same retrieval quality as
    f32 on the synthetic task (quality guard for --compute_dtype bf16)."""
    import csv

    from neuralsvd_tpu.cli.sketchy import get_args, run_training

    def run(dtype, sub):
        train, test, valid = _make_synth_loaders(rng)
        args = get_args([
            "--log_dir", str(tmp_path / sub), "--num_epochs", "3",
            "--batch_size", "64", "--network_dims", "64,16", "--neigs", "16",
            "--optimizer", "adam", "--base_lr", "1e-3", "--mu", "4.0",
            "--n_retrievals", "10", "--compute_dtype", dtype,
        ])
        run_training(args, train, test, valid, input_dim=16)
        logs = [f for f in os.listdir(tmp_path / sub) if f.endswith(".csv")]
        with open(tmp_path / sub / logs[0]) as fh:
            rows = list(csv.DictReader(fh))
        return float(rows[-1]["test_P@K"])

    pk32 = run("f32", "f32")
    pk16 = run("bf16", "bf16")
    assert pk16 > 2 * (1.0 / 6), f"bf16 P@K {pk16} not above chance"
    assert pk16 > pk32 - 0.1, f"bf16 P@K {pk16} far below f32 {pk32}"


def test_feature_extraction_pipeline(tmp_path, rng):
    """extract_features_main with injected tiny towers/datasets produces npz
    files that SketchyVGGDataLoader can consume end-to-end."""
    import torch

    from neuralsvd_tpu.data.sketchy import (
        SketchyVGGDataLoader,
        extract_features_main,
        split_classes,
    )

    classes = [f"cls{i:02d}" for i in range(10)]

    class FakeDataset:
        def __init__(self, kind):
            self.classes = classes
            self.samples = [(f"/{kind}/{c}/img{j}.png", ci)
                            for ci, c in enumerate(classes) for j in range(6)]
            g = torch.Generator().manual_seed(hash(kind) % (2 ** 31))
            self.data = torch.randn(len(self.samples), 8, generator=g)

        def __getitem__(self, i):
            return self.data[i], self.samples[i][1]

    tower = torch.nn.Linear(8, 16)

    def dataset_factory():
        return ({"sketch": FakeDataset("sketch"), "photo": FakeDataset("photo")},
                {"sketch": tower, "photo": tower})

    out = extract_features_main(str(tmp_path), split="1_7", batch_size=16,
                                dataset_factory=dataset_factory)
    # splits partition the classes: 8 train -> (7 train + ~0-1 valid), 2 test
    subsets = split_classes(classes, "1_7")
    assert set(subsets["train"]) | set(subsets["test"]) | set(
        subsets["valid"]) == set(classes)
    assert not (set(subsets["train"]) & set(subsets["test"]))

    loader = SketchyVGGDataLoader(4, root_path=str(tmp_path), split="1_7",
                                  train_or_test="train", seed=0)
    x, y, cls = next(iter(loader))
    assert x.shape == (4, 16) and y.shape == (4, 16)
    assert set(np.asarray(loader.sketch_classes).tolist()) == set(
        subsets["train"].tolist())


def test_cdk_resume_from_checkpoint(rng, tmp_path):
    """--resume restores params/opt-state/epoch and continues training."""
    from neuralsvd_tpu.cli.sketchy import get_args, run_training

    train, test, valid = _make_synth_loaders(rng)
    base = ["--log_dir", str(tmp_path), "--batch_size", "64",
            "--network_dims", "64,16", "--neigs", "16",
            "--optimizer", "adam", "--base_lr", "1e-3", "--mu", "4.0",
            "--n_retrievals", "10"]
    run_training(get_args(base + ["--num_epochs", "1"]), train, test, valid,
                 input_dim=16)
    import os
    assert os.path.exists(os.path.join(tmp_path, "ckpt"))
    # resume for one more epoch: must not raise and must extend the log
    run_training(get_args(base + ["--num_epochs", "2", "--resume"]),
                 train, test, valid, input_dim=16)
    import csv
    rows = []
    for f in sorted(os.listdir(tmp_path)):
        if f.endswith(".csv"):
            with open(os.path.join(tmp_path, f)) as fh:
                rows.extend(csv.DictReader(fh))
    assert [int(r["epoch"]) for r in rows] == [0, 1]  # resumed at epoch 1


def test_knn_monitor_separable_classes(rng):
    """Weighted kNN top-1 accuracy is ~1 for well-separated class clusters
    and near-chance for random labels (reference: tools/knn_monitor.py)."""
    from neuralsvd_tpu.eval.knn import knn_monitor, knn_predict

    n_cls, per_cls, D = 5, 40, 8
    centers = 8 * rng.normal(size=(n_cls, D)).astype(np.float32)
    labels = np.repeat(np.arange(n_cls), per_cls)
    bank = centers[labels] + 0.1 * rng.normal(size=(len(labels), D))
    test = centers[labels] + 0.1 * rng.normal(size=(len(labels), D))

    preds = knn_predict(test.astype(np.float32), bank.astype(np.float32),
                        labels, num_classes=n_cls, k=10)
    assert (preds == labels).mean() > 0.99

    acc = knn_monitor(lambda x: x, bank, labels, test, labels,
                      num_classes=n_cls, k=10)
    assert acc > 0.99

    shuffled = np.asarray(rng.permutation(labels))
    acc_rand = knn_monitor(lambda x: x, bank, shuffled, test, labels,
                           num_classes=n_cls, k=10)
    assert acc_rand < 0.5


def test_retrieval_trunc_and_perm_controls(rng):
    """Truncation keeps the leading/trailing dims; the random-perm control
    changes which dims are kept (reference trunc sweep, main_sketchy.py:325-358)."""
    n_cls, per_cls, D = 4, 10, 12
    centers = 6 * rng.normal(size=(n_cls, D)).astype(np.float32)
    cls = np.repeat(np.arange(n_cls), per_cls)
    x = (centers[cls] + 0.05 * rng.normal(size=(len(cls), D))).astype(np.float32)
    y = (centers[cls] + 0.05 * rng.normal(size=(len(cls), D))).astype(np.float32)
    loader = ArrayPairLoader(x, y, cls, batch_size=16)
    r = Retrieval(loader, n_retrievals=per_cls)

    ident = lambda v: v
    pk_full, _ = r.evaluate(ident, ident)
    assert pk_full.mean() > 0.9
    # keeping only the first 2 dims must not beat the full embedding
    pk_trunc, _ = r.evaluate(ident, ident, trunc_dim=2)
    assert pk_trunc.mean() <= pk_full.mean() + 1e-9
    # negative truncation keeps the LAST dims
    pk_neg, _ = r.evaluate(ident, ident, trunc_dim=-D)
    np.testing.assert_allclose(pk_neg.mean(), pk_full.mean())
    # a permutation followed by full keep is a no-op
    perm = np.asarray(rng.permutation(D))
    pk_perm, _ = r.evaluate(ident, ident, trunc_dim=D, perm=perm)
    np.testing.assert_allclose(pk_perm.mean(), pk_full.mean())


def test_cdk_step_dce_drops_density_ratio_gram(rng):
    """The hot CDK step must not pay for the (B, B) density-ratio gram:
    excluding rs_* from the jitted outputs lets XLA DCE it (~16x loss-fwd
    FLOPs at B=2048).  Guards against accidentally re-plumbing rs through
    the step."""
    import jax
    import optax

    from neuralsvd_tpu.cli.sketchy import (make_cdk_train_step,
                                           make_density_ratio_fn)
    from neuralsvd_tpu.methods.nestedlora import NestedLoRAForCDK
    from neuralsvd_tpu.models.two_tower import make_hetero_network

    B, D, L = 1024, 8, 16
    init, apply, _ = make_hetero_network(
        input_dim=D, network_dims=[16, L], nonlinearity="lrelu0.2")
    params = init(jax.random.key(0))
    method = NestedLoRAForCDK(apply, neigs=L)
    opt = optax.sgd(1e-2)
    step = make_cdk_train_step(method, opt)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    args = (params, opt.init(params), {}, x, y, jnp.zeros((), jnp.int32))
    flops = step.lower(*args).compile().cost_analysis()["flops"]
    # with the (B,B) gram the loss fwd alone would add ~2*B^2*(L+1) flops
    assert flops < 2 * B * B * (L + 1), f"rs gram not DCE'd: {flops}"

    rs_fn = make_density_ratio_fn(apply, set_first_mode_const=True)
    rs_joint, rs_indep = rs_fn(params, x, y)
    assert rs_joint.shape == (B,)
    assert rs_indep.shape == (B * (B - 1),)
    # matches the loss's own diagnostics
    from neuralsvd_tpu.ops.nestedlora import nestedlora_cdk_loss
    out = nestedlora_cdk_loss(None, True, *apply(params, x, y),
                              method.vector_mask, method.matrix_mask, None)
    np.testing.assert_allclose(np.asarray(rs_joint), np.asarray(out[3]),
                               rtol=1e-5, atol=1e-6)
