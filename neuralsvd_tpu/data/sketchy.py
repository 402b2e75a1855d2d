"""Sketchy Extended data pipeline on precomputed VGG features.

Loads per-split npz feature files (features/classes/paths) and serves
class-balanced random (sketch, photo) pairs per batch — each batch draws one
sketch and one photo from the same class, cycling over a shuffled class
list.  Reference: examples/cdk/sketchy/data.py:18-111.

The offline VGG16 feature-extraction step of the reference
(data.py:141-236) requires the raw Sketchy images + pretrained torch
weights; ``extract_features_main`` mirrors it behind a lazy torch import.
"""
from __future__ import annotations

import os
import random
from collections import defaultdict

import numpy as np


def load_sketchy_features(root_path: str, split, train_or_test: str,
                          data_type: str):
    assert train_or_test in ("train", "test", "valid")
    assert data_type in ("sketch", "photo")
    path = os.path.join(root_path, "data", "SketchyVGG", f"split{split}",
                        f"{train_or_test}_{data_type}.npz")
    loaded = np.load(path, allow_pickle=True)
    features = loaded["features"]
    paths = loaded["paths"]
    classes = loaded["classes"]
    idx_per_class = defaultdict(list)
    for i, p in enumerate(paths.tolist()):
        idx_per_class[p.split("/")[-2]].append(i)
    return features, classes, paths, idx_per_class


class SketchyVGGDataLoader:
    """Iterator over class-balanced (sketch, photo, class) batches.

    Pair selection runs in the native C++ sampler (data/native.py) when a
    compiler is available — the per-batch Python loop is the host-side
    bottleneck at batch 4096 — with a pure-Python fallback (note: the two
    paths draw from different RNG streams)."""

    def __init__(self, batch_size: int, root_path: str = "..", split=1,
                 train_or_test: str = "train", seed: int = 0,
                 use_native: bool = True):
        self.batch_size = batch_size
        self.root_path = root_path
        self.split = split
        self.train_or_test = train_or_test
        self._rng = random.Random(seed)

        (self.sketch_features, self.sketch_classes, self.sketch_paths,
         self.sketch_idx_per_class) = load_sketchy_features(
            root_path, split, train_or_test, "sketch")
        (self.photo_features, self.photo_classes, self.photo_paths,
         self.photo_idx_per_class) = load_sketchy_features(
            root_path, split, train_or_test, "photo")

        assert set(self.sketch_classes.tolist()) == set(
            self.photo_classes.tolist())
        self.classes = sorted(set(self.sketch_classes.tolist()))
        self.cls_to_num = {c: i for i, c in enumerate(self.classes)}
        self.max_steps = int(np.ceil(self.sketch_features.shape[0]
                                     / batch_size))
        self._native = None
        self._counter = 0
        if use_native:
            try:
                from neuralsvd_tpu.data.native import NativePairSampler
                self._native = NativePairSampler(
                    self.sketch_idx_per_class, self.photo_idx_per_class,
                    self.classes, seed=seed)
            except (RuntimeError, OSError):
                self._native = None

    def __len__(self):
        return self.sketch_features.shape[0]

    def __iter__(self):
        self._step = 0
        return self

    def __next__(self):
        if self._step >= self.max_steps:
            raise StopIteration
        self._step += 1
        si, pi, cls = self._pick_random_pairs()
        return (self.sketch_features[si].astype(np.float32),
                self.photo_features[pi].astype(np.float32),
                cls)

    def _pick_random_pairs(self):
        if self._native is not None:
            self._counter += 1
            return self._native.sample(self.batch_size, self._counter)
        classes = list(self.classes)
        self._rng.shuffle(classes)
        sketch_idx, photo_idx, cls_nums = [], [], []
        i = 0
        while len(sketch_idx) < self.batch_size:
            cls = classes[i % len(classes)]
            i += 1
            sketch_idx.append(self._rng.choice(self.sketch_idx_per_class[cls]))
            photo_idx.append(self._rng.choice(self.photo_idx_per_class[cls]))
            cls_nums.append(self.cls_to_num[cls])
        return (np.asarray(sketch_idx), np.asarray(photo_idx),
                np.asarray(cls_nums))


class ArrayPairLoader:
    """In-memory paired loader with the same interface (for tests/synthetic
    CDK problems): yields (x, y, cls) batches from aligned arrays."""

    def __init__(self, x, y, cls, batch_size: int, seed: int = 0,
                 shuffle: bool = True):
        self.x = np.asarray(x, np.float32)
        self.y = np.asarray(y, np.float32)
        self.cls = np.asarray(cls)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.max_steps = int(np.ceil(len(self.x) / batch_size))
        # retrieval-eval compatibility
        self.sketch_features = self.x
        self.photo_features = self.y
        self.sketch_classes = self.cls
        self.photo_classes = self.cls

    def __len__(self):
        return len(self.x)

    def __iter__(self):
        order = (self._rng.permutation(len(self.x)) if self.shuffle
                 else np.arange(len(self.x)))
        for i in range(self.max_steps):
            idx = order[i * self.batch_size:(i + 1) * self.batch_size]
            yield self.x[idx], self.y[idx], self.cls[idx]


def split_classes(classes, split: str, eccv_test_classes=None):
    """Zero-shot class split -> dict(train/test/valid class arrays).

    ``split`` is "1" / "1_<seed>" (random 80/20 per Shen et al., CVPR 2018,
    seeded with 0 as in the reference) or "2" / "2_<seed>" (fixed ECCV-2018
    test classes, passed in via ``eccv_test_classes``).  "<seed>" carves a
    10% validation subset out of the training classes.
    Reference: examples/cdk/sketchy/data.py:170-199.
    """
    classes = sorted(classes)
    if split.startswith("1"):
        rng = np.random.RandomState(0)
        train = rng.choice(classes, int(0.8 * len(classes)), replace=False)
        test = np.setdiff1d(classes, train)
    elif split.startswith("2"):
        if eccv_test_classes is None:
            raise ValueError("split 2 needs the ECCV-2018 test-class list "
                             "(test_split_eccv2018.txt)")
        test = np.asarray(sorted(eccv_test_classes))
        train = np.setdiff1d(classes, test)
    else:
        raise NotImplementedError(split)
    valid = np.asarray([], dtype=train.dtype)
    if "_" in split:
        rng = np.random.RandomState(int(split.split("_")[-1]))
        valid = rng.choice(train, int(0.1 * len(train)), replace=False)
        train = np.setdiff1d(train, valid)
    return {"train": train, "test": test, "valid": valid}


def make_vgg_feature_extractor(checkpoint_path=None, state_dict_key=None):
    """VGG16 trunk + 512-d projection head (torch, offline path).

    Loads the reference-format checkpoint when given (a dict holding the
    tower's state_dict under ``state_dict_key``).  Reference:
    examples/cdk/sketchy/data.py:114-129.
    """
    import torch
    from torch import nn
    from torchvision import models

    base = models.vgg16(weights=None)
    model = nn.Sequential()
    model.features = base.features
    model.classifier = nn.Sequential(
        *list(base.classifier.children())[:-1], nn.Linear(4096, 512))

    class _Feats(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = model.features
            self.classifier = model.classifier

        def forward(self, x):
            h = self.features(x)
            return self.classifier(h.reshape(h.size(0), -1))

    net = _Feats()
    if checkpoint_path is not None:
        ckpt = torch.load(checkpoint_path, map_location="cpu")
        net.load_state_dict(ckpt[state_dict_key] if state_dict_key else ckpt)
    net.eval()
    return net


def extract_split_features(model, dataset, class_subset, batch_size: int = 64,
                           device: str = "cpu"):
    """Run ``model`` over the images of ``dataset`` whose class is in
    ``class_subset``; returns (features, classes, paths) numpy arrays.

    ``dataset`` follows the torchvision ImageFolder protocol: ``.classes``,
    ``.samples`` (path, class_idx) and indexing -> (tensor, class_idx).
    """
    import torch

    subset = set(np.asarray(class_subset).tolist())
    keep = [i for i, (_, ci) in enumerate(dataset.samples)
            if dataset.classes[ci] in subset]
    feats, classes, paths = [], [], []
    model = model.to(device)
    with torch.no_grad():
        for s in range(0, len(keep), batch_size):
            idx = keep[s:s + batch_size]
            batch = torch.stack([dataset[i][0] for i in idx]).to(device)
            feats.append(model(batch).cpu().numpy())
            classes.extend(dataset.classes[dataset.samples[i][1]] for i in idx)
            paths.extend(dataset.samples[i][0] for i in idx)
    features = (np.concatenate(feats, axis=0) if feats
                else np.zeros((0, 512), np.float32))
    return features, np.asarray(classes), np.asarray(paths)


def invert_image(x):
    """Sketch-domain transform: white-on-black -> black-on-white."""
    return 1 - x


def extract_features_main(root: str, split: str = "1", image_size: int = 224,
                          batch_size: int = 64, device: str = "cpu",
                          model_factory=make_vgg_feature_extractor,
                          dataset_factory=None):
    """Offline feature extraction: both VGG towers over the Sketchy image
    folders -> {split}/{phase}_{type}.npz consumed by SketchyVGGDataLoader.

    Expects the reference layout under ``root/data/Sketchy``: image folders
    ``sketch/tx_000000000000`` and ``extended_photo``, pretrained tower
    checkpoints under ``pretrained/``, and ``test_split_eccv2018.txt`` for
    split 2.  ``model_factory``/``dataset_factory`` are injectable for
    tests.  Reference: examples/cdk/sketchy/data.py:141-236.
    """
    path_sketchy = os.path.join(root, "data", "Sketchy")
    if dataset_factory is None:
        # torchvision only needed for the raw-image path (not bundled in
        # the TPU image; tests inject dataset_factory instead)
        from torchvision import transforms
        from torchvision.datasets import ImageFolder

        t_sketch = transforms.Compose([
            transforms.Resize((image_size, image_size)),
            transforms.ToTensor(), invert_image])
        t_photo = transforms.Compose([
            transforms.Resize((image_size, image_size)),
            transforms.ToTensor()])
        datasets = {
            "sketch": ImageFolder(os.path.join(
                path_sketchy, "sketch", "tx_000000000000"), t_sketch),
            "photo": ImageFolder(os.path.join(
                path_sketchy, "extended_photo"), t_photo),
        }
        models_ = {
            "sketch": model_factory(
                os.path.join(path_sketchy, "pretrained", "vgg16_sketch.pth"),
                "state_dict_sketch"),
            "photo": model_factory(
                os.path.join(path_sketchy, "pretrained", "vgg16_photo.pth"),
                "state_dict_image"),
        }
    else:
        datasets, models_ = dataset_factory()

    assert set(datasets["sketch"].classes) == set(datasets["photo"].classes)
    eccv = None
    if split.startswith("2"):
        with open(os.path.join(path_sketchy, "test_split_eccv2018.txt")) as fp:
            eccv = fp.read().splitlines()
    subsets = split_classes(datasets["sketch"].classes, split, eccv)

    out_dir = os.path.join(root, "data", "SketchyVGG", f"split{split}")
    os.makedirs(out_dir, exist_ok=True)
    for data_type in ("sketch", "photo"):
        for phase in ("train", "test", "valid"):
            features, classes, paths = extract_split_features(
                models_[data_type], datasets[data_type], subsets[phase],
                batch_size=batch_size, device=device)
            np.savez_compressed(
                os.path.join(out_dir, f"{phase}_{data_type}.npz"),
                features=features, classes=classes, paths=paths)
    return out_dir
