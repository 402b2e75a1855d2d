"""ResNet family for image-based eigenfunction/SSL experiments.

Functional JAX counterparts of the reference's torchvision-adapted ResNet
(examples/models/resnet.py), CIFAR ResNet-20/32/44/56 (resnet_nef.py) and
WideResNet (wide_resnet_nef.py).  These back the paper's image experiments;
the shipped PDE/CDK entry points don't call them (SURVEY §2.4 marks them
vestigial) but they complete the model zoo.

Conventions: NHWC layout (TPU-native), conv via lax.conv_general_dilated,
BatchNorm running stats carried in an explicit ``state`` pytree:

    init(key) -> (params, state)
    apply(params, state, x, train=False) -> (out, new_state)
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _conv(params, x, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_init(key, k, cin, cout):
    fan_in = k * k * cin
    std = math.sqrt(2.0 / fan_in)
    return {"w": std * jax.random.normal(key, (k, k, cin, cout), jnp.float32)}


def _bn_init(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def _bn_apply(params, state, x, train: bool, momentum=0.9, eps=1e-5):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        new_state = {"mean": momentum * state["mean"] + (1 - momentum) * mean,
                     "var": momentum * state["var"] + (1 - momentum) * var}
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean) * inv * params["scale"] + params["bias"]
    return out, new_state


def _basic_block(key, cin, cout, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": _conv_init(k1, 3, cin, cout),
         "conv2": _conv_init(k2, 3, cout, cout)}
    bn1p, bn1s = _bn_init(cout)
    bn2p, bn2s = _bn_init(cout)
    p["bn1"], p["bn2"] = bn1p, bn2p
    s = {"bn1": bn1s, "bn2": bn2s}
    if stride != 1 or cin != cout:
        p["down"] = _conv_init(k3, 1, cin, cout)
        bnp, bns = _bn_init(cout)
        p["bn_down"] = bnp
        s["bn_down"] = bns
    return p, s, stride


def _basic_block_apply(p, s, x, stride, train):
    out = _conv(p["conv1"], x, stride)
    out, s1 = _bn_apply(p["bn1"], s["bn1"], out, train)
    out = jax.nn.relu(out)
    out = _conv(p["conv2"], out, 1)
    out, s2 = _bn_apply(p["bn2"], s["bn2"], out, train)
    if "down" in p:
        sc = _conv(p["down"], x, stride)
        sc, sd = _bn_apply(p["bn_down"], s["bn_down"], sc, train)
        new_s = {"bn1": s1, "bn2": s2, "bn_down": sd}
    else:
        sc = x
        new_s = {"bn1": s1, "bn2": s2}
    return jax.nn.relu(out + sc), new_s


def make_resnet(depth_blocks: Sequence[int] = (2, 2, 2, 2), width: int = 64,
                num_outputs: int = 0, cifar_stem: bool = False,
                in_channels: int = 3):
    """torchvision-style ResNet (BasicBlock).  depth_blocks=(2,2,2,2) is
    ResNet-18; (3,4,6,3) is ResNet-34.  ``cifar_stem`` uses the 3x3 stem
    without max-pool (reference: examples/models/resnet.py CIFAR variant).
    ``num_outputs=0`` returns pooled features (backbone mode)."""
    widths = [width * 2 ** i for i in range(len(depth_blocks))]
    strides = [2 if (b == 0 and stage > 0) else 1
               for stage, n in enumerate(depth_blocks) for b in range(n)]

    def init(key):
        keys = jax.random.split(key, 2 + sum(depth_blocks))
        ki = iter(keys)
        stem_k = 3 if cifar_stem else 7
        params = {"stem": _conv_init(next(ki), stem_k, in_channels, width)}
        bnp, bns = _bn_init(width)
        params["bn_stem"] = bnp
        state = {"bn_stem": bns}
        params["blocks"], state["blocks"] = [], []
        cin = width
        for stage, (n, cout) in enumerate(zip(depth_blocks, widths)):
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                p, s, _ = _basic_block(next(ki), cin, cout, stride)
                params["blocks"].append(p)
                state["blocks"].append(s)
                cin = cout
        if num_outputs:
            fan_in = widths[-1]
            bound = math.sqrt(1.0 / fan_in)
            params["head"] = {
                "w": jax.random.uniform(next(ki), (fan_in, num_outputs),
                                        minval=-bound, maxval=bound),
                "b": jnp.zeros((num_outputs,))}
        return params, state

    def apply(params, state, x, train: bool = False):
        out = _conv(params["stem"], x, 1 if cifar_stem else 2)
        out, bns = _bn_apply(params["bn_stem"], state["bn_stem"], out, train)
        out = jax.nn.relu(out)
        if not cifar_stem:
            out = jax.lax.reduce_window(
                out, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "SAME")
        new_blocks = []
        for p, s, st in zip(params["blocks"], state["blocks"], strides):
            out, ns = _basic_block_apply(p, s, out, st, train)
            new_blocks.append(ns)
        feats = jnp.mean(out, axis=(1, 2))  # global average pool
        if "head" in params:
            feats = feats @ params["head"]["w"] + params["head"]["b"]
        return feats, {"bn_stem": bns, "blocks": new_blocks}

    return init, apply


def make_cifar_resnet(depth: int = 20, num_outputs: int = 0, width: int = 16):
    """CIFAR ResNet-20/32/44/56 (3 stages of n blocks, n=(depth-2)/6).

    Reference: examples/models/resnet_nef.py."""
    assert (depth - 2) % 6 == 0, "depth must be 6n+2"
    n = (depth - 2) // 6
    widths = [width, 2 * width, 4 * width]
    strides = [2 if (b == 0 and stage > 0) else 1
               for stage in range(3) for b in range(n)]

    def init(key):
        keys = jax.random.split(key, 2 + 3 * n)
        ki = iter(keys)
        params = {"stem": _conv_init(next(ki), 3, 3, width)}
        bnp, bns = _bn_init(width)
        params["bn_stem"] = bnp
        state = {"bn_stem": bns}
        params["blocks"], state["blocks"] = [], []
        cin = width
        for stage, cout in enumerate(widths):
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                p, s, _ = _basic_block(next(ki), cin, cout, stride)
                params["blocks"].append(p)
                state["blocks"].append(s)
                cin = cout
        if num_outputs:
            bound = math.sqrt(1.0 / widths[-1])
            params["head"] = {
                "w": jax.random.uniform(next(ki), (widths[-1], num_outputs),
                                        minval=-bound, maxval=bound),
                "b": jnp.zeros((num_outputs,))}
        return params, state

    def apply(params, state, x, train: bool = False):
        out = _conv(params["stem"], x, 1)
        out, bns = _bn_apply(params["bn_stem"], state["bn_stem"], out, train)
        out = jax.nn.relu(out)
        new_blocks = []
        for p, s, st in zip(params["blocks"], state["blocks"], strides):
            out, ns = _basic_block_apply(p, s, out, st, train)
            new_blocks.append(ns)
        feats = jnp.mean(out, axis=(1, 2))
        if "head" in params:
            feats = feats @ params["head"]["w"] + params["head"]["b"]
        return feats, {"bn_stem": bns, "blocks": new_blocks}

    return init, apply


def make_wide_resnet(depth: int = 28, widen: int = 2, num_outputs: int = 0):
    """WideResNet-depth-widen (reference: examples/models/wide_resnet_nef.py)
    — the CIFAR ResNet topology with widened channels."""
    assert (depth - 4) % 6 == 0, "depth must be 6n+4"
    n = (depth - 4) // 6
    widths = [16, 16 * widen, 32 * widen, 64 * widen]
    strides = [2 if (b == 0 and stage > 0) else 1
               for stage in range(3) for b in range(n)]

    def init(key):
        keys = jax.random.split(key, 2 + 3 * n)
        ki = iter(keys)
        params = {"stem": _conv_init(next(ki), 3, 3, widths[0])}
        bnp, bns = _bn_init(widths[0])
        params["bn_stem"] = bnp
        state = {"bn_stem": bns}
        params["blocks"], state["blocks"] = [], []
        cin = widths[0]
        for stage, cout in enumerate(widths[1:]):
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                p, s, _ = _basic_block(next(ki), cin, cout, stride)
                params["blocks"].append(p)
                state["blocks"].append(s)
                cin = cout
        if num_outputs:
            bound = math.sqrt(1.0 / cin)
            params["head"] = {
                "w": jax.random.uniform(next(ki), (cin, num_outputs),
                                        minval=-bound, maxval=bound),
                "b": jnp.zeros((num_outputs,))}
        return params, state

    def apply(params, state, x, train: bool = False):
        out = _conv(params["stem"], x, 1)
        out, bns = _bn_apply(params["bn_stem"], state["bn_stem"], out, train)
        out = jax.nn.relu(out)
        new_blocks = []
        for p, s, st in zip(params["blocks"], state["blocks"], strides):
            out, ns = _basic_block_apply(p, s, out, st, train)
            new_blocks.append(ns)
        feats = jnp.mean(out, axis=(1, 2))
        if "head" in params:
            feats = feats @ params["head"]["w"] + params["head"]["b"]
        return feats, {"bn_stem": bns, "blocks": new_blocks}

    return init, apply


def make_linear_probe(input_dim: int, num_classes: int):
    """Detached linear classifier head (reference: examples/models/builder.py
    LinearProbe)."""

    def init(key):
        bound = math.sqrt(1.0 / input_dim)
        return {"w": jax.random.uniform(key, (input_dim, num_classes),
                                        minval=-bound, maxval=bound),
                "b": jnp.zeros((num_classes,))}

    def apply(params, feats):
        feats = jax.lax.stop_gradient(feats)
        return feats @ params["w"] + params["b"]

    return init, apply
