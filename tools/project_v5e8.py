"""v5e-8 deployment projection from the sharded HLO's collective inventory.

VERDICT r04 task 2: the `<20 s on v5e-8` north-star (BASELINE.md) rested on
`single-chip e2e / 8` with zero cross-chip cost. This tool replaces that
faith with arithmetic, without needing 8 real chips:

1. Build ONE CFG2 denoise step (FlowControlNet + frozen SVD UNet + Euler
   glue — the hot-loop body of pipelines/traj.py) at the FULL deployment
   shape (576x1024, T=25), with the production frame-parallel sharding
   (latents sharded over the 8-way "frames" mesh axis, params replicated).
2. jit-lower + compile it on a virtual 8-device CPU mesh from ABSTRACT
   (ShapeDtypeStruct) args — compilation never executes, so the full shape
   costs no activation memory. The SPMD partitioner materializes the real
   collectives in the optimized HLO.
3. Parse every collective op (all-gather / all-to-all / all-reduce /
   collective-permute) with its per-device result shape -> bytes.
4. Bound the per-step ICI time with a ring model over the frames axis:
   t >= full_bytes x (n-1)/n / BW_ring, and publish
   projected e2e = measured single-chip denoise / 8 + steps x ICI bound
                   + unsharded fixed phases (cmp, encodes, decode/8).

ICI model (documented assumption, v5e): 45 GB/s per link per direction
(jax-ml.github.io/scaling-book v5e numbers); a 1-D ring over 8 chips uses
2 links both directions => 90 GB/s effective ring bandwidth per chip. The
bound charges every gathered byte to ICI (worst case: no compute overlap).

Usage: python tools/project_v5e8.py [--micro] [--out PROJECTION_v5e8.json]
  --micro: lower at 64x64 spatial instead (fast sanity path; bytes are
  then linearly scaled by the spatial-token ratio and the output is
  marked method="micro-scaled").
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the virtual CPU mesh BEFORE any jax import side effects
N_DEV = 8
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

# ---- v5e ICI model ---------------------------------------------------------
ICI_GBPS_PER_LINK_PER_DIR = 45.0e9     # bytes/s, v5e (scaling-book figure)
RING_BW = 2 * ICI_GBPS_PER_LINK_PER_DIR  # 1-D bidirectional ring per chip

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2, "u16": 2,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _result_bytes(line: str, op_kind: str, clamp_f32: bool = False) -> int:
    """Bytes of the op's RESULT shape(s): everything between `=` and the
    `op-kind(` occurrence — handles tuple results (variadic all-gather /
    all-to-all) whose members each carry a shape.

    clamp_f32: count f32 elements at 2 bytes. XLA:CPU computes bf16 dots
    through f32 carriers (the optimized HLO shows explicit
    f32->bf16->f32 convert round-trips feeding these collectives, e.g.
    %fused_computation around the spatial-attention K/V all-gathers), so
    the CPU-lowered inventory moves f32 where the bf16 TPU deployment
    (bench.py/pipelines cast params+activations to bf16; MXU consumes
    bf16 natively) moves bf16. Applied to the activation-movement kinds
    (all-gather / all-to-all / collective-permute) only — all-reduce
    traffic (GroupNorm/LayerNorm statistics, CFG sums) is genuinely fp32
    by design and is counted at full width."""
    rhs = line.split("=", 1)[1]
    cut = rhs.find(op_kind + "(")
    seg = rhs[:cut] if cut >= 0 else rhs.split("(", 1)[0]
    total = 0
    for dt, dims in _SHAPE_RE.findall(seg):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        nbytes = DTYPE_BYTES[dt]
        if clamp_f32 and dt == "f32":
            nbytes = 2
        total += n * nbytes
    return total


def collective_inventory(hlo_text: str, top_n: int = 0):
    """{op_kind: {count, result_bytes}} over the optimized HLO; with
    top_n, also returns the largest individual ops with their op_name
    metadata (the model-site attribution)."""
    kinds = ("all-gather", "all-to-all", "all-reduce", "collective-permute",
             "reduce-scatter")
    inv = {k: {"count": 0, "result_bytes": 0} for k in kinds}
    ops = []
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.search(r"=\s*[^=]*?((?:all-gather|all-to-all|"
                      r"all-reduce|collective-permute|reduce-scatter)"
                      r"(?:-start)?)\(", s)
        if not m:
            continue
        raw = m.group(1)
        kind = raw.replace("-start", "")
        # -done ops carry no new traffic; -start carries the shape
        b = _result_bytes(s, raw, clamp_f32=(kind != "all-reduce"))
        inv[kind]["count"] += 1
        inv[kind]["result_bytes"] += b
        if top_n:
            nm = re.search(r'op_name="([^"]+)"', s)
            ops.append((b, kind, nm.group(1)[-160:] if nm else "?"))
    inv = {k: v for k, v in inv.items() if v["count"]}
    if top_n:
        ops.sort(reverse=True)
        return inv, ops[:top_n]
    return inv


def build_step(h, w, t, dtype=jnp.bfloat16):
    """One CFG2 denoise step at [2, t, h/8, w/8] with hoisted inject —
    mirrors bench.py's step_fn / pipelines/traj.py's scan body."""
    from mofa_tpu.models.svd_unet import (SVDUNetConfig,
                                          UNetSpatioTemporalConditionModel)
    from mofa_tpu.models.mofa_adapter import FlowControlNet
    from mofa_tpu.ops.euler import (make_euler_schedule, scale_model_input,
                                    euler_step)
    from mofa_tpu.core.mesh import make_mesh
    from mofa_tpu.parallel.activation import frame_parallel
    from mofa_tpu.parallel.sharding import constrain_frames

    cfg = SVDUNetConfig()
    unet = UNetSpatioTemporalConditionModel(cfg)
    cn = FlowControlNet(cfg)
    mesh = make_mesh(data=1, frames=N_DEV)

    sched = make_euler_schedule(25)
    sigmas = jnp.asarray(sched.sigmas, jnp.float32)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)

    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, t, h // 8, w // 8, cfg.in_channels), dtype)
    ehs_z = jnp.zeros((1, 1, cfg.cross_attention_dim), dtype)
    ids_z = jnp.zeros((1, 3), dtype)
    cond_z = jnp.zeros((1, h, w, 3), dtype)
    flow_z = jnp.zeros((1, t - 1, h, w, 2), dtype)

    u_shapes = jax.eval_shape(unet.init, key, sample, 1.0, ehs_z, ids_z)
    c_shapes = jax.eval_shape(cn.init, key, sample, 1.0, ehs_z, ids_z,
                              cond_z, flow_z)
    # deployment runs bf16 params (ModelBundle casts on TPU); leaving the
    # eval_shape trees at their fp32 init dtype promoted EVERY activation
    # to f32 in the lowered program and exactly doubled all modeled
    # collective bytes (caught 2026-08-21: the 589.8 MB spatial-attn K/V
    # all-gathers were f32[50,9216,320] — 2x the bf16 deployment's)
    cast_shapes = lambda tree: jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, dtype)
        if jnp.issubdtype(s.dtype, jnp.floating) else s, tree)
    u_shapes, c_shapes = cast_shapes(u_shapes), cast_shapes(c_shapes)
    inj_shapes = jax.eval_shape(
        lambda p, c, f: cn.apply(p, c, f,
                                 method=FlowControlNet.encode_features),
        c_shapes, jax.eval_shape(lambda: jnp.zeros((2, h, w, 3), dtype)),
        jax.eval_shape(lambda: jnp.zeros((2, t - 1, h, w, 2), dtype)))

    guidance = jnp.linspace(1.0, 3.0, t, dtype=jnp.float32)[
        None, :, None, None, None]

    def step(unet_params, cn_params, inject, lat, image_latents,
             image_embeddings, added_time_ids, idx):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mofa_tpu.core.mesh import AXES
        with frame_parallel(mesh):
            # frame-shard the uneven-dim args via constraints (GSPMD
            # handles non-divisible shards; in_shardings would reject
            # T=25 over 8 devices)
            fr0 = NamedSharding(mesh, P(AXES.frames))
            inject = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, fr0), inject)
            image_latents = constrain_frames(image_latents, mesh)
            lat = constrain_frames(lat, mesh)
            sigma, sigma_next, ts = sigmas[idx], sigmas[idx + 1], \
                timesteps[idx]
            latent_in = jnp.concatenate([lat] * 2, axis=0)
            latent_in = scale_model_input(latent_in, sigma).astype(dtype)
            latent_in = jnp.concatenate([latent_in, image_latents], axis=-1)
            down_res, mid_res = cn.apply(
                cn_params, latent_in, ts, image_embeddings, added_time_ids,
                precomputed_features=inject)
            noise_pred = unet.apply(
                unet_params, latent_in, ts, image_embeddings, added_time_ids,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res)
            uncond, cond_p = jnp.split(noise_pred.astype(jnp.float32), 2,
                                       axis=0)
            noise_pred = uncond + guidance * (cond_p - uncond)
            new_lat, _ = euler_step(noise_pred, lat.astype(jnp.float32),
                                    sigma, sigma_next)
            return constrain_frames(new_lat.astype(dtype), mesh)

    abstract = (
        u_shapes, c_shapes, inj_shapes,
        jax.ShapeDtypeStruct((1, t, h // 8, w // 8, 4), dtype),
        jax.ShapeDtypeStruct((2, t, h // 8, w // 8, 4), dtype),
        jax.ShapeDtypeStruct((2, 1, cfg.cross_attention_dim), dtype),
        jax.ShapeDtypeStruct((2, 3), dtype),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    # pin the DEPLOYMENT shardings — without explicit in_shardings GSPMD
    # treats the abstract params as unspecified and invents param
    # shardings (hundreds of phantom all-gathers that a real frame-
    # parallel deployment, which replicates weights, never pays)
    from jax.sharding import NamedSharding
    from mofa_tpu.core.mesh import AXES
    from jax.sharding import PartitionSpec as P
    rep = NamedSharding(mesh, P())
    rep_tree = lambda shapes: jax.tree_util.tree_map(lambda _: rep, shapes)
    # frame-sharded args (inject/latents, T=25 not divisible by 8) get
    # their layout via with_sharding_constraint INSIDE step; in_shardings
    # pins only the replicated trees + scalars
    in_shardings = (
        rep_tree(u_shapes), rep_tree(c_shapes),
        jax.tree_util.tree_map(lambda _: rep, inj_shapes),
        rep, rep, rep, rep, rep,
    )
    return jax.jit(step, in_shardings=in_shardings), abstract, mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", action="store_true",
                    help="lower at 64x64 and scale bytes to 576x1024")
    ap.add_argument("--t", type=int, default=25)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--out", default="PROJECTION_v5e8.json")
    ap.add_argument("--top_ops", type=int, default=0,
                    help="print the N largest collective ops with their "
                         "op_name attribution to stderr")
    ap.add_argument("--dump_hlo", default=None,
                    help="write the optimized sharded HLO text here")
    # measured single-chip anchors (BENCH_r04.json e2e leg)
    ap.add_argument("--denoise_s", type=float, default=52.65)
    ap.add_argument("--decode_s", type=float, default=1.86)
    ap.add_argument("--fixed_s", type=float, default=0.18,
                    help="cmp + clip/vae encode (unsharded, once/video)")
    args = ap.parse_args()

    h, w = (64, 64) if args.micro else (576, 1024)
    scale = (576 * 1024) / (h * w)

    t0 = time.perf_counter()
    fn, abstract, mesh = build_step(h, w, args.t)
    lowered = fn.lower(*abstract)
    print(f"lowered in {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compiled in {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)

    inv, top_ops = collective_inventory(hlo, top_n=args.top_ops or 25)
    total_bytes_per_dev = sum(v["result_bytes"] for v in inv.values())
    for b, kind, nm in top_ops[:args.top_ops or 0]:
        print(f"{b/1e6:9.1f} MB {kind:20s} {nm}", file=sys.stderr, flush=True)
    # ring model: each gathered/exchanged byte crosses (n-1)/n of the ring
    n = N_DEV
    ici_s_per_step = total_bytes_per_dev * scale * (n - 1) / n / RING_BW

    projected_denoise = args.denoise_s / n + args.steps * ici_s_per_step
    projected_e2e = projected_denoise + args.decode_s / n + args.fixed_s

    out = {
        "metric": "projected_e2e_seconds_v5e8",
        "method": ("full-shape sharded HLO collective inventory"
                   if not args.micro else
                   "micro-shape HLO inventory, bytes linearly scaled"),
        "mesh": {"data": 1, "frames": n},
        "shape_lowered": {"h": h, "w": w, "t": args.t},
        "byte_scale_applied": scale,
        "f32_gather_bytes_counted_as_bf16": (
            "XLA:CPU lowers bf16 dots through f32 carriers (explicit "
            "f32->bf16->f32 converts feed the spatial-attn K/V "
            "all-gathers); the bf16 TPU deployment moves bf16, so "
            "all-gather/all-to-all/permute f32 elements count 2 bytes. "
            "all-reduce (fp32-by-design norm stats) counts full width. "
            "Caveat: genuinely-fp32 activation movement (e.g. the fp32 "
            "Euler/CFG glue crossing a reshard) would be undercounted "
            "by this kind-level heuristic; the denoise stream is bf16 "
            "end-to-end so none is expected at these sites."),
        "collectives_per_step": inv,
        "collective_bytes_per_step_per_device": total_bytes_per_dev,
        "largest_ops": [
            {"mb": round(b / 1e6, 1), "kind": kind, "site": nm}
            for b, kind, nm in top_ops[:12]],
        "ici_model": {
            "per_link_per_dir_Bps": ICI_GBPS_PER_LINK_PER_DIR,
            "ring_bw_Bps": RING_BW,
            "factor": f"(n-1)/n over {n}-ring, zero compute overlap "
                      "(upper bound on ICI cost)",
        },
        "ici_seconds_per_step": round(ici_s_per_step, 5),
        "anchors_single_chip": {
            "denoise_s": args.denoise_s, "decode_s": args.decode_s,
            "fixed_s": args.fixed_s, "source": "BENCH_r04.json e2e leg",
        },
        "projected": {
            "denoise_s": round(projected_denoise, 3),
            "e2e_s": round(projected_e2e, 3),
            "target_s": 20.0,
            "meets_target": projected_e2e < 20.0,
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
