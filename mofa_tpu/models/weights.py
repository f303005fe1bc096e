"""torch/diffusers checkpoint -> Flax params converters.

Covers the reference's checkpoint surface (SURVEY.md §5 checkpoint/resume):
- diffusers safetensors trees (SVD UNet, FlowControlNet adapters, VAE) —
  loaded via `safetensors` into a flat {name: np.ndarray} dict
- transformers CLIP vision (+projection)
- CMP `ckpt_iter_*.pth.tar` (torch.load) with its Sequential index layout

Conversion rules:
- conv kernels OIHW -> HWIO (3D: OIDHW -> DHWIO), dense [O,I] -> [I,O]
- norm `weight` -> `scale`; BatchNorm running_mean/var -> mean/var
- torch list indices fold into names (`down_blocks.0` -> `down_blocks_0`)
- a tree-walking resolver matches the remaining dotted path against the
  actual Flax param tree, greedily joining tokens (handles both nested
  modules and flattened names like `down_blocks_0_resnets_1`) and probing
  wrapper levels (`Conv_0`, `Dense_0`).

Coverage caveat (environment-limited): this image has no model weights,
so every converter is golden-tested by round-tripping RANDOM torch state
dicts produced by the reference module code (the same key layout and
shapes a real checkpoint has) — the full real files
(`svd_xt.safetensors`, `GFPGANv1.4.pth`, `alignment_WFLW_4HG.pth`,
`ckpt_iter_*.pth.tar`, ...) have never been loaded here. Torch-side
quirks a random-state-dict round trip cannot see (extra EMA wrapper keys
beyond {params_ema, params, state_dict}, torch.save pickling variants)
would surface as strict-mode unmatched-key errors, not silent numeric
corruption: `convert_torch_state_dict(strict=True)` (the default) raises
on any unconsumed or unmatched key.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _to_numpy(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t)


def _fold_indices(key: str) -> list[str]:
    """'a.0.b.weight' -> ['a_0', 'b', 'weight']"""
    tokens = key.split(".")
    out = []
    for tok in tokens:
        if re.fullmatch(r"\d+", tok) and out:
            out[-1] = f"{out[-1]}_{tok}"
        else:
            out.append(tok)
    return out


_LEAF_RENAMES = {
    "running_mean": "mean",
    "running_var": "var",
}


def _transpose_for_flax(leaf_name: str, value: np.ndarray, is_norm: bool):
    if leaf_name == "weight":
        if value.ndim == 3:          # conv1d OIK -> KIO
            return "kernel", value.transpose(2, 1, 0)
        if value.ndim == 4:          # conv OIHW -> HWIO
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 5:          # conv3d OIDHW -> DHWIO
            return "kernel", value.transpose(2, 3, 4, 1, 0)
        if value.ndim == 2:          # linear [O, I] -> [I, O]
            return "kernel", value.transpose(1, 0)
        if value.ndim == 1:          # norm affine
            return "scale", value
    if leaf_name in _LEAF_RENAMES:
        return _LEAF_RENAMES[leaf_name], value
    return leaf_name, value


def _resolve(tree: dict, tokens: list[str], leaf: str):
    """Find the path in `tree` matching `tokens` (greedy joining) + leaf.

    Returns the list of keys, or None.
    """
    if not tokens:
        if leaf in tree:
            return [leaf]
        # probe wrapper levels
        for wrapper in ("Conv_0", "Dense_0"):
            sub = tree.get(wrapper)
            if isinstance(sub, dict) and leaf in sub:
                return [wrapper, leaf]
        return None
    # try joining 1..len(tokens) leading tokens into a single key
    for n in range(len(tokens), 0, -1):
        key = "_".join(tokens[:n])
        sub = tree.get(key)
        if isinstance(sub, dict):
            rest = _resolve(sub, tokens[n:], leaf)
            if rest is not None:
                return [key] + rest
    return None


def convert_torch_state_dict(flax_params: dict, torch_sd: Dict[str, np.ndarray],
                             strip_prefixes=("module.",),
                             strict: bool = True) -> dict:
    """Fill a (copy of a) Flax param tree from a flat torch state dict."""
    import copy

    params = copy.deepcopy(flax_params)
    root = params["params"] if "params" in params else params
    unmatched = []
    for key, val in torch_sd.items():
        for p in strip_prefixes:
            if key.startswith(p):
                key = key[len(p):]
        val = _to_numpy(val)
        tokens = _fold_indices(key)
        leaf_raw = tokens.pop()
        leaf, val_t = _transpose_for_flax(leaf_raw, val, False)
        path = _resolve(root, tokens, leaf)
        if path is None and leaf == "scale":
            # 1-D 'weight' that is actually a bias-less conv/linear? try kernel
            path = _resolve(root, tokens, "kernel")
        if path is None:
            unmatched.append(key)
            continue
        node = root
        for k in path[:-1]:
            node = node[k]
        expected = node[path[-1]]
        if expected.shape != val_t.shape:
            # norm scale vs dense kernel mismatch resolution
            if val_t.size == np.prod(expected.shape):
                val_t = val_t.reshape(expected.shape)
            else:
                raise ValueError(
                    f"shape mismatch for {key}: got {val_t.shape}, expected {expected.shape}")
        node[path[-1]] = val_t.astype(np.asarray(expected).dtype)
    if strict and unmatched:
        raise KeyError(f"{len(unmatched)} unmatched torch keys, e.g. {unmatched[:8]}")
    return params


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for k in ("state_dict", "model", "module"):
        if isinstance(sd, dict) and k in sd and isinstance(sd[k], dict):
            sd = sd[k]
    return {k: _to_numpy(v) for k, v in sd.items() if hasattr(v, "shape")}


# ----------------------------------------------------------- SVD VAE / CLIP

def convert_vae_state_dict(flax_params: dict,
                           torch_sd: Dict[str, np.ndarray],
                           strict: bool = True) -> dict:
    """diffusers AutoencoderKLTemporalDecoder state dict -> Flax tree.

    The diffusers names (`encoder.down_blocks.0.resnets.0...`,
    `decoder.mid_block.attentions.0.to_out.0...`, `decoder.time_conv_out`,
    `quant_conv`, `...time_mixer.mix_factor`) map onto
    `mofa_tpu.models.vae.AutoencoderKLTemporalDecoder` through the generic
    resolver (index folding + greedy name joining); this wrapper exists so
    callers/tests name the intent and any future VAE-specific remap has a
    home. Golden-tested in tests/test_vae_clip_golden.py.

    Dead-key handling: at layers_per_block=1 diffusers still CREATES
    `decoder.mid_block.attentions.0` params but its forward zip-truncates
    them away (unet_3d_blocks.MidBlockTemporalDecoder.forward), and the
    Flax tree correspondingly has no `mid_block_attentions_0` — such
    checkpoint keys are dropped here (gated on the target tree actually
    lacking the module) so strict mode stays meaningful for every caller.
    """
    root = flax_params.get("params", flax_params)
    decoder = root.get("decoder", {}) if isinstance(root, dict) else {}
    if "mid_block_attentions_0" not in decoder:
        torch_sd = {k: v for k, v in torch_sd.items()
                    if not k.startswith("decoder.mid_block.attentions.")}
    return convert_torch_state_dict(flax_params, torch_sd, strict=strict)


def convert_clip_vision_state_dict(flax_params: dict,
                                   torch_sd: Dict[str, np.ndarray],
                                   strict: bool = True) -> dict:
    """transformers CLIPVisionModelWithProjection state dict -> Flax tree.

    Special cases vs the generic converter:
    - `vision_model.` / `embeddings.` / `encoder.` wrapper levels do not
      exist in the Flax module — stripped as prefixes
    - `position_embedding.weight` is an nn.Embedding table [npos, hidden]
      stored as a raw Flax param of the SAME layout — must NOT get the
      2-D `weight`->kernel transpose
    """
    import copy

    sd = dict(torch_sd)
    params = copy.deepcopy(flax_params)
    root = params["params"] if "params" in params else params
    for key in list(sd):
        if key.endswith("position_embedding.weight"):
            val = _to_numpy(sd.pop(key))
            expected = root["position_embedding"]
            if expected.shape != val.shape:
                raise ValueError(
                    f"position_embedding shape {val.shape} != {expected.shape}")
            root["position_embedding"] = val.astype(
                np.asarray(expected).dtype)
    return convert_torch_state_dict(
        params, sd,
        strip_prefixes=("module.", "vision_model.", "embeddings.",
                        "encoder."),
        strict=strict)


# ----------------------------------------------------------------- CMP

_CMP_SEQ_CONV_BN = {
    # torch Sequential index -> (our block index, 'conv'|'bn')
    # conv,BN,ReLU x3 (decoder1: no leading pool)
    "nopool": {0: (0, "conv"), 1: (0, "bn"), 3: (1, "conv"), 4: (1, "bn"),
               6: (2, "conv"), 7: (2, "bn")},
    # MaxPool,conv,BN,ReLU x3 (decoder2/4/8)
    "pool": {1: (0, "conv"), 2: (0, "bn"), 4: (1, "conv"), 5: (1, "bn"),
             7: (2, "conv"), 8: (2, "bn")},
}


def remap_cmp_key(key: str) -> str | None:
    """Map reference CMP param names onto our module naming before generic
    conversion. Returns None for keys to skip."""
    key = re.sub(r"^(module\.)+", "", key)
    if key.startswith("num_batches_tracked") or key.endswith("num_batches_tracked"):
        return None
    m = re.match(r"flow_decoder\.(decoder[1248])\.(\d+)\.(.+)", key)
    if m:
        dec, idx, rest = m.group(1), int(m.group(2)), m.group(3)
        table = _CMP_SEQ_CONV_BN["nopool" if dec == "decoder1" else "pool"]
        if idx not in table:
            return None
        bi, kind = table[idx]
        return f"flow_decoder.{dec}_{bi}.{kind}.{rest}"
    m = re.match(r"flow_decoder\.(fusion[248]|skipconv[24]|fusion8)\.(\d+)\.(.+)", key)
    if m:
        name, idx, rest = m.group(1), int(m.group(2)), m.group(3)
        kind = {0: "conv", 1: "bn"}.get(idx)
        if kind is None:
            return None
        return f"flow_decoder.{name}.{kind}.{rest}"
    # AlexNetFCN: Sequential(conv, BN, ReLU) blocks named conv1..fc7
    m = re.match(r"image_encoder\.(conv[1-7]|fc[67])\.([01])\.(.+)", key)
    if m:
        kind = "conv" if m.group(2) == "0" else "bn"
        return f"image_encoder.{m.group(1)}.{kind}.{m.group(3)}"
    # MotionDecoderFlowNet deconv Sequential(ConvTranspose2d, LeakyReLU)
    m = re.match(r"flow_decoder\.(deconv[248])\.0\.(.+)", key)
    if m:
        return f"flow_decoder.{m.group(1)}.{m.group(2)}"
    return key


def _is_cmp_transpose_conv(key: str) -> bool:
    return bool(re.search(
        r"flow_decoder\.(deconv[248]\.0|upsampled_flow\d_to_\d)\.weight$", key))


def convert_cmp_state_dict(flax_params: dict, torch_sd: Dict[str, np.ndarray],
                           strict: bool = True) -> dict:
    remapped = {}
    for k, v in torch_sd.items():
        if _is_cmp_transpose_conv(re.sub(r"^(module\.)+", "", k)):
            # torch ConvTranspose2d weight [I, O, kh, kw] -> pre-flipped
            # HWIO "kernel" (TorchConvTranspose4x2 runs it as an
            # input-dilated VALID conv)
            v = np.flip(_to_numpy(v), (2, 3)).transpose(2, 3, 0, 1).copy()
            k = k[: -len("weight")] + "kernel"
        nk = remap_cmp_key(k)
        if nk is not None:
            remapped[nk] = v
    return convert_torch_state_dict(flax_params, remapped, strict=strict)


# ----------------------------------------------------------------- GMFlow

def convert_gmflow_state_dict(flax_params: dict, torch_sd: Dict[str, np.ndarray],
                              strict: bool = True) -> dict:
    """UniMatch/GMFlow torch checkpoint -> models/gmflow tree.

    Everything maps via the generic converter except the shared trident conv,
    which is a raw HWIO param (`backbone/trident_conv_weight`)."""
    remapped = {}
    trident = None
    for k, v in torch_sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        if k == "backbone.trident_conv.weight":
            trident = _to_numpy(v).transpose(2, 3, 1, 0)  # OIHW -> HWIO
            continue
        if k.startswith("upsampler."):
            continue  # absent in reg_refine flow models' forward path
        remapped[k] = v
    params = convert_torch_state_dict(flax_params, remapped, strict=strict)
    if trident is not None:
        root = params["params"] if "params" in params else params
        tgt = root["backbone"]["trident_conv_weight"]
        assert tgt.shape == trident.shape, (tgt.shape, trident.shape)
        root["backbone"]["trident_conv_weight"] = trident.astype(
            np.asarray(tgt).dtype)
    return params


# ----------------------------------------------------------------- audio

def convert_audio_state_dict(flax_params: dict, torch_sd: Dict[str, np.ndarray],
                             strict: bool = True) -> dict:
    """AniPortrait Audio2Mesh/Audio2Pose torch checkpoints -> our flax trees.

    Handles: HF wav2vec2 'encoder.' level flattening, weight-normed
    positional conv merge, packed in_proj qkv split (torch MultiheadAttention),
    nn.Embedding naming."""
    remapped = {}
    wn = {}
    for k, v in torch_sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        v = _to_numpy(v)
        if ("masked_spec_embed" in k or "num_batches_tracked" in k
                or k.endswith("PPE.pe") or k.endswith("biased_mask")):
            continue  # fixed buffers rebuilt in code
        # wav2vec2 'encoder.' level is flattened in our tree
        k = k.replace(".encoder.layers.", ".layers.")
        k = k.replace(".encoder.pos_conv_embed.conv.", ".pos_conv_embed_conv.")
        k = k.replace(".encoder.layer_norm.", ".encoder_layer_norm.")
        # weight-norm halves of the positional conv: stash then merge
        m = re.match(r"(.*pos_conv_embed_conv)\.(weight_g|weight_v|"
                     r"parametrizations\.weight\.original0|"
                     r"parametrizations\.weight\.original1)$", k)
        if m:
            which = "g" if m.group(2).endswith(("_g", "original0")) else "v"
            wn.setdefault(m.group(1), {})[which] = v
            continue
        k = k.replace("transformer_decoder.layers.", "decoder_layers.")
        k = re.sub(r"decoder_layers\.(\d+)\.", r"decoder_layers_\1.", k)
        # torch MultiheadAttention packed qkv
        m = re.match(r"(.*)\.(self_attn|multihead_attn)\.in_proj_(weight|bias)$", k)
        if m:
            base, attn, kind = m.groups()
            parts = np.split(v, 3, axis=0)
            for name, part in zip("qkv", parts):
                remapped[f"{base}.{attn}_{name}.{kind}"] = part
            continue
        k = re.sub(r"\.(self_attn|multihead_attn)\.out_proj\.", r".\1_out.", k)
        if k == "id_embed.weight":
            remapped["id_embed.embedding__raw"] = v
            continue
        remapped[k] = v
    # merge weight norm: w = g * v / ||v||  (norm over dims (0, 1), g [O,1,1]
    # for dim=2... HF uses weight_norm(conv, name="weight", dim=2))
    for base, gv in wn.items():
        g, v = gv["g"], gv["v"]
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        remapped[f"{base}.weight"] = g * v / norm

    raw_embeds = {k: remapped.pop(k) for k in list(remapped)
                  if k.endswith("embedding__raw")}
    params = convert_torch_state_dict(flax_params, remapped, strict=strict)
    root = params["params"] if "params" in params else params
    # place raw embeddings (flax nn.Embed leaf name 'embedding', no transpose)
    for key, val in raw_embeds.items():
        node = root
        for part in key.split(".")[:-1]:
            node = node[part]
        assert node["embedding"].shape == val.shape, (key, val.shape)
        node["embedding"] = val.astype(np.asarray(node["embedding"]).dtype)
    return params


# --------------------------------------------------------------- sadtalker

def _w2l_encoder_remap(key: str, prefix: str) -> str | None:
    """wav2lip Sequential conv stack: `{prefix}.{i}.conv_block.{0|1}` ->
    `{prefix}.enc_{i}.{conv|bn}`."""
    m = re.match(rf"{re.escape(prefix)}\.(\d+)\.conv_block\.([01])\.(.+)", key)
    if m:
        i, kind, rest = m.groups()
        part = "conv" if kind == "0" else "bn"
        return f"{prefix}.enc_{i}.{part}.{rest}"
    return key


_RESUNET_RENAMES = [
    (r"resunet\.input_layer\.0\.", "resunet.in_conv1."),
    (r"resunet\.input_layer\.1\.", "resunet.in_bn."),
    (r"resunet\.input_layer\.3\.", "resunet.in_conv2."),
    (r"resunet\.input_skip\.0\.", "resunet.in_skip."),
    (r"resunet\.residual_conv_1\.", "resunet.res1."),
    (r"resunet\.residual_conv_2\.", "resunet.res2."),
    (r"resunet\.bridge\.", "resunet.bridge."),
    (r"resunet\.upsample_(\d)\.upsample\.", r"resunet.up\1."),
    (r"resunet\.up_residual_conv(\d)\.", r"resunet.upres\1."),
    (r"resunet\.output_layer\.0\.", "resunet.out_conv."),
]

_RESCONV_RENAMES = [
    (r"\.conv_block\.0\.", ".bn1."),
    (r"\.conv_block\.2\.", ".conv1."),
    (r"\.conv_block\.3\.", ".bn2."),
    (r"\.conv_block\.5\.", ".conv2."),
    (r"\.conv_skip\.0\.", ".skip_conv."),
    (r"\.conv_skip\.1\.", ".skip_bn."),
]


def convert_sadtalker_exp(flax_params: dict, torch_sd: Dict[str, np.ndarray],
                          strict: bool = True) -> dict:
    """SimpleWrapperV2 (audio2exp) -> Audio2ExpNet tree."""
    remapped = {}
    for k, v in torch_sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        if "num_batches_tracked" in k:
            continue
        k = _w2l_encoder_remap(k, "audio_encoder")
        remapped[k] = v
    return convert_torch_state_dict(flax_params, remapped, strict=strict)


def convert_sadtalker_pose(flax_params: dict, torch_sd: Dict[str, np.ndarray],
                           strict: bool = True) -> dict:
    """Audio2Pose (test path: wav2lip audio encoder + CVAE decoder) ->
    Audio2PoseCVAE tree. Training-only parts (CVAE encoder, discriminator)
    are dropped."""
    remapped = {}
    classbias = None
    for k, v in torch_sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        v = _to_numpy(v)
        if ("num_batches_tracked" in k or k.startswith("netD")
                or k.startswith("netG.encoder.")):
            continue
        k = _w2l_encoder_remap(k, "audio_encoder.audio_encoder")
        k = k.replace("audio_encoder.audio_encoder.", "audio_encoder.")
        if not k.startswith("audio_encoder."):
            if not k.startswith("netG.decoder."):
                continue
            k = k.replace("netG.decoder.", "decoder.")
            for pat, rep in _RESUNET_RENAMES + _RESCONV_RENAMES:
                k = re.sub(pat, rep, k)
            k = re.sub(r"decoder\.MLP\.L(\d+)\.", r"decoder.mlp_\1.", k)
            if k == "decoder.classbias":
                classbias = v
                continue
            # ConvTranspose2d weights are [I, O, H, W] -> flax [H, W, I, O]
            # with a spatial FLIP (torch convT correlates with the flipped
            # kernel relative to lax.conv_transpose)
            if re.match(r"decoder\.resunet\.up\d\.weight", k) and v.ndim == 4:
                remapped[k.replace(".weight", ".kernel__raw")] = \
                    np.ascontiguousarray(
                        v.transpose(2, 3, 0, 1)[::-1, ::-1])
                continue
        remapped[k] = v

    raw = {k: remapped.pop(k) for k in list(remapped)
           if k.endswith("kernel__raw")}
    params = convert_torch_state_dict(flax_params, remapped, strict=strict)
    root = params["params"] if "params" in params else params
    for key, val in raw.items():
        node = root
        parts = key.split(".")[:-1]
        for part in parts:
            node = node[part]
        assert node["kernel"].shape == val.shape, (key, val.shape,
                                                   node["kernel"].shape)
        node["kernel"] = val.astype(np.asarray(node["kernel"]).dtype)
    if classbias is not None:
        node = root["decoder"]
        assert node["classbias"].shape == classbias.shape
        node["classbias"] = classbias.astype(
            np.asarray(node["classbias"]).dtype)
    return params


def convert_flow_controlnet_state_dict(flax_params: dict,
                                       torch_sd: Dict[str, np.ndarray],
                                       strict: bool = True) -> dict:
    """FlowControlNet (MOFA-Adapter) torch/safetensors state dict -> our
    mofa_adapter.FlowControlNet tree.

    The reference model is flat (conv_in/time_embedding/down_blocks/
    mid_block/controlnet_* live directly on FlowControlNet,
    svdxt...norefine.py:180-213); our Flax module nests the shared
    ControlNetSDV trunk under `trunk` with only the MOFA-specific
    conditioning/flow encoders at top level. Landmark-adapter extras
    (controlnet_ldmk_embedding, occlusions_*, zero_outs_*,
    ldmk_ctrlnet.py:232-254) are also top-level in both."""
    _TOP_LEVEL = ("controlnet_cond_embedding.", "flow_encoder.",
                  "controlnet_ldmk_embedding.", "occlusions.", "zero_outs.")
    remapped = {}
    for k, v in torch_sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        if k.startswith("occlusions.") or k.startswith("zero_outs."):
            # reference nn.ModuleDict keyed by scale -> our flat names
            k = re.sub(r"^(occlusions|zero_outs)\.(\d+)\.", r"\1_\2.", k)
            remapped[k] = v
            continue
        if any(k.startswith(p) for p in _TOP_LEVEL):
            remapped[k] = v
        else:
            remapped["trunk." + k] = v
    return convert_torch_state_dict(flax_params, remapped, strict=strict)


def init_adapter_from_unet(cn_params: dict, unet_params: dict) -> dict:
    """FlowControlNet.from_unet weight copy (controlnet_sdv.py:617-627):
    conv_in, time_embedding, down_blocks and mid_block are copied from the
    frozen SVD UNet into the adapter trunk; add_embedding, the conditioning
    embeddings, flow encoder and zero convs keep their fresh init (the
    reference copies exactly this set)."""
    import copy as _copy
    import jax

    out = _copy.deepcopy(cn_params)
    src = unet_params["params"] if "params" in unet_params else unet_params
    dst_root = out["params"] if "params" in out else out
    trunk = dst_root["trunk"]

    names = [k for k in trunk
             if k == "conv_in" or k == "time_embedding"
             or k == "mid_block" or k.startswith("down_blocks_")]
    copied = 0
    for name in names:
        assert name in src, f"unet tree missing {name}"

        def _check_copy(a, b):
            assert np.asarray(a).shape == np.asarray(b).shape
            return b

        trunk[name] = jax.tree_util.tree_map(_check_copy, trunk[name],
                                             src[name])
        copied += 1
    assert copied >= 3, "from_unet copied suspiciously few modules"
    return out


# ----------------------------------------------------------------- facerender

def _fold_spectral_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Replace torch spectral_norm triplets (weight_orig/u/v) with the
    effective weight W / sigma, sigma = u @ W.flat @ v (power-iterated
    vectors stored in the checkpoint; eval mode does not update them)."""
    out = {}
    bases = {k[: -len(".weight_orig")] for k in sd if k.endswith(".weight_orig")}
    for k, v in sd.items():
        base = k.rsplit(".", 1)[0]
        if base in bases and k.split(".")[-1] in ("weight_orig", "weight_u",
                                                  "weight_v"):
            continue
        out[k] = v
    for base in bases:
        w = _to_numpy(sd[base + ".weight_orig"])
        u = _to_numpy(sd[base + ".weight_u"])
        v = _to_numpy(sd[base + ".weight_v"])
        sigma = float(u @ w.reshape(w.shape[0], -1) @ v)
        out[base + ".weight"] = w / sigma
    return out


_FACERENDER_RULES = {
    "kp_detector": [
        (r"^predictor\.down_blocks\.down(\d+)\.", r"predictor_down_\1."),
        (r"^predictor\.up_blocks\.up(\d+)\.", r"predictor_up_\1."),
        (r"^predictor\.conv\.", r"predictor_conv."),
    ],
    "he_estimator": [
        # nn.Sequential 'b{n}_{i}' naming
        (r"^block(\d)\.b\d_(\d+)\.", r"block\1_\2."),
    ],
    "mapping": [
        (r"^first\.0\.", r"first."),
        (r"^encoder(\d+)\.1\.", r"encoder_\1."),
    ],
    "generator": [
        (r"^(first|second|third|fourth)\.", r"trunk.\1."),
        (r"^down_blocks\.(\d+)\.", r"trunk.down_\1."),
        (r"^resblocks_3d\.3dr(\d+)\.", r"trunk.resblock3d_\1."),
        (r"^dense_motion_network\.", r"trunk.dense_motion_network."),
        (r"(dense_motion_network\.hourglass)\.encoder\.down_blocks\.(\d+)\.",
         r"\1.down_\2."),
        (r"(dense_motion_network\.hourglass)\.decoder\.up_blocks\.(\d+)\.",
         r"\1.up_\2."),
        (r"(dense_motion_network\.hourglass)\.decoder\.(conv|norm)\.",
         r"\1.\2."),
        # plain (non-SPADE) generator decoder
        (r"^resblocks_2d\.2dr(\d+)\.", r"resblock2d_\1."),
        (r"^up_blocks\.(\d+)\.conv\.", r"up_\1_conv."),
        (r"^up_blocks\.(\d+)\.norm\.", r"up_\1_norm."),
        # SPADE mlp_shared Sequential
        (r"\.mlp_shared\.0\.", r".mlp_shared."),
    ],
}


def convert_facerender_state_dict(flax_params: dict,
                                  torch_sd: Dict[str, np.ndarray],
                                  net: str = "generator",
                                  prefix: str = "",
                                  strict: bool = True) -> dict:
    """facerender torch/safetensors state dict -> models/facerender trees.

    `net` selects the remap rule set ('generator' | 'kp_detector' |
    'mapping' | 'he_estimator'); `prefix` selects one network from a
    combined checkpoint (the reference `SadTalker_V0.0.2_256.safetensors`
    stores generator/kp_extractor/mapping/he_estimator side by side,
    `animate.py:62-86`)."""
    sub = {}
    for k, v in torch_sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        if ("num_batches_tracked" in k or k == "down.weight"
                or re.search(r"\.sigma$", k)):
            continue  # BN counters / fixed antialias kernel
        sub[k] = v
    sub = _fold_spectral_norm(sub)
    remapped = {}
    for k, v in sub.items():
        for pat, rep in _FACERENDER_RULES[net]:
            k = re.sub(pat, rep, k)
        remapped[k] = v
    return convert_torch_state_dict(flax_params, remapped, strict=strict)


# ----------------------------------------------------------------- pirender

_PIRENDER_RULES = [
    # mapping net Sequential wrappers
    (r"(^|\.)first\.0\.", r"\1first."),
    (r"(^|\.)encoder(\d+)\.1\.", r"\1encoder_\2."),
    # ADAIN hourglass module nesting
    (r"hourglass\.encoder\.input_layer\.", r"hourglass.input_layer."),
    (r"hourglass\.encoder\.encoder(\d+)\.", r"hourglass.encoder_\1."),
    (r"hourglass\.decoder\.decoder(\d+)\.", r"hourglass.decoder_\1."),
    # flow head Sequential (norm, act, conv)
    (r"flow_out\.0\.", r"flow_norm."),
    (r"flow_out\.2\.", r"flow_conv."),
    # fine encoder/decoder Sequential blocks
    (r"encoder\.first\.model\.0\.", r"encoder.first_conv."),
    (r"encoder\.first\.model\.1\.", r"encoder.first_norm."),
    (r"encoder\.down(\d+)\.model\.0\.", r"encoder.down_\1_conv."),
    (r"encoder\.down(\d+)\.model\.1\.", r"encoder.down_\1_norm."),
    (r"decoder\.res(\d+)\.res(\d+)\.", r"decoder.res_\1_\2."),
    (r"decoder\.up(\d+)\.model\.0\.", r"decoder.up_\1_conv."),
    (r"decoder\.up(\d+)\.model\.1\.", r"decoder.up_\1_norm."),
    (r"decoder\.jump(\d+)\.model\.0\.", r"decoder.jump_\1_conv."),
    (r"decoder\.jump(\d+)\.model\.1\.", r"decoder.jump_\1_norm."),
    (r"decoder\.final\.model\.0\.", r"decoder.final_conv."),
    # ADAIN mlp_shared Sequential
    (r"\.mlp_shared\.0\.", r".mlp_shared."),
]


def convert_pirender_state_dict(flax_params: dict,
                                torch_sd: Dict[str, np.ndarray],
                                prefix: str = "",
                                strict: bool = True) -> dict:
    """PIRenderer FaceGenerator state dict -> models/pirender tree.

    Special cases: ConvTranspose2d weights ([I, O, kh, kw]) inside the
    ADAIN decoder blocks are flipped + laid out HWIO here (the runtime
    realizes the transpose conv as an input-dilated conv); LayerNorm2d
    [C,1,1] affines squeeze to [C]."""
    remapped = {}
    for k, v in torch_sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        if "num_batches_tracked" in k:
            continue
        for pat, rep in _PIRENDER_RULES:
            k = re.sub(pat, rep, k)
        v = _to_numpy(v)
        if re.search(r"hourglass\.decoder_\d+\.(conv_1|conv_s)\.weight$", k):
            v = np.flip(v, (2, 3)).transpose(2, 3, 0, 1).copy()
            k = k[: -len("weight")] + "kernel"
        elif k.endswith(".weight") and v.ndim == 3 and v.shape[1:] == (1, 1):
            v = v.reshape(-1)  # LayerNorm2d affine [C,1,1]
        remapped[k] = v
    return convert_torch_state_dict(flax_params, remapped, strict=strict)


# ----------------------------------------------------------------- gfpgan

def convert_gfpgan_state_dict(flax_params: dict,
                              torch_sd: Dict[str, np.ndarray],
                              strict: bool = True) -> dict:
    """GFPGANv1.4.pth ({'params_ema': ...} or flat) -> models/gfpgan tree.

    Special cases beyond the generic rules:
    - ModulatedConv2d weight [1, O, I, k, k] -> squeeze -> generic HWIO
    - StyleConv noise-strength scalar `.weight` [1] -> `noise_strength`
    - stored noise buffers noises.noise{i} [1,1,r,r] -> [1,r,r,1]
    - ConstantInput weight [1,C,4,4] -> [1,4,4,C]
    """
    for wrap in ("params_ema", "params"):
        if wrap in torch_sd and isinstance(torch_sd[wrap], dict):
            torch_sd = torch_sd[wrap]
    raw = {}
    remapped = {}
    for k, v in torch_sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        v = _to_numpy(v)
        if re.search(r"modulated_conv\.weight$", k):
            remapped[k] = v.reshape(v.shape[1:])        # drop leading 1
            continue
        if re.search(r"(style_conv1|style_convs\.\d+)\.weight$", k):
            remapped[k.replace(".weight", ".noise_strength")] = v
            continue
        m = re.match(r"(.*)\.noises\.(noise\d+)$", k)
        if m:
            raw[f"{m.group(1)}.noises_{m.group(2)}"] = v.transpose(0, 2, 3, 1)
            continue
        if k.endswith("constant_input.weight"):
            raw[k.replace("constant_input.weight", "constant_input_weight")] \
                = v.transpose(0, 2, 3, 1)
            continue
        remapped[k] = v
    params = convert_torch_state_dict(flax_params, remapped, strict=strict)
    root = params["params"] if "params" in params else params
    for key, val in raw.items():
        node = root
        parts = key.split(".")
        for part in parts[:-1]:
            node = node[part]
        assert node[parts[-1]].shape == val.shape, (key, val.shape,
                                                    node[parts[-1]].shape)
        node[parts[-1]] = val.astype(np.asarray(node[parts[-1]]).dtype)
    return params


# ----------------------------------------------------------------- awing FAN

def convert_fan_state_dict(flax_params: dict, torch_sd: Dict[str, np.ndarray],
                           strict: bool = True) -> dict:
    """facexlib `alignment_WFLW_4HG.pth` ({'state_dict': ...}) -> our
    models/face_alignment.FAN tree. Only the ConvBlock shortcut Sequential
    needs renaming; everything else is the generic rule set."""
    remapped = {}
    for k, v in torch_sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        if "num_batches_tracked" in k:
            continue
        k = k.replace(".downsample.0.", ".downsample_bn.")
        k = k.replace(".downsample.2.", ".downsample_conv.")
        remapped[k] = v
    return convert_torch_state_dict(flax_params, remapped, strict=strict)


# ----------------------------------------------------------------- face3d fit

def convert_face3d_recon_state_dict(flax_params: dict,
                                    torch_sd: Dict[str, np.ndarray],
                                    strict: bool = True) -> dict:
    """ReconNetWrapper (networks.py:69-105) state dict -> audio/face3d_fit
    ReconNet tree."""
    remapped = {}
    for k, v in torch_sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        if "num_batches_tracked" in k:
            continue
        k = re.sub(r"^backbone\.layer(\d)\.(\d+)\.", r"layer\1_\2.", k)
        k = re.sub(r"^backbone\.", "", k)
        k = k.replace(".downsample.0.", ".downsample_conv.")
        k = k.replace(".downsample.1.", ".downsample_bn.")
        k = re.sub(r"^final_layers\.(\d+)\.", r"head_\1.", k)
        remapped[k] = v
    return convert_torch_state_dict(flax_params, remapped, strict=strict)
