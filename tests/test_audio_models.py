"""Golden parity: flax Audio2Mesh / Audio2Pose vs the reference torch
modules (random weights, tiny wav2vec2 config), plus pose-util parity."""

import math
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ANIP = "/root/reference/MOFA-Video-Hybrid/aniportrait"

HIDDEN, LAYERS, HEADS, INTER, CONV_DIM = 32, 2, 4, 64, 16
SR = 1600           # tiny "sample rate" so test audio stays small
FPS = 25


def _tiny_w2v_torch_config():
    from transformers import Wav2Vec2Config as HFConfig
    return HFConfig(
        hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        conv_dim=[CONV_DIM] * 7, do_stable_layer_norm=False,
        feat_extract_norm="group", hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        hidden_act="gelu", attn_implementation="eager")


@pytest.fixture(scope="module")
def ref_modules(request):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, ANIP)
    try:
        from src.audio_models.model import Audio2MeshModel  # noqa
        from src.audio_models.pose_model import Audio2PoseModel  # noqa
        import transformers
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference aniportrait import failed: {e}")
    finally:
        sys.path.remove(ANIP)

    cfg = _tiny_w2v_torch_config()
    orig = transformers.Wav2Vec2Config.from_pretrained
    transformers.Wav2Vec2Config.from_pretrained = classmethod(
        lambda cls, *a, **k: cfg)
    try:
        torch.manual_seed(0)
        a2m = Audio2MeshModel({"out_dim": 12, "latent_dim": 24,
                               "model_path": "x", "only_last_fetures": True,
                               "from_pretrained": False}).eval()
        torch.manual_seed(1)
        a2p = Audio2PoseModel({"out_dim": 6, "latent_dim": 24,
                               "model_path": "x", "only_last_fetures": True,
                               "from_pretrained": False}).eval()
    finally:
        transformers.Wav2Vec2Config.from_pretrained = orig
    return a2m, a2p


def _tiny_w2v_cfg():
    from mofa_tpu.models.audio.wav2vec2 import Wav2Vec2Config
    return Wav2Vec2Config(hidden_size=HIDDEN, num_layers=LAYERS,
                          num_heads=HEADS, intermediate_size=INTER,
                          conv_dim=CONV_DIM)


def test_audio2mesh_golden(ref_modules):
    import torch
    from mofa_tpu.models.audio.aniportrait import Audio2Mesh
    from mofa_tpu.models.weights import convert_audio_state_dict

    a2m_ref, _ = ref_modules
    rng = np.random.RandomState(0)
    audio = rng.randn(1, SR * 2).astype(np.float32)
    seq_len = math.ceil(audio.shape[1] / SR * FPS)

    model = Audio2Mesh(_tiny_w2v_cfg(), latent_dim=24, out_dim=12)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(audio), seq_len)
    sd = {k: v.detach().numpy() for k, v in a2m_ref.state_dict().items()}
    params = convert_audio_state_dict(params, sd)

    with torch.no_grad():
        want = a2m_ref.infer(torch.from_numpy(audio), seq_len).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(audio), seq_len))
    assert got.shape == want.shape == (1, seq_len, 12)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_audio2pose_golden(ref_modules):
    import torch
    from mofa_tpu.models.audio.aniportrait import Audio2Pose
    from mofa_tpu.models.weights import convert_audio_state_dict

    _, a2p_ref = ref_modules
    rng = np.random.RandomState(1)
    audio = rng.randn(1, SR).astype(np.float32)
    seq_len = math.ceil(audio.shape[1] / SR * FPS)

    model = Audio2Pose(_tiny_w2v_cfg(), latent_dim=24, out_dim=6, n_head=8,
                       num_layers=8)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(audio), seq_len)
    sd = {k: v.detach().numpy() for k, v in a2p_ref.state_dict().items()}
    params = convert_audio_state_dict(params, sd)

    with torch.no_grad():
        want = a2p_ref.infer(torch.from_numpy(audio), seq_len,
                             torch.LongTensor([42])).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(audio), seq_len, 42))
    assert got.shape == want.shape == (1, seq_len, 6)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_convert_ldmk_table_matches_reference():
    import ast
    src = open(f"{ANIP}/audio2ldmk.py").read()
    tree = ast.parse(src)
    fns = [n for n in tree.body if isinstance(n, ast.FunctionDef)
           and n.name == "convert_ldmk_to_68"]
    ns = {"np": np}
    exec(compile(ast.Module(body=fns, type_ignores=[]), "ref", "exec"), ns)
    rng = np.random.RandomState(0)
    lm = rng.rand(3, 468, 2).astype(np.float32)
    from mofa_tpu.models.audio.aniportrait import convert_ldmk_to_68
    np.testing.assert_array_equal(convert_ldmk_to_68(lm), ns["convert_ldmk_to_68"](lm))


def test_pose_utils_match_reference():
    import ast
    from scipy.spatial.transform import Rotation as R  # noqa
    src = open(f"{ANIP}/src/utils/pose_util.py").read()
    tree = ast.parse(src)
    fns = [n for n in tree.body if isinstance(n, ast.FunctionDef)]
    ns = {"np": np, "math": math, "R": R}
    exec(compile(ast.Module(body=fns, type_ignores=[]), "ref", "exec"), ns)

    from mofa_tpu.models.audio.aniportrait import (
        project_points, smooth_pose_seq)
    rng = np.random.RandomState(2)
    pts = rng.randn(2, 10, 3).astype(np.float32)
    tm = np.eye(4); tm[:3, 3] = [0, 0, -5]
    poses = rng.randn(2, 6).astype(np.float32)
    got = project_points(pts, tm, poses, [64, 96])
    want = ns["project_points"](pts, tm, poses, [64, 96])
    np.testing.assert_allclose(got, want, atol=1e-4)

    seq = rng.randn(9, 6).astype(np.float32)
    np.testing.assert_allclose(smooth_pose_seq(seq, 5),
                               ns["smooth_pose_seq"](seq, 5), atol=1e-6)
