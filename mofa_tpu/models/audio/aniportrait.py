"""AniPortrait audio->landmark models in flax + the audio2ldmk driver.

Re-derivation of /root/reference/MOFA-Video-Hybrid/aniportrait/:
- Audio2Mesh (src/audio_models/model.py:11-71): wav2vec2 hidden states ->
  in_fn -> zero-init out_fn -> per-frame 3D vertex OFFSETS (1404 = 468*3),
  added to the reference face's lmks3d;
- Audio2Pose (src/audio_models/pose_model.py:58-125): wav2vec2 features +
  autoregressive 8-layer transformer decoder (ALiBi-slope biased causal
  self-attention, DIAGONAL-only cross-attention mask, learned id embedding,
  sinusoidal PPE) -> per-frame 6-dof pose; 5-second chunked inference with
  merged tail (audio2ldmk.py:246-267);
- pose utils (src/utils/pose_util.py): mediapipe-style perspective
  projection, euler<->matrix, box-mean pose smoothing;
- convert_ldmk_to_68 (audio2ldmk.py:62-160): the 468->68 index table.

The autoregressive decode is a lax.scan over a fixed-length token buffer
(causal masking makes per-position outputs independent of the not-yet-
generated suffix), so the whole rollout is ONE compiled program.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.models.audio.wav2vec2 import (
    Wav2Vec2Config, Wav2Vec2Encoder, normalize_audio)

# 468-pt mediapipe -> 68-pt dlib-style landmark index table
# (audio2ldmk.py:62-160)
MEDIAPIPE_TO_68 = np.array([
    234, 93, 132, 58, 172, 136, 150, 176, 152, 400, 379, 365, 397, 288, 361,
    323, 454,                                      # face contour
    70, 63, 105, 66, 107,                          # right eyebrow
    336, 296, 334, 293, 300,                       # left eyebrow
    168, 6, 195, 4,                                # nose bridge
    239, 241, 19, 461, 459,                        # nose bottom
    33, 160, 158, 133, 153, 144,                   # right eye
    362, 385, 387, 263, 373, 380,                  # left eye
    61, 40, 37, 0, 267, 270, 291, 321, 314, 17, 84, 91,   # outer lips
    78, 81, 13, 311, 308, 402, 14, 178,            # inner lips
], np.int64)


def convert_ldmk_to_68(mediapipe_ldmk: np.ndarray) -> np.ndarray:
    """[T, 468+, 2] -> [T, 68, 2]."""
    return np.asarray(mediapipe_ldmk)[:, MEDIAPIPE_TO_68]


# ------------------------------------------------------------ audio feature

def load_wav(path: str, target_sr: int = 16000) -> np.ndarray:
    """PCM wav loader + polyphase resample (librosa.load equivalent for wav;
    other containers need external conversion to wav first)."""
    import wave
    from scipy.signal import resample_poly
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        ch = f.getnchannels()
        raw = f.readframes(n)
    dtype = {1: np.int8, 2: np.int16, 4: np.int32}[width]
    data = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    data /= float(np.iinfo(dtype).max)
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    if sr != target_sr:
        g = math.gcd(sr, target_sr)
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
    return data


def prepare_audio_feature(wav_path: str, fps: int = 25,
                          sampling_rate: int = 16000) -> dict:
    """audio_util.prepare_audio_feature: normalized samples + frame count."""
    samples = load_wav(wav_path, sampling_rate)
    return {"audio_feature": normalize_audio(samples),
            "seq_len": math.ceil(len(samples) / sampling_rate * fps)}


# ------------------------------------------------------------------ models

class Audio2Mesh(nn.Module):
    w2v_cfg: Wav2Vec2Config = Wav2Vec2Config()
    latent_dim: int = 512
    out_dim: int = 1404

    @nn.compact
    def __call__(self, audio: jnp.ndarray, seq_len: int) -> jnp.ndarray:
        """[B, samples] -> vertex offsets [B, seq_len, out_dim]."""
        h = Wav2Vec2Encoder(self.w2v_cfg, name="audio_encoder")(audio, seq_len)
        h = nn.Dense(self.latent_dim, name="in_fn")(h)
        return nn.Dense(self.out_dim, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="out_fn")(h)


def alibi_biased_mask(n_head: int, max_seq_len: int) -> np.ndarray:
    """init_biased_mask (pose_model.py:11-32) with period=1: causal mask +
    per-head ALiBi-slope distance bias. Returns [H, L, L] additive."""

    def slopes(n):
        def pow2(n):
            start = 2 ** (-2 ** -(math.log2(n) - 3))
            return [start * start ** i for i in range(n)]
        if math.log2(n).is_integer():
            return pow2(n)
        closest = 2 ** math.floor(math.log2(n))
        return pow2(closest) + slopes(2 * closest)[0::2][: n - closest]

    sl = np.asarray(slopes(n_head), np.float32)
    bias = -np.arange(max_seq_len, dtype=np.float32)[::-1]
    alibi = np.zeros((max_seq_len, max_seq_len), np.float32)
    for i in range(max_seq_len):
        alibi[i, : i + 1] = bias[-(i + 1):]
    alibi = sl[:, None, None] * alibi[None]
    causal = np.triu(np.full((max_seq_len, max_seq_len), -np.inf, np.float32), 1)
    return causal[None] + alibi


class DecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer (post-norm, relu FFN)."""

    d_model: int
    n_head: int
    dim_ff: int

    @nn.compact
    def __call__(self, x, memory, tgt_mask, mem_mask):
        d, h = self.d_model, self.n_head
        hd = d // h

        def mha(q_in, kv_in, mask, prefix):
            q = nn.Dense(d, name=f"{prefix}_q")(q_in)
            k = nn.Dense(d, name=f"{prefix}_k")(kv_in)
            v = nn.Dense(d, name=f"{prefix}_v")(kv_in)
            b, tq = q.shape[:2]
            tk = k.shape[1]
            qh = q.reshape(b, tq, h, hd)
            kh = k.reshape(b, tk, h, hd)
            vh = v.reshape(b, tk, h, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * hd ** -0.5
            logits = logits + mask.astype(logits.dtype)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), vh)
            return nn.Dense(d, name=f"{prefix}_out")(out.reshape(b, tq, d))

        x = nn.LayerNorm(name="norm1")(x + mha(x, x, tgt_mask, "self_attn"))
        x = nn.LayerNorm(name="norm2")(
            x + mha(x, memory, mem_mask, "multihead_attn"))
        ff = nn.Dense(self.dim_ff, name="linear1")(x)
        ff = nn.Dense(self.d_model, name="linear2")(nn.relu(ff))
        return nn.LayerNorm(name="norm3")(x + ff)


def sinusoidal_ppe(max_len: int, d_model: int) -> np.ndarray:
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class Audio2Pose(nn.Module):
    w2v_cfg: Wav2Vec2Config = Wav2Vec2Config()
    latent_dim: int = 512
    out_dim: int = 6
    n_head: int = 8
    num_layers: int = 8
    max_seq_len: int = 600

    def setup(self):
        self.audio_encoder = Wav2Vec2Encoder(self.w2v_cfg)
        self.pose_map = nn.Dense(self.latent_dim)
        self.in_fn = nn.Dense(self.latent_dim)
        self.pose_map_r = nn.Dense(self.out_dim)
        self.id_embed = nn.Embed(100, self.latent_dim)
        self.decoder = [DecoderLayer(self.latent_dim, self.n_head,
                                     2 * self.latent_dim,
                                     name=f"decoder_layers_{i}")
                        for i in range(self.num_layers)]

    def _decode(self, tokens, memory, tgt_mask, mem_mask):
        x = tokens
        for layer in self.decoder:
            x = layer(x, memory, tgt_mask, mem_mask)
        return self.pose_map_r(x)

    def __call__(self, audio: jnp.ndarray, seq_len: int,
                 id_seed: int = 42) -> jnp.ndarray:
        """[B, samples] -> pose [B, seq_len, 6]; autoregressive rollout as a
        scan over a fixed-length token buffer."""
        b = audio.shape[0]
        t = seq_len
        hidden = self.audio_encoder(audio, seq_len)
        hidden = self.in_fn(hidden)

        id_vec = self.id_embed(jnp.full((b,), id_seed, jnp.int32))[:, None]
        ppe = jnp.asarray(sinusoidal_ppe(t, self.latent_dim))
        biased = jnp.asarray(alibi_biased_mask(self.n_head, t))
        # diagonal-only cross attention (enc_dec_mask, pose_model.py:35-39)
        mem_mask = jnp.where(jnp.eye(t, dtype=bool), 0.0, -jnp.inf)[None]

        init_tok = self.pose_map(jnp.zeros((b, self.out_dim)))  # token 0

        def step(mdl, buffer, i):
            # positions > i masked out of self-attention via extra bias
            pos_ok = jnp.arange(t) <= i
            step_mask = biased + jnp.where(pos_ok, 0.0, -jnp.inf)[
                None, None, :]
            tokens = (buffer + ppe[None]) + id_vec
            out = mdl._decode(tokens, hidden, step_mask, mem_mask)
            nxt = mdl.pose_map(out[:, i])
            buffer = jnp.where(
                (jnp.arange(t) == i + 1)[None, :, None], nxt[:, None], buffer)
            return buffer, out[:, i]

        buffer0 = jnp.zeros((b, t, self.latent_dim)).at[:, 0].set(init_tok)
        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False})
        _, outs = scan(self, buffer0, jnp.arange(t))
        return outs.transpose(1, 0, 2)                 # [B, T, 6]


# --------------------------------------------------------------- pose utils

def create_perspective_matrix(aspect_ratio: float) -> np.ndarray:
    deg2rad = np.pi / 180.0
    near, far = 1.0, 10000.0
    f = 1.0 / np.tan(deg2rad * 63 / 2.0)
    denom = 1.0 / (near - far)
    p = np.zeros(16, np.float32)
    p[0] = f / aspect_ratio
    p[5] = -f                   # flipped Y (pose_util.py:27)
    p[10] = (near + far) * denom
    p[11] = -1.0
    p[14] = far * near * denom
    return p


def euler_and_translation_to_matrix(euler_deg, translation) -> np.ndarray:
    from scipy.spatial.transform import Rotation as R
    m = np.eye(4)
    m[:3, :3] = R.from_euler("xyz", euler_deg, degrees=True).as_matrix()
    m[:3, 3] = translation
    return m


def matrix_to_euler_and_translation(matrix: np.ndarray):
    from scipy.spatial.transform import Rotation as R
    euler = R.from_matrix(matrix[:3, :3]).as_euler("xyz", degrees=True)
    return euler, matrix[:3, 3]


def project_points(points_3d: np.ndarray, trans_mat: np.ndarray,
                   pose_vectors: np.ndarray, image_shape) -> np.ndarray:
    """[L, N, 3] verts + per-frame 6-dof pose -> [L, N, 2] pixel coords."""
    P = create_perspective_matrix(
        image_shape[1] / image_shape[0]).reshape(4, 4).T
    L, N, _ = points_3d.shape
    out = np.zeros((L, N, 2))
    for i in range(L):
        homog = np.hstack([points_3d[i], np.ones((N, 1))])
        full = trans_mat @ euler_and_translation_to_matrix(
            pose_vectors[i][:3], pose_vectors[i][3:])
        proj = homog @ full.T @ P
        xy = proj[:, :2] / proj[:, 3:4]
        out[i, :, 0] = (xy[:, 0] + 1) * 0.5 * image_shape[1]
        out[i, :, 1] = (xy[:, 1] + 1) * 0.5 * image_shape[0]
    return out


def smooth_pose_seq(pose_seq: np.ndarray, window_size: int = 5) -> np.ndarray:
    out = np.zeros_like(pose_seq)
    for i in range(len(pose_seq)):
        lo = max(0, i - window_size // 2)
        hi = min(len(pose_seq), i + window_size // 2 + 1)
        out[i] = np.mean(pose_seq[lo:hi], axis=0)
    return out


# ------------------------------------------------------------------ driver

def audio_to_landmarks(a2m, a2m_params, a2p, a2p_params, wav_path: str,
                       ref_lmks: np.ndarray, ref_lmks3d: np.ndarray,
                       trans_mat: np.ndarray, image_shape,
                       fps: int = 25, sr: int = 16000,
                       id_seed: int = 42) -> np.ndarray:
    """Full audio2ldmk.py main (:184-294): audio -> 68-pt landmark track.

    ref_lmks [468+, 2] pixel coords of the reference image (from the
    in-framework FaceLandmarkerJax via `audio2ldmk_app --task`, or any
    landmarker with the same contract); ref_lmks3d [468, 3];
    trans_mat [4, 4]."""
    sample = prepare_audio_feature(wav_path, fps=fps, sampling_rate=sr)
    audio = jnp.asarray(sample["audio_feature"])[None]
    seq_len = sample["seq_len"]

    pred = np.asarray(a2m.apply(a2m_params, audio, seq_len))[0]
    pred = pred.reshape(pred.shape[0], -1, 3) + ref_lmks3d

    # 5-second chunking with merged tail (audio2ldmk.py:246-267)
    chunk = sr * 5
    bounds = list(range(0, audio.shape[1], chunk)) + [audio.shape[1]]
    chunks = [audio[:, s:e] for s, e in zip(bounds[:-1], bounds[1:])]
    lens = [5 * fps] * (len(chunks) - 1) + [seq_len % (5 * fps)]
    if len(chunks) > 1:
        chunks[-2] = jnp.concatenate([chunks[-2], chunks[-1]], axis=1)
        lens[-2] += lens[-1]
        chunks, lens = chunks[:-1], lens[:-1]
    poses = []
    for au, ln in zip(chunks, lens):
        p = np.array(a2p.apply(a2p_params, au, int(ln), id_seed))[0]
        p[:, :3] *= 0.5
        poses.append(p)
    pose_seq = smooth_pose_seq(np.concatenate(poses, 0), 7)

    projected = project_points(pred, trans_mat, pose_seq, image_shape)
    projected = np.concatenate([ref_lmks[None, :468, :2], projected], axis=0)
    return convert_ldmk_to_68(projected)
