"""SadTalker audio->3DMM-coefficient stack in flax + the landmark driver.

Re-derivation of /root/reference/MOFA-Video-Hybrid/sadtalker_audio2pose/:
- wav2lip mel spectrogram + per-frame 16-step mel windows + blink ratios
  (src/utils/audio.py, src/generate_batch.py) in pure numpy (librosa-free);
- Audio2Exp = SimpleWrapperV2 (src/audio2exp_models/networks.py:26-72):
  wav2lip conv encoder over [1, 80, 16] mel windows + Linear(512+64+1 -> 64),
  evaluated in 10-frame chunks (audio2exp.py:14-39);
- Audio2Pose CVAE (src/audio2pose_models/): frozen wav2lip audio encoder,
  ResUnet-over-pose decoder with class-style latent bias, 32-frame windowed
  test-time sampling with first-frame anchoring and left-padded tail
  (audio2pose.py:48-96);
- Audio2Coeff.generate (src/test_audio2coeff.py:74-105): savgol-smoothed
  pose + exp -> [T, 70] coeff track; relative ref-pose retargeting;
- BFM 3DMM landmark projection (src/face3d/models/bfm.py +
  visualize.py:20-133): coeff -> 68-pt landmarks in original image coords
  (the pytorch3d mesh RENDERING is visualization-only and omitted; the
  landmarks never needed it).

The per-image 3DMM fit (CropAndExtract: 68-kpt + ResNet-50 regressor) is
IN-FRAMEWORK since round 3: `apps/face_fit_app.py` (BlazeFace --task box +
AWing FAN alignment + models/audio/face3d_fit.py ReconNet) emits the
`full_3dmm`/`trans_params` npz this module consumes; precomputed npz from
any fit stage remains accepted as the same contract.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mofa_tpu.models.cmp.model import BatchNorm

# ---------------------------------------------------------------- mel (wav2lip)

MEL_PARAMS = dict(num_mels=80, n_fft=800, hop_size=200, win_size=800,
                  sample_rate=16000, preemphasis=0.97, min_level_db=-100,
                  ref_level_db=20, fmin=55, fmax=7600, max_abs_value=4.0)


def _mel_filterbank(sr, n_fft, n_mels, fmin, fmax) -> np.ndarray:
    """librosa.filters.mel (Slaney scale + norm), numpy."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = (f - 0.0) / (200.0 / 3)
        log_t = f >= 1000.0
        mel = np.where(log_t, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                       / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 0.0 + (200.0 / 3) * m
        log_t = m >= 15.0
        f = np.where(log_t, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    fftfreqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def melspectrogram(wav: np.ndarray) -> np.ndarray:
    """wav2lip melspectrogram (audio.py:45-50): preemphasis -> STFT ->
    Slaney mel -> dB -> symmetric normalization. Returns [80, frames]."""
    p = MEL_PARAMS
    from scipy.signal import lfilter
    y = lfilter([1.0, -p["preemphasis"]], [1.0], wav).astype(np.float64)
    # librosa.stft: hann window, centered (reflect padding)
    n_fft, hop, win = p["n_fft"], p["hop_size"], p["win_size"]
    pad = n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    window = np.hanning(win + 1)[:-1]
    frames = 1 + (len(y) - n_fft) // hop
    spec = np.empty((n_fft // 2 + 1, frames), np.complex128)
    for t in range(frames):
        seg = y[t * hop:t * hop + n_fft] * window
        spec[:, t] = np.fft.rfft(seg)
    mag = np.abs(spec)
    mel = _mel_filterbank(p["sample_rate"], n_fft, p["num_mels"],
                          p["fmin"], p["fmax"]) @ mag
    min_level = np.exp(p["min_level_db"] / 20 * np.log(10))
    db = 20 * np.log10(np.maximum(min_level, mel)) - p["ref_level_db"]
    m = p["max_abs_value"]
    norm = np.clip((2 * m) * ((db - p["min_level_db"]) / -p["min_level_db"]) - m,
                   -m, m)
    return norm.astype(np.float32)


def parse_audio_length(audio_length: int, sr: int, fps: int):
    bit_per_frames = sr / fps
    num_frames = int(audio_length / bit_per_frames)
    return int(num_frames * bit_per_frames), num_frames


def indiv_mel_windows(wav: np.ndarray, fps: int = 25,
                      step: int = 16) -> np.ndarray:
    """Per-frame [80, 16] mel windows (generate_batch.py:53-80)."""
    length, num_frames = parse_audio_length(len(wav), 16000, fps)
    wav = np.pad(wav[:length], (0, max(0, length - len(wav))))
    orig_mel = melspectrogram(wav).T           # [frames, 80]
    out = []
    for i in range(num_frames):
        start = int(80.0 * ((i - 2) / float(fps)))
        idx = np.clip(np.arange(start, start + step), 0, orig_mel.shape[0] - 1)
        out.append(orig_mel[idx].T)
    return np.asarray(out)                      # [T, 80, 16]


def blink_ratio(num_frames: int, rng=None) -> np.ndarray:
    """generate_blink_seq_randomly (generate_batch.py:37-49)."""
    rng = rng or np.random
    ratio = np.zeros((num_frames, 1), np.float32)
    if num_frames <= 20:
        return ratio
    frame_id = 0
    while frame_id < num_frames:
        start = rng.choice(range(min(10, num_frames),
                                 min(int(num_frames / 2), 70)))
        if frame_id + start + 5 <= num_frames - 1:
            ratio[frame_id + start:frame_id + start + 5, 0] = \
                [0.5, 0.9, 1.0, 0.9, 0.5]
            frame_id = frame_id + start + 5
        else:
            break
    return ratio


# ---------------------------------------------------------------- modules

class _W2LConv(nn.Module):
    """wav2lip Conv2d + BN (+residual) (audio2exp_models/networks.py:5-24)."""

    cout: int
    kernel: tuple = (3, 3)
    stride: tuple = (1, 1)
    padding: tuple = (1, 1)
    residual: bool = False
    use_act: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.cout, self.kernel, strides=self.stride,
                    padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
                    dtype=x.dtype, name="conv")(x)
        y = BatchNorm(name="bn")(y)
        if self.residual:
            y = y + x
        return nn.relu(y) if self.use_act else y


class Wav2LipAudioEncoder(nn.Module):
    """[N, 80, 16, 1] mel window -> [N, 512] (the shared wav2lip stack)."""

    @nn.compact
    def __call__(self, x):
        spec = [
            (32, (1, 1), (1, 1), False), (32, (1, 1), (1, 1), True),
            (32, (1, 1), (1, 1), True),
            (64, (3, 1), (1, 1), False), (64, (1, 1), (1, 1), True),
            (64, (1, 1), (1, 1), True),
            (128, (3, 3), (1, 1), False), (128, (1, 1), (1, 1), True),
            (128, (1, 1), (1, 1), True),
            (256, (3, 2), (1, 1), False), (256, (1, 1), (1, 1), True),
            (512, (1, 1), (0, 0), False), (512, (1, 1), (0, 0), False),
        ]
        kernels = [(3, 3)] * 11 + [(3, 3), (1, 1)]
        for i, ((cout, stride, pad, res), k) in enumerate(zip(spec, kernels)):
            x = _W2LConv(cout, k, stride, pad, residual=res,
                         name=f"enc_{i}")(x)
        return x.reshape(x.shape[0], -1)


class Audio2ExpNet(nn.Module):
    """SimpleWrapperV2: encoder + Linear(512+64+1 -> 64)."""

    @nn.compact
    def __call__(self, mel, ref, ratio):
        """mel [N, 80, 16, 1]; ref [N, 64]; ratio [N, 1] -> exp [N, 64]."""
        x = Wav2LipAudioEncoder(name="audio_encoder")(mel)
        y = jnp.concatenate([x, ref, ratio], axis=-1)
        return nn.Dense(64, name="mapping1")(y)


class _PoseResConv(nn.Module):
    """ResidualConv (audio2pose_models/networks.py:5-26): pre-BN block."""

    cout: int
    stride: tuple = (1, 1)

    @nn.compact
    def __call__(self, x):
        y = BatchNorm(name="bn1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.cout, (3, 3), strides=self.stride,
                    padding=[(1, 1), (1, 1)], name="conv1")(y)
        y = BatchNorm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.cout, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv2")(y)
        skip = nn.Conv(self.cout, (3, 3), strides=self.stride,
                       padding=[(1, 1), (1, 1)], name="skip_conv")(x)
        skip = BatchNorm(name="skip_bn")(skip)
        return y + skip


class PoseResUnet(nn.Module):
    """ResUnet over [N, seq_len, 6, 1] pose maps (res_unet.py:6-66)."""

    @nn.compact
    def __call__(self, x):
        f = (32, 64, 128, 256)
        inp = nn.Conv(f[0], (3, 3), padding=[(1, 1), (1, 1)], name="in_conv1")(x)
        inp = BatchNorm(name="in_bn")(inp)
        inp = nn.relu(inp)
        inp = nn.Conv(f[0], (3, 3), padding=[(1, 1), (1, 1)], name="in_conv2")(inp)
        x1 = inp + nn.Conv(f[0], (3, 3), padding=[(1, 1), (1, 1)],
                           name="in_skip")(x)
        x2 = _PoseResConv(f[1], (2, 1), name="res1")(x1)
        x3 = _PoseResConv(f[2], (2, 1), name="res2")(x2)
        x4 = _PoseResConv(f[3], (2, 1), name="bridge")(x3)

        def up(h, cout, name):
            return nn.ConvTranspose(cout, (2, 1), strides=(2, 1),
                                    name=name)(h)

        x5 = jnp.concatenate([up(x4, f[3], "up1"), x3], axis=-1)
        x6 = _PoseResConv(f[2], (1, 1), name="upres1")(x5)
        x7 = jnp.concatenate([up(x6, f[2], "up2"), x2], axis=-1)
        x8 = _PoseResConv(f[1], (1, 1), name="upres2")(x7)
        x9 = jnp.concatenate([up(x8, f[1], "up3"), x1], axis=-1)
        x10 = _PoseResConv(f[0], (1, 1), name="upres3")(x9)
        out = nn.Conv(1, (1, 1), name="out_conv")(x10)
        return nn.sigmoid(out)


class CVAEDecoder(nn.Module):
    """DECODER (cvae.py:99-150): class-biased latent + audio -> pose motion."""

    latent_size: int = 64
    num_classes: int = 46
    audio_emb_in: int = 512
    audio_emb_out: int = 6
    seq_len: int = 32
    layer_sizes: tuple = (128, 192)

    @nn.compact
    def __call__(self, z, class_id, ref, audio_emb):
        """z [B, latent]; class_id [B] int; ref [B, 6];
        audio_emb [B, seq_len, 512] -> pose motion [B, seq_len, 6]."""
        bs = z.shape[0]
        audio_out = nn.Dense(self.audio_emb_out, name="linear_audio")(audio_emb)
        audio_out = audio_out.reshape(bs, -1)
        classbias = self.param("classbias", nn.initializers.normal(1.0),
                               (self.num_classes, self.latent_size))
        z = z + classbias[class_id]
        x = jnp.concatenate([ref, z, audio_out], axis=-1)
        for i, size in enumerate(self.layer_sizes):
            x = nn.Dense(size, name=f"mlp_{i}")(x)
            x = nn.relu(x) if i + 1 < len(self.layer_sizes) else nn.sigmoid(x)
        x = x.reshape(bs, self.seq_len, -1)[..., None]       # [B, 32, 6, 1]
        pose_emb = PoseResUnet(name="resunet")(x)[..., 0]
        return nn.Dense(6, name="pose_linear")(pose_emb)


class Audio2PoseCVAE(nn.Module):
    """Test-time Audio2Pose (audio2pose.py:48-96): windowed CVAE sampling."""

    latent_size: int = 64
    seq_len: int = 32

    def setup(self):
        self.audio_encoder = Wav2LipAudioEncoder()
        self.decoder = CVAEDecoder(latent_size=self.latent_size,
                                   seq_len=self.seq_len)

    def encode_audio(self, mels):
        """[B, T, 80, 16] -> [B, T, 512]."""
        b, t = mels.shape[:2]
        flat = mels.reshape(b * t, 80, 16, 1)
        emb = self.audio_encoder(flat)
        return emb.reshape(b, t, -1)

    def __call__(self, indiv_mels, ref_pose, class_id, key):
        """indiv_mels [B, T, 80, 16] (window 0 = reference frame);
        ref_pose [B, 6]; -> pose [B, T-1(+1 zero lead), 6] predictions
        following the reference chunking."""
        b, t_all = indiv_mels.shape[:2]
        mels = indiv_mels[:, 1:]
        num_frames = t_all - 1
        div, re = divmod(num_frames, self.seq_len)
        preds = [jnp.zeros((b, 1, 6))]
        for i in range(div):
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, (b, self.latent_size))
            emb = self.encode_audio(
                mels[:, i * self.seq_len:(i + 1) * self.seq_len])
            preds.append(self.decoder(z, class_id, ref_pose, emb))
        if re != 0:
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, (b, self.latent_size))
            emb = self.encode_audio(mels[:, -self.seq_len:])
            if emb.shape[1] != self.seq_len:        # short audio: pad left
                pad = jnp.repeat(emb[:, :1], self.seq_len - emb.shape[1], 1)
                emb = jnp.concatenate([pad, emb], axis=1)
            preds.append(self.decoder(z, class_id, ref_pose, emb)[:, -re:])
        motion = jnp.concatenate(preds, axis=1)
        return ref_pose[:, None] + motion            # [B, T, 6]


# ---------------------------------------------------------------- drivers

def generate_coeffs(exp_net, exp_params, pose_net, pose_params,
                    wav: np.ndarray, ref_coeff70: np.ndarray,
                    pose_style: int = 0, fps: int = 25,
                    key=None, still: bool = False,
                    ref_pose_coeff: Optional[np.ndarray] = None) -> np.ndarray:
    """Audio2Coeff.generate (test_audio2coeff.py:74-105): wav + reference
    70-d coeff -> [T, 70] coefficient track (exp 64 + pose 6)."""
    from scipy.signal import savgol_filter
    key = key if key is not None else jax.random.PRNGKey(42)
    mels = indiv_mel_windows(wav, fps=fps)       # [T, 80, 16]
    t = mels.shape[0]
    ratio = blink_ratio(t, np.random.RandomState(42)) if not still else \
        np.zeros((t, 1), np.float32)

    # exp: 10-frame chunks (audio2exp.py:21-33)
    ref_exp = np.repeat(ref_coeff70[None, :64], t, axis=0)  # [T, 64]
    exps = []
    for i in range(0, t, 10):
        mel_c = jnp.asarray(mels[i:i + 10])[..., None]
        out = exp_net.apply(exp_params, mel_c, jnp.asarray(ref_exp[i:i + 10]),
                            jnp.asarray(ratio[i:i + 10]))
        exps.append(np.asarray(out))
    exp_pred = np.concatenate(exps, axis=0)                 # [T, 64]

    # pose: windowed CVAE over T+1 windows (window 0 = ref frame)
    mels_pose = jnp.asarray(np.concatenate([mels[:1], mels], 0))[None]
    pose_pred = np.asarray(pose_net.apply(
        pose_params, mels_pose, jnp.asarray(ref_coeff70[None, 64:70]),
        jnp.asarray([pose_style]), key))[0][:t]             # [T, 6]

    win = 13 if t >= 13 else (max(3, (t - 1) // 2 * 2 + 1))
    pose_pred = savgol_filter(pose_pred, win, 2, axis=0)

    coeffs = np.concatenate([exp_pred, pose_pred], axis=-1).astype(np.float32)
    if ref_pose_coeff is not None:
        rp = ref_pose_coeff[:, 64:70]
        reps = -(-t // rp.shape[0])
        rp = np.tile(rp, (reps, 1))[:t]
        coeffs[:, 64:70] += rp - rp[0:1]
    if still:
        coeffs[1:, 64:] = coeffs[0:1, 64:]
    return coeffs


@dataclasses.dataclass
class BFMModel:
    """Basel Face Model landmark math (face3d/models/bfm.py; data external)."""

    mean_shape: np.ndarray       # [N*3]
    id_base: np.ndarray          # [N*3, 80]
    exp_base: np.ndarray         # [N*3, 64]
    keypoints: np.ndarray        # [68] vertex ids
    focal: float = 1015.0
    center: float = 112.0
    camera_distance: float = 10.0
    # render-path data (bfm.py:50-58), present when loaded with
    # with_render_data=True; consumed by audio/face3d_render.py
    tex_base: Optional[np.ndarray] = None    # [N*3, 80]
    mean_tex: Optional[np.ndarray] = None    # [N*3]
    face_buf: Optional[np.ndarray] = None    # [F, 3] vertex ids
    point_buf: Optional[np.ndarray] = None   # [N, 8] face ids

    @classmethod
    def load(cls, mat_path: str, with_render_data: bool = False) -> "BFMModel":
        from scipy.io import loadmat
        m = loadmat(mat_path)
        mean_shape = m["meanshape"].astype(np.float32).reshape(-1)
        # recenter (bfm.py:68-72)
        ms = mean_shape.reshape(-1, 3)
        ms = ms - ms.mean(axis=0, keepdims=True)
        extra = {}
        if with_render_data:
            extra = dict(
                tex_base=m["texBase"].astype(np.float32),
                mean_tex=m["meantex"].astype(np.float32).reshape(-1),
                face_buf=m["tri"].astype(np.int64) - 1,
                point_buf=m["point_buf"].astype(np.int64) - 1,
            )
        return cls(mean_shape=ms.reshape(-1),
                   id_base=m["idBase"].astype(np.float32),
                   exp_base=m["exBase"].astype(np.float32),
                   keypoints=np.squeeze(m["keypoints"]).astype(np.int64) - 1,
                   **extra)

    def landmarks(self, coeffs: np.ndarray) -> np.ndarray:
        """[B, 257] full coeffs -> [B, 68, 2] landmarks in 224-crop coords
        (y-up, as facemodel.pred_lm before the flip in visualize.py:86)."""
        idc, expc = coeffs[:, :80], coeffs[:, 80:144]
        angles, trans = coeffs[:, 224:227], coeffs[:, 254:257]
        shape = (idc @ self.id_base.T + expc @ self.exp_base.T
                 + self.mean_shape[None]).reshape(len(coeffs), -1, 3)
        rot = _rotation(angles)                          # [B, 3, 3]
        shape = shape @ rot + trans[:, None]
        shape[..., -1] = self.camera_distance - shape[..., -1]
        proj = np.array([[self.focal, 0, self.center],
                         [0, self.focal, self.center],
                         [0, 0, 1.0]], np.float32).T
        p = shape @ proj
        xy = p[..., :2] / p[..., 2:]
        return xy[:, self.keypoints]


def _rotation(angles: np.ndarray) -> np.ndarray:
    """compute_rotation (bfm.py:175-209): (Rz @ Ry @ Rx).T per sample."""
    out = np.zeros((len(angles), 3, 3), np.float32)
    for i, (x, y, z) in enumerate(angles):
        rx = np.array([[1, 0, 0], [0, np.cos(x), -np.sin(x)],
                       [0, np.sin(x), np.cos(x)]])
        ry = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0],
                       [-np.sin(y), 0, np.cos(y)]])
        rz = np.array([[np.cos(z), -np.sin(z), 0],
                       [np.sin(z), np.cos(z), 0], [0, 0, 1]])
        out[i] = (rz @ ry @ rx).T
    return out


def compose_full_coeffs(first_frame_coeff257: np.ndarray,
                        coeff_track70: np.ndarray) -> np.ndarray:
    """visualize.py:36-40: splice predicted exp/pose into the first frame's
    full 257-d coefficients."""
    full = np.repeat(first_frame_coeff257, len(coeff_track70), axis=0).copy()
    full[:, 80:144] = coeff_track70[:, :64]
    full[:, 224:227] = coeff_track70[:, 64:67]
    full[:, 254:] = coeff_track70[:, 67:]
    return full


def uncrop_landmarks(landmarks224: np.ndarray, trans_params: np.ndarray,
                     crop_info) -> np.ndarray:
    """visualize.py:64-91: 224-crop coords -> original image coords."""
    s = trans_params[2]
    orig_left, orig_up = int(trans_params[5]), int(trans_params[6])
    (_, _), (clx, cly, crx, cry), (lx, ly, rx, ry) = crop_info
    ox1, oy1 = int(clx) + int(lx), int(cly) + int(ly)
    ox2, oy2 = int(clx) + int(rx), int(cly) + int(ry)
    lm = landmarks224.copy()
    lm[..., 1] = 224 - lm[..., 1]
    scale = np.array([[(ox2 - ox1) / 256.0, (oy2 - oy1) / 256.0]])
    shift = np.array([[orig_left, orig_up]])
    shift2 = np.array([[ox1, oy1]])
    return (lm + shift) / s * scale + shift2


def sadtalker_audio_to_landmarks(exp_net, exp_params, pose_net, pose_params,
                                 bfm: BFMModel, wav: np.ndarray,
                                 first_frame_coeff257: np.ndarray,
                                 trans_params: np.ndarray, crop_info,
                                 pose_style: int = 0, fps: int = 25,
                                 key=None, still: bool = False,
                                 return_coeffs: bool = False):
    """Full SadTalker --face3dvis landmark path (inference.py:31-134 +
    visualize.py:20-133): wav + first-frame 3DMM fit -> [T+1, 68, 2]
    landmarks in original image coords (frame 0 = reference pose).
    With return_coeffs, also returns the composed [T+1, 257] coefficient
    track (consumed by face3d_render.render_face_video)."""
    ref70 = np.concatenate([first_frame_coeff257[0, 80:144],
                            first_frame_coeff257[0, 224:227],
                            first_frame_coeff257[0, 254:257]])
    coeffs = generate_coeffs(exp_net, exp_params, pose_net, pose_params,
                             wav, ref70, pose_style=pose_style, fps=fps,
                             key=key, still=still)
    full = compose_full_coeffs(first_frame_coeff257, coeffs)
    all_coeffs = np.concatenate([first_frame_coeff257, full], axis=0)
    lm224 = bfm.landmarks(all_coeffs)
    lm = uncrop_landmarks(lm224, trans_params, crop_info)
    return (lm, all_coeffs) if return_coeffs else lm


def sadtalker_video_to_landmarks(bfm: BFMModel,
                                 first_frame_coeff257: np.ndarray,
                                 driving_coeffs70: np.ndarray,
                                 trans_params: np.ndarray, crop_info,
                                 relative_pose: bool = True,
                                 return_coeffs: bool = False):
    """Video-driven retargeting (sadtalker_video2pose path): the driving
    video's per-frame exp+pose track (the --ref_pose flow of
    run_gradio_video_driven.py) steers the reference identity. Per-frame
    3DMM fits of the driving video come from the in-framework raw-mp4 fit
    (preprocess/video_fit.py: BlazeFace box + batched AWing FAN + batched
    ReconNet), or any precomputed track with the same coeff contract."""
    coeffs = driving_coeffs70.astype(np.float32).copy()
    if relative_pose:
        ref_pose = np.concatenate([first_frame_coeff257[0, 224:227],
                                   first_frame_coeff257[0, 254:257]])
        coeffs[:, 64:70] = ref_pose[None] + (coeffs[:, 64:70]
                                             - coeffs[0:1, 64:70])
    full = compose_full_coeffs(first_frame_coeff257, coeffs)
    all_coeffs = np.concatenate([first_frame_coeff257, full], axis=0)
    lm = uncrop_landmarks(bfm.landmarks(all_coeffs), trans_params, crop_info)
    return (lm, all_coeffs) if return_coeffs else lm
