"""Output-stage NLM denoise (film/denoise.py — reference v3 imageHandler
denoise/denoiseHLum/denoiseHCol/denoiseMix knobs, SURVEY §2.12 [L])."""
import numpy as np

from libyafaray_tpu.film.denoise import denoise_image


def _noisy_scene(seed=7, h=48, w=48, sigma=0.06):
    """Piecewise-constant image (sharp edge) + iid Gaussian noise."""
    rng = np.random.default_rng(seed)
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, : w // 2] = (0.25, 0.5, 0.2)
    clean[:, w // 2:] = (0.7, 0.3, 0.6)
    noisy = clean + rng.normal(0.0, sigma, clean.shape).astype(np.float32)
    return clean, noisy


def test_nlm_reduces_noise():
    clean, noisy = _noisy_scene()
    out = denoise_image(noisy, h_lum=8.0, h_col=8.0, mix=1.0)
    mse_in = float(np.mean((noisy - clean) ** 2))
    mse_out = float(np.mean((out - clean) ** 2))
    assert mse_out < 0.5 * mse_in, (mse_in, mse_out)


def test_nlm_preserves_edges():
    clean, noisy = _noisy_scene()
    out = denoise_image(noisy, h_lum=8.0, h_col=8.0, mix=1.0)
    # the two halves must stay distinct: means on either side of the
    # edge keep their separation (no global blur across the boundary)
    left = out[:, : 48 // 2 - 4].mean(axis=(0, 1))
    right = out[:, 48 // 2 + 4:].mean(axis=(0, 1))
    assert np.abs(left - right).max() > 0.25


def test_nlm_mix_zero_is_identity():
    _, noisy = _noisy_scene()
    out = denoise_image(noisy, h_lum=8.0, h_col=8.0, mix=0.0)
    assert np.allclose(out, noisy, atol=1e-6)


def test_nlm_h_zero_disables_band():
    _, noisy = _noisy_scene()
    # chroma-only filtering: luminance band disabled -> luma unchanged
    out = denoise_image(noisy, h_lum=0.0, h_col=8.0, mix=1.0)

    def luma(x):
        return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]

    assert np.allclose(luma(out), luma(noisy), atol=1e-5)


def test_config_parses_denoise_params():
    from libyafaray_tpu.integrators.config import config_from_params
    from libyafaray_tpu.scene.params import ParamMap

    render = ParamMap(denoiseEnabled=True, denoiseHLum=9.0,
                      denoiseHCol=4.0, denoiseMix=0.5)
    cfg = config_from_params(render, ParamMap())
    assert cfg.denoise and cfg.denoise_h_lum == 9.0
    assert cfg.denoise_h_col == 4.0 and cfg.denoise_mix == 0.5
