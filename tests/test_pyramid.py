"""Pyramid forward/inverse round-trip property tests.

Mirrors the reference's key numerical-fidelity pattern
(reference tests/bfcnn/test_pyramid.py — reconstruction error ~1e-7 over
sizes/levels/channels for NONE/GAUSSIAN/LAPLACIAN).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blind_image_denoising_tpu.ops import (
    PyramidType,
    build_pyramid_fn,
    build_inverse_pyramid_fn,
    gaussian_pyramid,
    laplacian_pyramid,
    inverse_gaussian_pyramid,
    inverse_laplacian_pyramid,
)

SIZES = [64, 128, 256]
CHANNELS = [1, 3]
LEVELS = [1, 2, 3, 4]
TYPES = ["none", "gaussian", "laplacian"]


def _rand_image(size, channels, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.uniform(0.0, 255.0, size=(2, size, size, channels)).astype(np.float32))


@pytest.mark.parametrize("ptype", TYPES)
@pytest.mark.parametrize("levels", LEVELS)
@pytest.mark.parametrize("channels", CHANNELS)
@pytest.mark.parametrize("size", [64, 256])
def test_round_trip(ptype, levels, channels, size):
    config = {"type": ptype, "levels": levels, "kernel_size": [5, 5]}
    fwd = build_pyramid_fn(config)
    inv = build_inverse_pyramid_fn(config)
    x = _rand_image(size, channels)
    scales = fwd(x)
    assert len(scales) == levels
    recon = inv(scales)
    # [0, 255]-range inputs: float32 ulp at 255 is ~1.5e-5 and the
    # telescoping reconstruction is exact up to a handful of rounding
    # steps — see test_round_trip_reference_protocol for the reference's
    # own normalized-range 1e-7 bar
    err = float(jnp.max(jnp.abs(recon - x)))
    assert err < 1e-4, f"{ptype} L{levels} c{channels} s{size}: err={err}"


@pytest.mark.parametrize("ptype", TYPES)
@pytest.mark.parametrize("levels", [1, 3])
@pytest.mark.parametrize("channels", CHANNELS)
@pytest.mark.parametrize("size", [64, 128, 256, 512, 1024])
def test_round_trip_reference_protocol(ptype, levels, channels, size):
    """The reference's own fidelity bar (reference test_pyramid.py:
    sizes 64..1024², gray+color, inputs normalized to [-0.5, 0.5],
    ``mean |recon - x| < 1e-7``), plus a max-error bound at float32
    resolution. The forward/inverse pairs telescope exactly; the only
    error is float rounding."""
    config = {"type": ptype, "levels": levels, "kernel_size": [3, 3]}
    fwd = build_pyramid_fn(config)
    inv = build_inverse_pyramid_fn(config)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, size, size, channels))
                    .astype(np.float32))
    scales = fwd(x)
    assert len(scales) == levels
    recon = inv(scales)
    err = jnp.abs(recon - x)
    mean_err = float(jnp.mean(err))
    max_err = float(jnp.max(err))
    assert mean_err < 1e-7, \
        f"{ptype} L{levels} c{channels} s{size}: mean={mean_err}"
    assert max_err < 1e-6, \
        f"{ptype} L{levels} c{channels} s{size}: max={max_err}"


@pytest.mark.parametrize("size", SIZES)
def test_scale_shapes(size):
    x = _rand_image(size, 3)
    scales = gaussian_pyramid(x, levels=3)
    assert scales[0].shape == x.shape
    assert scales[1].shape == (2, size // 2, size // 2, 3)
    assert scales[2].shape == (2, size // 4, size // 4, 3)

    bands = laplacian_pyramid(x, levels=3)
    assert bands[0].shape == x.shape
    assert bands[1].shape == (2, size // 2, size // 2, 3)
    assert bands[2].shape == (2, size // 4, size // 4, 3)


def test_laplacian_bands_are_highpass():
    x = _rand_image(128, 3)
    bands = laplacian_pyramid(x, levels=3)
    # band levels should have much smaller mean magnitude than the base
    assert float(jnp.mean(jnp.abs(bands[0]))) < float(jnp.mean(jnp.abs(bands[-1])))


def test_jit_matches_eager():
    x = _rand_image(64, 3)
    eager = laplacian_pyramid(x, 3)
    jitted = jax.jit(lambda y: laplacian_pyramid(y, 3))(x)
    for a, b in zip(eager, jitted):
        # jit fuses/reassociates float32 math; bitwise equality isn't
        # guaranteed, only close agreement
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def test_pyramid_type_from_string():
    assert PyramidType.from_string(" gaussian ") == PyramidType.GAUSSIAN
    assert PyramidType.from_string("LAPLACIAN") == PyramidType.LAPLACIAN
    with pytest.raises(Exception):
        PyramidType.from_string("")
