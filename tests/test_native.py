import numpy as np
import pytest
import scipy.ndimage

from tpu_pathopt.runtime import native


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_esdf_matches_scipy():
    rng = np.random.default_rng(0)
    mask = rng.random((120, 90)) < 0.03
    mask[0, 0] = True
    out = native.esdf_pixels(mask)
    ref = scipy.ndimage.distance_transform_edt(~mask)
    np.testing.assert_allclose(out, ref, atol=1e-3)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_build_map_matches_jax():
    import jax.numpy as jnp
    from tpu_pathopt import maps
    rng = np.random.default_rng(1)
    mask = rng.random((64, 64)) < 0.05
    mask[3, 3] = True
    gm_native = native.build_map_native(mask, resolution=0.5)
    gm_jax = maps.build_map(jnp.asarray(mask), resolution=0.5)
    np.testing.assert_allclose(np.asarray(gm_native.esdf),
                               np.asarray(gm_jax.esdf), atol=1e-3)
