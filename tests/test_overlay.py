"""pad_divide_by / overlay_davis parity with the reference helpers
(model/EMIP_long/helpers.py:33-77)."""

import numpy as np

from emip_tpu.utils.overlay import overlay_davis, pad_divide_by


def test_pad_divide_by_matches_reference_convention():
    import jax.numpy as jnp

    x = jnp.ones((1, 30, 45, 3))
    (padded,), (lw, uw, lh, uh) = pad_divide_by([x], 16, (30, 45))
    assert padded.shape == (1, 32, 48, 3)
    # centered: torch convention int((n-s)/2) low, remainder high
    assert (lh, uh) == (1, 1)
    assert (lw, uw) == (1, 2)
    # exact multiples -> no padding
    (same,), pads = pad_divide_by([x], 5, (30, 45))
    assert same.shape == x.shape and pads == (0, 0, 0, 0)


def test_overlay_davis_matches_scipy_reference():
    from scipy.ndimage import binary_dilation

    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
    mask = np.zeros((20, 24), np.int32)
    mask[5:12, 6:15] = 1

    got = overlay_davis(image, mask)

    # reference implementation (helpers.py:54-77) inline
    colors = np.atleast_2d(np.reshape([255, 0, 0], (-1, 3))) * 2
    want = image.copy()
    for oid in np.unique(mask)[1:]:
        fg = image * 0.4 + np.ones(image.shape) * 0.6 * colors[oid % len(colors)]
        bm = mask == oid
        want[bm] = fg[bm]
        cont = binary_dilation(bm) ^ bm
        want[cont, :] = 0
    np.testing.assert_array_equal(got, want)
