"""Pixel selector tests: threshold maps and the 3-scale cascade."""

import jax
import jax.numpy as jnp
import numpy as np

from sdv_loam_tpu.config import Settings
from sdv_loam_tpu.data.synthetic import make_sequence
from sdv_loam_tpu.ops.pyramid import make_images
from sdv_loam_tpu.ops.select import (grad_hist_thresholds, make_maps,
                                     select_cascade)


def _pyr(img):
    return make_images(jnp.asarray(img), 3)


def test_thresholds_uniform_image():
    img = np.full((96, 128), 50.0, np.float32)
    dI, ag = _pyr(img)
    ths = np.asarray(grad_hist_thresholds(ag[0]))
    assert ths.shape == (3, 4)
    # zero gradients -> quantile bin 0 -> th = (0+3)^2 = 9 everywhere
    np.testing.assert_allclose(ths, 9.0, atol=1e-5)


def test_cascade_no_selection_on_flat_image():
    img = np.full((96, 128), 50.0, np.float32)
    dI, ag = _pyr(img)
    ths = grad_hist_thresholds(ag[0])
    cand = jnp.ones((96, 128), bool)
    status, counts = select_cascade(dI[0], ag[0], ag[1], ag[2], ths, cand,
                                    jax.random.PRNGKey(0), pot=3)
    assert int(np.asarray(counts).sum()) == 0
    assert (np.asarray(status) == 0).all()


def test_cascade_selects_textured_and_spacing():
    seq = make_sequence(n_frames=1, w=256, h=96)
    img = seq.get_image(0)
    dI, ag = _pyr(img)
    ths = grad_hist_thresholds(ag[0])
    cand = jnp.ones(img.shape, bool)
    pot = 4
    status, counts = select_cascade(dI[0], ag[0], ag[1], ag[2], ths, cand,
                                    jax.random.PRNGKey(1), pot=pot)
    status = np.asarray(status)
    n = np.asarray(counts)
    assert n[0] > 50  # textured scene: many level-1 selections
    # at most one status-1 pixel per pot-cell
    s1 = (status == 1).astype(int)
    hp = s1.shape[0] // pot * pot
    wp = s1.shape[1] // pot * pot
    per_cell = s1[:hp, :wp].reshape(hp // pot, pot, wp // pot, pot).sum(axis=(1, 3))
    assert per_cell.max() <= 1
    # selections respect the interior margin
    ys, xs = np.nonzero(status)
    assert xs.min() >= 4 and ys.min() >= 4
    assert xs.max() < img.shape[1] - 5 and ys.max() <= img.shape[0] - 5


def test_cascade_respects_candidate_mask():
    seq = make_sequence(n_frames=1, w=256, h=96)
    img = seq.get_image(0)
    dI, ag = _pyr(img)
    ths = grad_hist_thresholds(ag[0])
    cand = np.zeros(img.shape, bool)
    cand[20:60, 50:150] = True
    status, counts = select_cascade(dI[0], ag[0], ag[1], ag[2], ths,
                                    jnp.asarray(cand), jax.random.PRNGKey(2),
                                    pot=3)
    status = np.asarray(status)
    assert (status[~cand] == 0).all()
    assert (status != 0).sum() > 10


def test_make_maps_density_feedback():
    seq = make_sequence(n_frames=1, w=320, h=96)
    img = seq.get_image(0)
    dI, ag = _pyr(img)
    cand = jnp.ones(img.shape, bool)
    pot_state = {"pot": 3}
    s = Settings()
    target = 300.0
    status, n = make_maps(dI[0], ag, cand, target, jax.random.PRNGKey(3),
                          pot_state, s)
    assert n > 0
    # after feedback + subsampling we should be in the target's ballpark
    assert n < target * 2.0
